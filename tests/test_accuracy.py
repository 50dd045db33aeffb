"""Dataflow accuracy micro-suite (Securibench-Micro analog).

The reference's only published quantitative baselines are TP/FP tables over
seeded taint benchmarks (``benchmarks/README.md:11-27``: Securibench Micro
78.72% total accuracy for javasrc2cpg — the engine is intentionally
path-insensitive and semantics-default, so sanitizers and dead branches are
known FPs). This suite seeds the same categories at micro scale:

- ``TRUTH``  — ground-truth labels (does tainted data actually reach the sink);
- ``PREDICTED`` — the locked expected engine verdicts (regression gate: any
  drift in the dataflow engine flips a row and fails the suite);
- aggregate accuracy vs TRUTH is asserted ≥ the reference's published bar.

Flows are judged with the realizable-paths flows API (reachable_by_flows),
the same surface the reference's benchmark harness drives.
"""

import pyspark.sql.functions as F
import pytest

from joern_spark.dataflow import reachable_by_flows

# case name -> (category, code, source literal, truth, predicted)
# categories mirror the reference's Securibench Micro table
# (benchmarks/README.md:11-27); all 12 are seeded.
CASES = {
    "basic_direct": ("Basic",
        "void c1() { int a = 1001; sink1(a); }", "1001", True, True),
    "basic_unrelated": ("Basic",
        "void c3() { int a = 1003; int b = 7; sink3(b); }", "1003", False, False),
    "binop_propagation": ("Basic",
        "void c4() { int a = 1004; int b = a + 1; sink4(b); }", "1004", True, True),
    "loop_carry": ("Basic",
        "void c10() { int a10 = 1010; int s10 = 0;"
        " while (a10 > 0) { s10 = s10 + a10; a10--; } sink10(s10); }",
        "1010", True, True),
    "interproc_param": ("Inter-procedural",
        "void h5(int x5) { sink5(x5); }\nvoid c5() { h5(1005); }",
        "1005", True, True),
    "interproc_return": ("Inter-procedural",
        "int h6() { return 1006; }\nvoid c6() { int a6 = h6(); sink6(a6); }",
        "1006", True, True),
    # argument-index precision: literal flows into x12 only, sink reads y12
    "wrong_arg_index": ("Inter-procedural",
        "void h12(int x12, int y12) { sink12(y12); }\n"
        "void c12() { h12(1012, 2); }",
        "1012", False, False),
    # realizable paths: caller_a's literal must not exit id13 into caller_b
    "two_caller_realizable": ("Inter-procedural",
        "int id13(int x13) { return x13; }\n"
        "void ca13() { int a13 = id13(1013); other13(a13); }\n"
        "void cb13() { int b13 = id13(2); sink13(b13); }",
        "1013", False, False),
    # sanitizer: default semantics taint through unknown calls — known FP,
    # mirroring the reference's Securibench 'Sanitizers' FP rows
    "sanitizer_call": ("Sanitizers",
        "void c8() { int a8 = 1008; a8 = sanitize8(a8); sink8(a8); }",
        "1008", False, True),
    # interprocedural sanitizer: internal callee returns a constant; engine
    # taints arg→return through it (semantics-default) — known FP
    "interproc_sanitizer": ("Sanitizers",
        "int clean12(int x12b) { return 0; }\n"
        "void a12() { int a12v = 1112; a12v = clean12(a12v); sink112(a12v); }",
        "1112", False, True),
    # reassignment from an untainted call kills the taint — TN
    "sanitizer_constant": ("Sanitizers",
        "void a14() { int a14v = 1114; a14v = safe_const(); sink114(a14v); }",
        "1114", False, False),
    "branch_join": ("Predicates",
        "void c9() { int a9 = 1009; int b9 = 0;"
        " if (a9 > 0) { b9 = a9; } else { b9 = 0; } sink9(b9); }",
        "1009", True, True),
    # dead branch: path-insensitive engine taints through `if (0)` — known FP
    "dead_branch": ("Predicates",
        "void c11() { int a11 = 1011; int b11 = 0;"
        " if (0) { b11 = a11; } sink11(b11); }",
        "1011", False, True),
    "alias_copy": ("Aliasing",
        "void a1() { int p1 = 1101; int q1 = p1; sink101(q1); }",
        "1101", True, True),
    "alias_pointer": ("Aliasing",
        "void a2() { int p2 = 1102; int *q2 = &p2; sink102(*q2); }",
        "1102", True, True),
    "array_same_index": ("Arrays",
        "void a3() { int r3[4]; r3[0] = 1103; sink103(r3[0]); }",
        "1103", True, True),
    # base-smashed array defs: the overwrite of r4 kills the taint — TN
    "array_other_index": ("Arrays",
        "void a4() { int r4[4]; r4[0] = 1104; r4[1] = 0; sink104(r4[1]); }",
        "1104", False, False),
    # container carry through unknown put/get (semantics-default arg taint)
    "collection_carry": ("Collections",
        "void a5(int *c5) { put105(c5, 1105); int v5 = get105(c5);"
        " sink105(v5); }",
        "1105", True, True),
    "collection_unrelated": ("Collections",
        "void a6(int *c6a, int *c6b) { put106(c6a, 1106);"
        " int v6 = get106(c6b); sink106(v6); }",
        "1106", False, False),
    "struct_field_carry": ("Data Structures",
        "void a7(struct S7 *s7) { s7->f = 1107; sink107(s7->f); }",
        "1107", True, True),
    # field-sensitive: taint in ->f never reaches the ->g read — TN
    "struct_other_field": ("Data Structures",
        "void a8(struct S8 *s8) { s8->f = 1108; sink108(s8->g); }",
        "1108", False, False),
    "factory_fresh": ("Factories",
        "int make9() { return 1109; }\n"
        "void a9() { int o9 = make9(); sink109(o9); }",
        "1109", True, True),
    # call through a function pointer: the method-ref hint rule
    # (fp = someFunc; fp(...) → CALL edge to someFunc, XTypeRecovery's
    # identifier-assigned-METHOD_REF feeding XTypeHintCallLinker) resolves
    # the indirect call — TP here where the reference's Reflection row
    # posts an FN (its c2cpg leaves fn-ptr calls unlinked)
    "fnptr_call": ("Reflection",
        "void s10fn(int v10) { sink110(v10); }\n"
        "void a10() { void (*fp10)(int) = s10fn; fp10(1110); }",
        "1110", True, True),
    # cross-function flow through a global: per-method reaching defs never
    # connect set13's write to a13's read — known FN (Session analog)
    "session_global": ("Session",
        "int g13;\nvoid set13() { g13 = 1113; }\nvoid a13() { sink113(g13); }",
        "1113", True, False),
    "basic_overwrite": ("Strong Updates",
        "void c2() { int a = 1002; a = 0; sink2(a); }", "1002", False, False),
    "strong_update_field": ("Strong Updates",
        "void a11(struct S11 *s11) { s11->f = 1111; s11->f = 0;"
        " sink111(s11->f); }",
        "1111", False, False),
    # ---- bytecode twins (jimple-mini) -------------------------------------
    # The reference's benchmark tables run every suite twice — source AND
    # bytecode (benchmarks/README.md:28-45, jimple2cpg rows). These re-seed
    # the load-bearing categories through the 3-address frontend: identity-
    # statement parameters, exact staticinvoke linking, if-goto joins.
    "jbc_basic_direct": ("Basic",
        "public class JA1 extends java.lang.Object {\n"
        "  public static void jc1() {\n"
        "    int a0;\n    a0 = 2001;\n"
        "    staticinvoke <JSink: void sink201(int)>(a0);\n    return;\n"
        "  }\n}", "2001", True, True),
    "jbc_basic_unrelated": ("Basic",
        "public class JA2 extends java.lang.Object {\n"
        "  public static void jc2() {\n"
        "    int a0, b0;\n    a0 = 2002;\n    b0 = 7;\n"
        "    staticinvoke <JSink: void sink202(int)>(b0);\n    return;\n"
        "  }\n}", "2002", False, False),
    "jbc_binop": ("Basic",
        "public class JA3 extends java.lang.Object {\n"
        "  public static void jc3() {\n"
        "    int a0, b0;\n    a0 = 2003;\n    b0 = a0 + 1;\n"
        "    staticinvoke <JSink: void sink203(int)>(b0);\n    return;\n"
        "  }\n}", "2003", True, True),
    "jbc_overwrite": ("Strong Updates",
        "public class JA4 extends java.lang.Object {\n"
        "  public static void jc4() {\n"
        "    int a0;\n    a0 = 2004;\n    a0 = 0;\n"
        "    staticinvoke <JSink: void sink204(int)>(a0);\n    return;\n"
        "  }\n}", "2004", False, False),
    "jbc_interproc_param": ("Inter-procedural",
        "public class JA5 extends java.lang.Object {\n"
        "  public static void jh5(int) {\n"
        "    int x5;\n    x5 := @parameter0: int;\n"
        "    staticinvoke <JSink: void sink205(int)>(x5);\n    return;\n"
        "  }\n"
        "  public static void jc5() {\n"
        "    staticinvoke <JA5: void jh5(int)>(2005);\n    return;\n"
        "  }\n}", "2005", True, True),
    "jbc_interproc_return": ("Inter-procedural",
        "public class JA6 extends java.lang.Object {\n"
        "  public static int jh6() {\n    return 2006;\n  }\n"
        "  public static void jc6() {\n"
        "    int a6;\n"
        "    a6 = staticinvoke <JA6: int jh6()>();\n"
        "    staticinvoke <JSink: void sink206(int)>(a6);\n    return;\n"
        "  }\n}", "2006", True, True),
    "jbc_wrong_arg_index": ("Inter-procedural",
        "public class JA7 extends java.lang.Object {\n"
        "  public static void jh7(int, int) {\n"
        "    int x7, y7;\n    x7 := @parameter0: int;\n"
        "    y7 := @parameter1: int;\n"
        "    staticinvoke <JSink: void sink207(int)>(y7);\n    return;\n"
        "  }\n"
        "  public static void jc7() {\n"
        "    staticinvoke <JA7: void jh7(int,int)>(2007, 2);\n    return;\n"
        "  }\n}", "2007", False, False),
    "jbc_branch_join": ("Predicates",
        "public class JA8 extends java.lang.Object {\n"
        "  public static void jc8(int) {\n"
        "    int a0, b0, c0;\n    c0 := @parameter0: int;\n"
        "    a0 = 2008;\n    b0 = 0;\n"
        "    if c0 <= 0 goto jskip8;\n"
        "    b0 = a0;\n"
        "  jskip8:\n"
        "    staticinvoke <JSink: void sink208(int)>(b0);\n    return;\n"
        "  }\n}", "2008", True, True),
}


@pytest.fixture(scope="module")
def accuracy_cpg(spark):
    from joern_spark.corpus import docs_df
    from joern_spark.pipeline import run_pipeline

    docs = docs_df(spark, [
        {"doc_id": f"acc/{name}", "spans": [
            {"kind": "code", "text": code, "media_ref": "", "offset": 0}]}
        for name, (_cat, code, _, _, _) in CASES.items()
    ])
    return run_pipeline(spark, docs, n_parts=4)


@pytest.fixture(scope="module")
def verdicts(accuracy_cpg):
    res = accuracy_cpg
    spark = res.nodes.sparkSession
    sink_args = (
        res.nodes.filter(F.col("kind") == "CALL")
        .filter(F.col("name").rlike("^sink"))
        .select(F.col("node_id").alias("src"))
        .join(res.edges.filter(F.col("kind") == "ARGUMENT"), "src")
        .select(F.col("dst").alias("node_id"))
    )
    out = {}
    for name, (_cat, _code, lit, _truth, _pred) in CASES.items():
        src_ids = [r["node_id"] for r in res.nodes.filter(
            (F.col("kind") == "LITERAL") & (F.col("code") == lit)
        ).collect()]
        assert src_ids, name
        sources = spark.createDataFrame([(i,) for i in src_ids], "node_id long")
        paths = reachable_by_flows(res.nodes, res.edges, sink_args, sources)
        out[name] = any(p[0] in set(src_ids) for p in paths)
    return out


def category_table(verdicts) -> dict:
    """category -> dict(TP, FP, TN, FN) — the Securibench-style table."""
    table: dict = {}
    for name, (cat, _code, _lit, truth, _pred) in CASES.items():
        got = verdicts[name]
        cell = ("TP" if truth and got else "FN" if truth
                else "FP" if got else "TN")
        table.setdefault(cat, {"TP": 0, "FP": 0, "TN": 0, "FN": 0})[cell] += 1
    return table


def test_engine_verdicts_locked(verdicts):
    """Regression gate: every case's engine verdict matches the locked
    expectation — a flip in either direction is a dataflow change."""
    mismatches = {
        name: (verdicts[name], pred)
        for name, (_cat, _c, _l, _t, pred) in CASES.items()
        if verdicts[name] != pred
    }
    assert not mismatches, f"engine verdict drift: {mismatches}"


def test_all_reference_categories_seeded():
    cats = {cat for cat, *_ in CASES.values()}
    assert cats == {
        "Aliasing", "Arrays", "Basic", "Collections", "Data Structures",
        "Factories", "Inter-procedural", "Predicates", "Reflection",
        "Sanitizers", "Session", "Strong Updates",
    }


def test_accuracy_vs_truth(verdicts):
    """Aggregate accuracy vs ground truth ≥ the reference's published bar
    (Securibench Micro javasrc2cpg: 78.72%), with the per-category table
    printed in the reference's format (mirrored in BASELINE.md)."""
    table = category_table(verdicts)
    for cat in sorted(table):
        c = table[cat]
        print(f"{cat:18s} #={sum(c.values()):2d} FP={c['FP']} TP={c['TP']} "
              f"TN={c['TN']} FN={c['FN']}")
    tp = sum(c["TP"] for c in table.values())
    tn = sum(c["TN"] for c in table.values())
    fp = sum(c["FP"] for c in table.values())
    fn = sum(c["FN"] for c in table.values())
    total = len(CASES)
    acc = (tp + tn) / total
    print(f"total: TP={tp} FP={fp} TN={tn} FN={fn} acc={acc:.4f}")
    assert acc >= 0.7872, f"accuracy {acc:.4f} below the reference bar"
    # false negatives only in the two documented blind-spot categories the
    # reference shares (Reflection-style indirect calls, Session-style
    # cross-method state)
    fn_cats = {cat for name, (cat, _c, _l, t, _p) in CASES.items()
               if t and not verdicts[name]}
    assert fn_cats <= {"Reflection", "Session"}, fn_cats
