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

# case name -> (code, source literal, truth, predicted)
CASES = {
    "basic_direct": (
        "void c1() { int a = 1001; sink1(a); }", "1001", True, True),
    "basic_overwrite": (
        "void c2() { int a = 1002; a = 0; sink2(a); }", "1002", False, False),
    "basic_unrelated": (
        "void c3() { int a = 1003; int b = 7; sink3(b); }", "1003", False, False),
    "binop_propagation": (
        "void c4() { int a = 1004; int b = a + 1; sink4(b); }", "1004", True, True),
    "interproc_param": (
        "void h5(int x5) { sink5(x5); }\nvoid c5() { h5(1005); }",
        "1005", True, True),
    "interproc_return": (
        "int h6() { return 1006; }\nvoid c6() { int a6 = h6(); sink6(a6); }",
        "1006", True, True),
    # sanitizer: default semantics taint through unknown calls — known FP,
    # mirroring the reference's Securibench 'Sanitizers' FP rows
    "sanitizer_call": (
        "void c8() { int a8 = 1008; a8 = sanitize8(a8); sink8(a8); }",
        "1008", False, True),
    "branch_join": (
        "void c9() { int a9 = 1009; int b9 = 0;"
        " if (a9 > 0) { b9 = a9; } else { b9 = 0; } sink9(b9); }",
        "1009", True, True),
    "loop_carry": (
        "void c10() { int a10 = 1010; int s10 = 0;"
        " while (a10 > 0) { s10 = s10 + a10; a10--; } sink10(s10); }",
        "1010", True, True),
    # dead branch: path-insensitive engine taints through `if (0)` — known FP
    # (Securibench 'Predicates' family)
    "dead_branch": (
        "void c11() { int a11 = 1011; int b11 = 0;"
        " if (0) { b11 = a11; } sink11(b11); }",
        "1011", False, True),
    # argument-index precision: literal flows into x12 only, sink reads y12
    "wrong_arg_index": (
        "void h12(int x12, int y12) { sink12(y12); }\n"
        "void c12() { h12(1012, 2); }",
        "1012", False, False),
    # realizable paths: caller_a's literal must not exit id13 into caller_b
    "two_caller_realizable": (
        "int id13(int x13) { return x13; }\n"
        "void ca13() { int a13 = id13(1013); other13(a13); }\n"
        "void cb13() { int b13 = id13(2); sink13(b13); }",
        "1013", False, False),
}


@pytest.fixture(scope="module")
def accuracy_cpg(spark):
    from joern_spark.corpus import docs_df
    from joern_spark.pipeline import run_pipeline

    docs = docs_df(spark, [
        {"doc_id": f"acc/{name}", "spans": [
            {"kind": "code", "text": code, "media_ref": "", "offset": 0}]}
        for name, (code, _, _, _) in CASES.items()
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
    for name, (_code, lit, _truth, _pred) in CASES.items():
        src_ids = [r["node_id"] for r in res.nodes.filter(
            (F.col("kind") == "LITERAL") & (F.col("code") == lit)
        ).collect()]
        assert src_ids, name
        sources = spark.createDataFrame([(i,) for i in src_ids], "node_id long")
        paths = reachable_by_flows(res.nodes, res.edges, sink_args, sources)
        out[name] = any(p[0] in set(src_ids) for p in paths)
    return out


def test_engine_verdicts_locked(verdicts):
    """Regression gate: every case's engine verdict matches the locked
    expectation — a flip in either direction is a dataflow change."""
    mismatches = {
        name: (verdicts[name], pred)
        for name, (_c, _l, _t, pred) in CASES.items()
        if verdicts[name] != pred
    }
    assert not mismatches, f"engine verdict drift: {mismatches}"


def test_accuracy_vs_truth(verdicts):
    """Aggregate accuracy vs ground truth ≥ the reference's published bar
    (Securibench Micro javasrc2cpg: 78.72%)."""
    tp = sum(1 for n, (_c, _l, t, _p) in CASES.items() if t and verdicts[n])
    tn = sum(1 for n, (_c, _l, t, _p) in CASES.items()
             if not t and not verdicts[n])
    fp = sum(1 for n, (_c, _l, t, _p) in CASES.items()
             if not t and verdicts[n])
    fn = sum(1 for n, (_c, _l, t, _p) in CASES.items() if t and not verdicts[n])
    total = len(CASES)
    acc = (tp + tn) / total
    print(f"accuracy micro-suite: TP={tp} FP={fp} TN={tn} FN={fn} "
          f"acc={acc:.3f}")
    assert acc >= 0.78, f"accuracy {acc:.3f} below the reference bar"
    assert fn == 0, "no false negatives on seeded reachable flows"
