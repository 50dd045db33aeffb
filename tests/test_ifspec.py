"""IFSpec- and JInfoFlow-analog suites (the reference's other two published
benchmarks, ``benchmarks/README.md:48-112``).

Same harness discipline as the Securibench-analog (`test_accuracy.py`):
TRUTH = does the secret actually reach the sink (information-flow ground
truth, INCLUDING implicit/control-dependence flows — IFSpec's defining
feature); PREDICTED = the locked engine verdict. The engine — like the
reference's — is an explicit-dataflow engine, so pure implicit flows are
expected FNs; the accuracy bars asserted are the reference's published
totals (IFSpec javasrc 52.06%, JInfoFlow javasrc 40.0%), which price in
exactly those blind spots.

Category distribution mirrors the reference's IFSpec table at ~55% scale
(primary category per case; the reference counts overlapping memberships).
"""

import pyspark.sql.functions as F
import pytest

from joern_spark.dataflow import reachable_by_flows

# name -> (category, code, secret literal, truth, predicted)
IFSPEC_CASES = {
    # ---- Simple (5; ref 18: 6 TP / 3 TN / 0 FN / 9 FP) ---------------------
    "ifs_direct": ("Simple",
        "void f4001() { int s = 4001; sink4001(s); }", "4001", True, True),
    "ifs_no_leak": ("Simple",
        "void f4002() { int s = 4002; sink4002(0); }", "4002", False, False),
    "ifs_copy": ("Simple",
        "void f4003() { int s = 4003; int t = s; sink4003(t); }",
        "4003", True, True),
    "ifs_arith": ("Simple",
        "void f4004() { int s = 4004; int t = s + 7; sink4004(t); }",
        "4004", True, True),
    "ifs_unused_secret": ("Simple",
        "void f4005() { int s = 4005; int p = 9; sink4005(p); }",
        "4005", False, False),
    # ---- Explicit Flows (10; ref 41: 10 TP / 12 TN / 6 FN / 13 FP) ---------
    "exp_chain": ("Explicit Flows",
        "void f4011() { int s = 4011; int a = s; int b = a; sink4011(b); }",
        "4011", True, True),
    "exp_through_extern": ("Explicit Flows",
        "void f4012() { int s = 4012; int t = enc4012(s); sink4012(t); }",
        "4012", True, True),
    "exp_overwrite": ("Explicit Flows",
        "void f4013() { int s = 4013; int t = s; t = 0; sink4013(t); }",
        "4013", False, False),
    "exp_swap": ("Explicit Flows",
        "void f4014() { int s = 4014; int a = 1; int t = a; a = s; s = t;"
        " sink4014(a); }",
        "4014", True, True),
    "exp_struct_field": ("Explicit Flows",
        "void f4015(struct T4015 *o4015) { o4015->x = 4015;"
        " sink4015(o4015->x); }",
        "4015", True, True),
    "exp_wrong_field": ("Explicit Flows",
        "void f4016(struct T4016 *o4016) { o4016->x = 4016;"
        " sink4016(o4016->y); }",
        "4016", False, False),
    "exp_interproc_param": ("Explicit Flows",
        "void h4017(int v4017) { sink4017(v4017); }\n"
        "void f4017() { h4017(4017); }",
        "4017", True, True),
    "exp_interproc_return": ("Explicit Flows",
        "int h4018() { return 4018; }\n"
        "void f4018() { int t = h4018(); sink4018(t); }",
        "4018", True, True),
    # value-insensitive FPs — the reference's Explicit row posts 13 FPs of
    # exactly this class (taint algebra can't see s-s == 0, s & 0 == 0)
    "exp_self_cancel_fp": ("Explicit Flows",
        "void f4019() { int s = 4019; int t = s - s; sink4019(t); }",
        "4019", False, True),
    "exp_mask_zero_fp": ("Explicit Flows",
        "void f4020() { int s = 4020; int t = s & 0; sink4020(t); }",
        "4020", False, True),
    # ---- Implicit Flows (8; ref 32: 11 TP / 5 TN / 6 FN / 10 FP) -----------
    # pure control-dependence leaks are the explicit-engine blind spot (FN);
    # the reference's implicit TPs come from cases with an explicit component
    "imp_branch_assign": ("Implicit Flows",
        "void f4021() { int s = 4021; int p = 0;"
        " if (s > 0) { p = 1; } sink4021(p); }",
        "4021", True, False),
    "imp_else_assign": ("Implicit Flows",
        "void f4022() { int s = 4022; int p = 0;"
        " if (s > 0) { p = 1; } else { p = 2; } sink4022(p); }",
        "4022", True, False),
    "imp_loop_count": ("Implicit Flows",
        "void f4023() { int s = 4023; int c = 0;"
        " while (s > 0) { c = c + 1; s = s - 1; } sink4023(c); }",
        "4023", True, False),
    "imp_no_leak": ("Implicit Flows",
        "void f4024() { int s = 4024; int p = 0;"
        " if (s > 0) { p = 1; } sink4024(0); }",
        "4024", False, False),
    "imp_with_explicit": ("Implicit Flows",
        "void f4025() { int s = 4025; int p = 0;"
        " if (s > 0) { p = s; } sink4025(p); }",
        "4025", True, True),
    "imp_comparison_value": ("Implicit Flows",
        "void f4026() { int s = 4026; int p = s > 0; sink4026(p); }",
        "4026", True, True),
    "imp_guard_same_const": ("Implicit Flows",
        # both branches assign the same value — no information flows
        "void f4027() { int s = 4027; int p = 0;"
        " if (s > 0) { p = 2; } else { p = 2; } sink4027(p); }",
        "4027", False, False),
    "imp_nested_branch": ("Implicit Flows",
        "void f4028() { int s = 4028; int p = 0;"
        " if (s > 0) { if (s > 1) { p = 1; } } sink4028(p); }",
        "4028", True, False),
    # ---- Exceptions (3; ref 9: 4 TP / 1 TN / 2 FN / 2 FP) ------------------
    "exc_throw_secret": ("Exceptions",
        # the thrown VALUE carries the secret into the handler — no
        # exceptional def-use edge in the engine (FN, reference posts the
        # same class)
        "void f4031() { int s = 4031;"
        " try { if (s > 0) { throw s; } } catch (int e4031) {"
        " sink4031(e4031); } }",
        "4031", True, False),
    "exc_flow_across_try": ("Exceptions",
        "void f4032() { int s = 4032; int t = 0;"
        " try { t = s; } catch (int e4032) { t = 0; } sink4032(t); }",
        "4032", True, True),
    "exc_sink_in_handler": ("Exceptions",
        "void f4033() { int s = 4033;"
        " try { mayfail4033(); } catch (int e4033) { sink4033(s); } }",
        "4033", True, True),
    # ---- Aliasing (3; ref 11: 0 TP / 6 TN / 5 FN / 0 FP) -------------------
    "ali_ptr_write_leak": ("Aliasing",
        "void f4041() { int p = 0; int *q4041 = &p; *q4041 = 4041;"
        " sink4041(p); }",
        "4041", True, False),
    "ali_unrelated_ptr": ("Aliasing",
        "void f4042() { int s = 4042; int o = 5; int *q4042 = &o;"
        " sink4042(*q4042); }",
        "4042", False, False),
    "ali_deref_after_def": ("Aliasing",
        "void f4043() { int p = 4043; int *q4043 = &p; sink4043(*q4043); }",
        "4043", True, True),
    # ---- Arrays (3; ref 12: 1 TP / 5 TN / 4 FN / 2 FP) ---------------------
    "arr_same_slot": ("Arrays",
        "void f4051() { int r4051[4]; r4051[1] = 4051; sink4051(r4051[1]); }",
        "4051", True, True),
    "arr_clean_slot": ("Arrays",
        "void f4052() { int r4052[4]; r4052[0] = 4052; r4052[1] = 0;"
        " sink4052(r4052[1]); }",
        "4052", False, False),
    "arr_alias_before_def": ("Arrays",
        # the base copy happens BEFORE the secret store: the t view is
        # un-tainted at copy time, the later store isn't seen through it
        "void f4053() { int r4053[4]; int *t4053; t4053 = r4053;"
        " r4053[0] = 4053; sink4053(t4053[0]); }",
        "4053", True, False),
    # ---- Casting (1; ref 2: 0 TP / 0 TN / 1 FN / 1 FP) ---------------------
    "cast_preserves": ("Casting",
        "void f4061() { int s = 4061; long t = (long)s; sink4061(t); }",
        "4061", True, True),
    # ---- Class Initializer (2; ref 7: 2 TP / 2 TN / 1 FN / 2 FP) -----------
    "ci_cross_function_global": ("Class Initializer",
        "int g4071;\n"
        "void init4071() { g4071 = 4071; }\n"
        "void f4071() { sink4071(g4071); }",
        "4071", True, False),
    "ci_local_shadow": ("Class Initializer",
        "int g4072;\n"
        "void f4072() { int s = 4072; int l4072 = 0; sink4072(l4072); }",
        "4072", False, False),
    # ---- Library (2; ref 7: 4 TP / 0 TN / 1 FN / 2 FP) ---------------------
    "lib_passthrough": ("Library",
        "void f4081() { int s = 4081; int t = strdup4081(s); sink4081(t); }",
        "4081", True, True),
    "lib_declassify_fp": ("Library",
        "void f4082() { int s = 4082; int t = declass4082(s); sink4082(t); }",
        "4082", False, True),
}

# name -> (category, code, secret literal, truth, predicted)
# JInfoFlow-analog: reflection / event / context-sensitivity patterns
# (ref totals 20: 2 TP / 6 TN / 10 FN / 2 FP, 40.0%)
JINFOFLOW_CASES = {
    "jif_basic_container": ("Basic",
        "void f4101(int *c4101) { put4101(c4101, 4101);"
        " int v = get4101(c4101); sink4101(v); }",
        "4101", True, True),
    "jif_basic_clean": ("Basic",
        "void f4102(int *c4102) { put4102(c4102, 4102); sink4102(7); }",
        "4102", False, False),
    # context sensitivity: the realizable-path stack keeps per-call-site
    # flows apart — the reference's Context row posts 4 FN / 2 FP here,
    # the call-site-stack engine gets these right
    "jif_ctx_two_callers": ("Context",
        "int id4103(int x4103) { return x4103; }\n"
        "void fa4103() { int a = id4103(4103); use4103(a); }\n"
        "void fb4103() { int b = id4103(2); sink4103(b); }",
        "4103", False, False),
    "jif_ctx_same_caller": ("Context",
        "int id4104(int x4104) { return x4104; }\n"
        "void f4104() { int a = id4104(4104); sink4104(a); }",
        "4104", True, True),
    "jif_ctx_depth2": ("Context",
        "int inner4105(int y4105) { return y4105; }\n"
        "int outer4105(int x4105) { return inner4105(x4105); }\n"
        "void f4105() { int a = outer4105(4105); sink4105(a); }",
        "4105", True, True),
    "jif_ctx_sink_other_callee": ("Context",
        "int id4106(int x4106) { return x4106; }\n"
        "void h4106(int v4106) { sink4106(v4106); }\n"
        "void f4106() { int a = id4106(4106); use4106(a); h4106(3); }",
        "4106", False, False),
    # event patterns: a directly-invoked stored handler resolves through
    # the method-ref hint rule (TP); handlers invoked INSIDE an external
    # dispatcher have no visible call site (FN — the reference's Event row
    # is 0 TP / 5 FN for the same reason)
    "jif_event_direct_fire": ("Event",
        "void h4107(int e4107) { sink4107(e4107); }\n"
        "void f4107() { void (*fp4107)(int) = h4107; fp4107(4107); }",
        "4107", True, True),
    "jif_event_external_dispatch": ("Event",
        "void h4108(int e4108) { sink4108(e4108); }\n"
        "void f4108() { void (*fp4108)(int) = h4108;"
        " dispatch4108(fp4108, 4108); }",
        "4108", True, False),
    "jif_event_registered_elsewhere": ("Event",
        "void h4109(int e4109) { sink4109(e4109); }\n"
        "void reg4109() { store4109(h4109); }\n"
        "void f4109() { fire4109(4109); }",
        "4109", True, False),
    "jif_event_no_leak": ("Event",
        "void h4110(int e4110) { use4110(e4110); }\n"
        "void f4110() { void (*fp4110)(int) = h4110; fp4110(4110); }",
        "4110", False, False),
}

ALL_CASES = {**IFSPEC_CASES, **JINFOFLOW_CASES}


@pytest.fixture(scope="module")
def ifspec_cpg(spark):
    from joern_spark.corpus import docs_df
    from joern_spark.pipeline import run_pipeline

    docs = docs_df(spark, [
        {"doc_id": f"ifspec/{name}", "spans": [
            {"kind": "code", "text": code, "media_ref": "", "offset": 0}]}
        for name, (_cat, code, _, _, _) in ALL_CASES.items()
    ])
    return run_pipeline(spark, docs, n_parts=4)


@pytest.fixture(scope="module")
def verdicts(ifspec_cpg):
    """ONE shared reachableByFlows call for all cases (test_accuracy.py's
    union-run argument: observationally identical to per-case runs)."""
    res = ifspec_cpg
    spark = res.nodes.sparkSession
    sink_args = (
        res.nodes.filter(F.col("kind") == "CALL")
        .filter(F.col("name").rlike("^sink"))
        .select(F.col("node_id").alias("src"))
        .join(res.edges.filter(F.col("kind") == "ARGUMENT"), "src")
        .select(F.col("dst").alias("node_id"))
    )
    lits = {lit for (_c, _code, lit, _t, _p) in ALL_CASES.values()}
    by_lit: dict = {}
    for r in res.nodes.filter(
        (F.col("kind") == "LITERAL") & F.col("code").isin(sorted(lits))
    ).select("node_id", "code").collect():
        by_lit.setdefault(r["code"], set()).add(r["node_id"])
    sources = spark.createDataFrame(
        [(int(i),) for s in by_lit.values() for i in s], "node_id long")
    paths = reachable_by_flows(res.nodes, res.edges, sink_args, sources)
    heads = {p[0] for p in paths}
    out = {}
    for name, (_cat, _code, lit, _truth, _pred) in ALL_CASES.items():
        ids = by_lit.get(lit, set())
        assert ids, name
        out[name] = bool(ids & heads)
    return out


def test_verdicts_locked(verdicts):
    mismatches = {
        name: (verdicts[name], pred)
        for name, (_cat, _c, _l, _t, pred) in ALL_CASES.items()
        if verdicts[name] != pred
    }
    assert not mismatches, f"engine verdict drift: {mismatches}"


def _accuracy(cases, verdicts) -> float:
    right = sum(
        1 for name, (_c, _co, _l, truth, _p) in cases.items()
        if verdicts[name] == truth
    )
    return right / len(cases)


def test_ifspec_accuracy_vs_reference_bar(verdicts):
    """>= the reference's published IFSpec javasrc total (52.06%,
    benchmarks/README.md:54-69) — the bar prices in the implicit-flow
    blind spot both engines share."""
    acc = _accuracy(IFSPEC_CASES, verdicts)
    assert acc >= 0.5206, acc


def test_jinfoflow_accuracy_vs_reference_bar(verdicts):
    """>= the reference's published JInfoFlow javasrc total (40.0%,
    benchmarks/README.md:95-102). The call-site-stack realizable-path
    engine gets the Context cases right where the reference's posts
    4 FN / 2 FP, so the analog lands well above the bar."""
    acc = _accuracy(JINFOFLOW_CASES, verdicts)
    assert acc >= 0.40, acc


def test_ifspec_categories_seeded():
    cats = {cat for cat, *_ in IFSPEC_CASES.values()}
    assert cats == {
        "Simple", "Explicit Flows", "Implicit Flows", "Exceptions",
        "Aliasing", "Arrays", "Casting", "Class Initializer", "Library",
    }
    jcats = {cat for cat, *_ in JINFOFLOW_CASES.values()}
    assert jcats == {"Basic", "Context", "Event"}
