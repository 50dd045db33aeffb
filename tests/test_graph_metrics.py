"""Per-method metrics + bounded call-closure tests (SURVEY.md §2 queries;
reference querydb/.../c/Metrics.scala and the DSL repeat(_.callee) step)."""

import pytest
from pyspark.sql import functions as F

from joern_spark.corpus import docs_df, split_code_spans
from joern_spark.operators.graph_metrics import call_closure, method_metrics
from joern_spark.pipeline import run_pipeline

SRC = """int leaf(int x) { return x + 1; }
int branchy(int a, int b, int c) {
  int acc = 0;
  while (a > 0) {
    if (b > c) { acc = acc + leaf(a); } else { acc = acc - 1; }
    a = a - 1;
  }
  return acc;
}
int mid(int v) { return branchy(v, v, 1); }
int top(int v) { if (v > 0) { return mid(v); } return 0; }"""


@pytest.fixture(scope="module")
def cpg(spark):
    docs = docs_df(spark, [
        {"doc_id": "gm/a.c", "spans": split_code_spans(SRC, 2)},
    ])
    return run_pipeline(spark, docs, n_parts=2, with_dataflow=False)


@pytest.fixture(scope="module")
def metrics(cpg):
    df = method_metrics(cpg.nodes, cpg.edges)
    return {r["method_full_name"]: r.asDict() for r in df.collect()}


def test_param_and_return_counts(metrics):
    assert metrics["branchy"]["n_params"] == 3
    assert metrics["leaf"]["n_params"] == 1
    assert metrics["branchy"]["n_returns"] == 1
    assert metrics["top"]["n_returns"] == 2


def test_control_and_loop_counts(metrics):
    # branchy: while + if + else bodies → 1 loop among its controls
    assert metrics["branchy"]["n_loops"] == 1
    assert metrics["branchy"]["n_control"] >= 2
    assert metrics["leaf"]["n_control"] == 0
    assert metrics["leaf"]["n_loops"] == 0


def test_cyclomatic_straight_line_is_one(metrics):
    # E - N + 2 == 1 for straight-line code: the CFG is a path
    assert metrics["leaf"]["cyclomatic"] == 1
    assert metrics["mid"]["cyclomatic"] == 1


def test_cyclomatic_counts_branch_points(metrics):
    # while + if/else = 2 decision points → cyclomatic 3 (E-N+2)
    assert metrics["branchy"]["cyclomatic"] == 3
    assert metrics["top"]["cyclomatic"] == 2


def test_metrics_exclude_external_stubs(cpg, metrics):
    ext = {r["full_name"]
           for r in cpg.nodes.filter((F.col("kind") == "METHOD")
                                     & F.col("is_external")).collect()}
    assert not (ext & set(metrics))


def test_call_closure_direct_and_transitive(cpg):
    pairs = {(r["src_full_name"], r["dst_full_name"]): r["hops"]
             for r in call_closure(cpg.nodes, cpg.edges).collect()}
    assert pairs[("top", "mid")] == 1
    assert pairs[("top", "branchy")] == 2
    assert pairs[("top", "leaf")] == 3
    assert pairs[("mid", "leaf")] == 2
    assert ("leaf", "top") not in pairs  # closure is directed


def test_call_closure_respects_hop_bound(cpg):
    pairs = call_closure(cpg.nodes, cpg.edges, max_hops=2)
    got = {(r["src_full_name"], r["dst_full_name"]) for r in pairs.collect()}
    assert ("top", "branchy") in got
    assert ("top", "leaf") not in got  # 3 hops, beyond the bound
