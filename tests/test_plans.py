"""Physical-plan quality gates (100 TB readiness, SURVEY.md §4).

Asserts the plans Catalyst produces are the plans we designed for:
- parquet scans prune columns (ReadSchema) and push filters down,
- dimension joins broadcast (no shuffle of the fact side),
- the fused kernel pass is shuffle-free (no Exchange above the scan),
- analytics aggregations keep partial (map-side) aggregation.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_text_quality_column_pruning(spark):
    from joern_spark.analytics.text import text_quality

    plan = _plan(text_quality(spark, SF))
    # only doc_id + text read from a 5-column table
    assert "ReadSchema" in plan
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read
    assert "n_chars" not in read and "source" not in read


def test_filter_pushdown_to_scan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.filter(F.col("lang") == "en").select("doc_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan or \
           "PushedFilters: [*IsNotNull(lang), *EqualTo(lang,en)]" in plan


def test_orders_by_nation_broadcasts_dims(spark):
    from joern_spark.analytics.relational import orders_by_nation

    plan = _plan(orders_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_fused_kernels_shuffle_free(spark):
    from joern_spark.corpus import fixture_docs_df
    from joern_spark.operators.ast_pass import parse_docs, split_rows
    from joern_spark.operators.method_kernels import fused_method_kernels

    docs = fixture_docs_df(spark)
    nodes, _, _ = split_rows(parse_docs(docs))
    k = fused_method_kernels(nodes, internal_names=set())
    plan = _plan(k)
    assert "Exchange" not in plan, f"kernel pass must not shuffle:\n{plan}"


def test_static_linker_broadcasts_method_dim(spark, cpg):
    from joern_spark.operators.callgraph import static_call_linker

    plan = _plan(static_call_linker(cpg.nodes))
    assert "BroadcastHashJoin" in plan


def test_static_linker_auto_dispatch(spark, cpg):
    """'auto' must pick broadcast under the budget and salted above it —
    a 100×-scale method dim would otherwise kill the broadcast."""
    from joern_spark.operators.callgraph import static_call_linker

    small = static_call_linker(cpg.nodes, strategy="auto")
    assert "BroadcastHashJoin" in _plan(small)

    big = static_call_linker(cpg.nodes, strategy="auto", broadcast_budget=1)
    plan = _plan(big)
    # the salted path shuffles both sides on the salted key — the method dim
    # must NOT be broadcast-joined
    assert "salt" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_partial_aggregation_present(spark):
    from joern_spark.analytics.dedup import dedup_exact

    plan = _plan(dedup_exact(spark, SF))
    # partial (map-side) HashAggregate before the exchange, final after
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_pricing_summary_scan_quality(spark):
    from joern_spark.analytics.relational import pricing_summary

    plan = _plan(pricing_summary(spark, SF))
    # date filter reaches the parquet scan; shipdate never leaves the scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan  # map-side combine before the exchange
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read  # unused columns pruned


def test_anti_join_stays_broadcast(spark):
    from joern_spark.analytics.relational import customers_without_orders

    plan = _plan(customers_without_orders(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_fallback_callgraph_plan_no_window(spark, cpg):
    """The call arbitration that the over-budget DataFrame fallback runs must
    never plan a Window(partitionBy src): the window shuffles + sorts the full
    candidate union and buffers every src group (measured 9x task-CPU
    inflation at 32 cores, round 3). The one-pass aggregate arbitration is
    the only acceptable plan on the path that runs at 100x scale."""
    from joern_spark.operators.callgraph import link_calls

    plan = _plan(link_calls(cpg.nodes, cpg.edges))
    assert "Window" not in plan, f"fallback arbitration planned a window:\n{plan}"


def test_fallback_source_has_no_sequential_chain():
    """_run_dataframe (the over-budget path) must use the same one-pass
    arbitration as the fused path — not the sequential linker chain whose
    naive stage generates bare-name candidates for ALL calls and anti-joins
    the resolved ones only AFTER the k2-per-name join (212M rows at 80k docs,
    round-3 profile). The sequential chain survives only as the parity test
    oracle (tests/test_dims.py::test_link_calls_matches_sequential_chain)."""
    import inspect

    from joern_spark import pipeline

    src = inspect.getsource(pipeline._run_dataframe)
    assert "link_calls" in src
    assert "naive_call_linker" not in src
    assert "prefer_internal_call_edges" not in src
