"""Salted-join equivalence tests on the hot-key skew corpus (F7).

The salted plan must produce exactly the broadcast plan's edges — salting
changes physical placement, never results.
"""

import pytest
from pyspark.sql import functions as F

from joern_spark.corpus import docs_df, skew_corpus
from joern_spark.operators.ast_pass import parse_docs, split_rows
from joern_spark.operators.base_passes import method_stubs
from joern_spark.operators.callgraph import static_call_linker
from joern_spark.operators.salting import detect_hot_keys, salted_join


@pytest.fixture(scope="module")
def skew_nodes(spark):
    docs = docs_df(spark, skew_corpus(60), partitions=4)
    rows = parse_docs(docs).persist()
    nodes, edges, _ = split_rows(rows)
    stubs, _ = method_stubs(nodes, edges)
    return nodes.unionByName(stubs).persist()


def test_salted_equals_broadcast(skew_nodes):
    want = {
        (r["src"], r["dst"])
        for r in static_call_linker(skew_nodes, strategy="broadcast").collect()
    }
    got = {
        (r["src"], r["dst"])
        for r in static_call_linker(skew_nodes, strategy="salted").collect()
    }
    assert got == want
    assert len(got) > 0


def test_hot_key_detection(skew_nodes):
    calls = skew_nodes.filter(F.col("kind") == "CALL").select(
        F.col("full_name").alias("m_full"), F.col("node_id").alias("call_id")
    )
    hot = {r["m_full"] for r in detect_hot_keys(calls, "m_full", 0.05, 10).collect()}
    # printf appears twice per skew doc, malloc once — both hot
    assert "printf" in hot
    assert "malloc" in hot
    # unique helpers are not hot
    assert not any(h.startswith("helper_") for h in hot)


def test_salted_join_with_supplied_hot_keys(spark):
    facts = spark.createDataFrame(
        [(i, "hot" if i % 2 else f"cold{i}") for i in range(100)], "fid long, k string"
    )
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold{i}", i) for i in range(0, 100, 2)], "k string, v long"
    )
    hot = spark.createDataFrame([("hot",)], "k string")
    got = salted_join(facts, dim, key="k", fact_salt_from="fid", hot_keys=hot)
    plain = facts.join(dim, "k")
    assert sorted((r["fid"], r["v"]) for r in got.collect()) == \
           sorted((r["fid"], r["v"]) for r in plain.collect())


def test_salted_plan_shape(skew_nodes):
    """The salted plan must not broadcast the dim — it shuffles both sides
    on (key, salt)."""
    df = static_call_linker(skew_nodes, strategy="salted")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the probe-side join is a shuffle join (SortMerge or ShuffledHash);
    # only the tiny hot-key list itself may broadcast
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan