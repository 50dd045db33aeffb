"""Connected-components / canonicalization tests.

Property check: large-star/small-star result equals a driver-side union-find
on random graphs (seeded). CPG check: dereference aliasing merges ``T*``
with ``T`` deterministically (min representative).
"""

import random

import pytest
from pyspark.sql import functions as F

from joern_spark.operators.canonicalize import (
    canonical_symbols,
    connected_components,
    with_singletons,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("seed,n,m", [(1, 30, 20), (2, 100, 60), (3, 50, 120)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _union_find(pairs)
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == want


def test_cc_long_chain(spark):
    # path graph 0-1-2-...-19: worst case for label propagation, fine for
    # star-contraction (O(log n) rounds)
    pairs = [(i, i + 1) for i in range(19)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(20)}


def test_cc_string_ids(spark):
    df = spark.createDataFrame([("b", "a"), ("c", "b"), ("x", "y")], "a string, b string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_with_singletons(spark):
    comp = connected_components(spark.createDataFrame([(1, 2)], "a long, b long"))
    uni = spark.createDataFrame([(1,), (2,), (5,)], "id long")
    got = {r["node"]: r["component"] for r in with_singletons(comp, uni).collect()}
    assert got == {1: 1, 2: 1, 5: 5}


def test_symbol_canonicalization(cpg):
    """struct node * (free_list param type) canonicalizes with struct node."""
    mapping = {
        r["full_name"]: r["canonical"]
        for r in canonical_symbols(cpg.nodes, cpg.edges).collect()
    }
    starred = [fn for fn in mapping if "*" in fn]
    assert starred, "expected at least one pointer type in the mention graph"
    for fn in starred:
        assert "*" not in mapping[fn] or mapping[fn] <= fn
    # deterministic: canonical is the component minimum
    assert all(mapping[fn] <= fn for fn in mapping)
