"""Dedup operator semantics: MinHash banding recall/precision shape and the
exact-Jaccard verification join that guards clustering against LSH false
positives (round-2 verdict item 10)."""

import pytest
from pyspark.sql import functions as F

from joern_spark.analytics.dedup import (
    JACCARD_VERIFY_T,
    N_BANDS,
    N_HASHES,
    ROWS_PER_BAND,
    verified_pairs,
)


def _sh(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, shingle string")


def test_banding_parameters_realistic():
    # the verdict's scale criterion: >= 64 signatures, multi-row bands
    assert N_HASHES >= 64
    assert ROWS_PER_BAND >= 2
    assert N_BANDS * ROWS_PER_BAND == N_HASHES


def test_verified_pairs_keeps_true_duplicates(spark):
    # docs 1 and 2 share 3 of 4 shingles: J = 3/5... actually |A∩B|=3,
    # |A∪B| = 4+4-3 = 5 → J = 0.6 >= 0.5 → kept
    sh = _sh(spark, [(1, "a"), (1, "b"), (1, "c"), (1, "d"),
                     (2, "a"), (2, "b"), (2, "c"), (2, "e")])
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    out = verified_pairs(sh, cand).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(1, 2)]


def test_verified_pairs_rejects_false_positive_band(spark):
    # docs 3 and 4 share 1 of 7 shingles: J = 1/7 < 0.5 — a colliding band
    # (candidate pair) must NOT survive verification, so it cannot merge
    # clusters
    sh = _sh(spark, [(3, "x"), (3, "p"), (3, "q"), (3, "r"),
                     (4, "x"), (4, "s"), (4, "t"), (4, "u")])
    cand = spark.createDataFrame([(3, 4)], "doc_a long, doc_b long")
    assert verified_pairs(sh, cand).count() == 0


def test_verified_pairs_rejects_zero_overlap(spark):
    # no shared shingles at all: the left join yields null n_inter → rejected
    sh = _sh(spark, [(5, "a"), (6, "b")])
    cand = spark.createDataFrame([(5, 6)], "doc_a long, doc_b long")
    assert verified_pairs(sh, cand).count() == 0


def test_false_positive_band_does_not_merge_clusters(spark):
    """End-to-end: CC over verified pairs never unions a rejected candidate."""
    from joern_spark.operators.canonicalize import connected_components, with_singletons

    sh = _sh(spark, [(1, "a"), (1, "b"), (2, "a"), (2, "b"),   # true dups
                     (3, "z"), (3, "p"), (3, "q"), (3, "r"),
                     (4, "z"), (4, "s"), (4, "t"), (4, "u")])  # false pair
    cand = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    pairs = verified_pairs(sh, cand).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "doc_id long")
    comp = {
        r["node"]: r["component"]
        for r in with_singletons(connected_components(pairs), docs).collect()
    }
    assert comp[1] == comp[2] == 1
    assert comp[3] == 3 and comp[4] == 4
