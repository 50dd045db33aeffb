"""Fused kernel pass ≡ separate passes: identical edge multisets.

The fusion is a physical optimization only (one shuffle-free mapInPandas vs
three cogrouped applyInPandas passes) — every (src, dst, kind, variable)
edge must match exactly.
"""

from collections import Counter

import pytest

from joern_spark.corpus import fixture_docs_df
from joern_spark.pipeline import run_pipeline

KERNEL_KINDS = {"CFG", "DOMINATE", "POST_DOMINATE", "CDG", "REACHING_DEF"}


@pytest.fixture(scope="module")
def both(spark):
    docs = fixture_docs_df(spark)
    fused = run_pipeline(spark, docs, n_parts=4, fuse_kernels=True)
    plain = run_pipeline(spark, docs, n_parts=4, fuse_kernels=False)
    return fused, plain


def _kernel_edges(res):
    rows = res.edges.collect()
    return Counter(
        (r["src"], r["dst"], r["kind"], r["variable"])
        for r in rows if r["kind"] in KERNEL_KINDS
    )


def test_fused_equals_separate(both):
    fused, plain = both
    fe, pe = _kernel_edges(fused), _kernel_edges(plain)
    missing = pe - fe
    extra = fe - pe
    assert not missing, f"fused missing {len(missing)}: {list(missing)[:5]}"
    assert not extra, f"fused extra {len(extra)}: {list(extra)[:5]}"


def test_fused_triples_equal(both):
    fused, plain = both
    f = Counter(tuple(r) for r in fused.triples.select("subj", "pred", "obj").collect())
    p = Counter(tuple(r) for r in plain.triples.select("subj", "pred", "obj").collect())
    assert f == p
