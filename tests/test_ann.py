"""ANN variant tests: IVF coarse-quantizer path vs the exact baseline.

Parity with DuckDB is covered by the oracle gate (tools/check_oracles.py);
these tests pin the *approximation* properties: shape, determinism of the
coarse assignment, and recall ordering on the fixed synthetic embeddings.
"""

import pytest

from joern_spark.analytics.ann import (
    N_QUERIES,
    TOP_K,
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def results(spark):
    bf = ann_bruteforce_topk(spark, SF).collect()
    ivf = ann_ivf_topk(spark, SF).collect()
    lsh = ann_lsh_topk(spark, SF).collect()
    return bf, ivf, lsh


def test_ivf_shape(results):
    _, ivf, _ = results
    assert len(ivf) == N_QUERIES * TOP_K
    by_q = {}
    for r in ivf:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert set(by_q) == set(range(N_QUERIES))
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, TOP_K + 1))


def test_ivf_never_beats_exact(results):
    bf, ivf, _ = results
    best_exact = {r.query_id: r.cos_bp for r in bf if r.rank == 1}
    for r in ivf:
        if r.rank == 1:
            assert r.cos_bp <= best_exact[r.query_id]


def test_ivf_recall_on_fixed_corpus(results):
    bf, ivf, lsh = results
    exact = {(r.query_id, r.neighbor_id) for r in bf}
    r_ivf = len(exact & {(r.query_id, r.neighbor_id) for r in ivf}) / len(exact)
    r_lsh = len(exact & {(r.query_id, r.neighbor_id) for r in lsh}) / len(exact)
    # deterministic corpus → stable figures (0.65 / 0.325 at sf0.01). The
    # round-5 scale redesign IMPROVED both: fixed-K hash-rank centroids
    # lifted IVF 0.625 → 0.65 (16 balanced-ish lists vs the residue rule's
    # 17 unbalanced ones), and the banded 16-plane space lifted LSH
    # 0.15 → 0.325 (4-band multi-probe OR vs one 4-bit bucket) while making
    # the bucket space growable with the table.
    assert r_ivf >= 0.625
    assert r_lsh >= 0.3
    assert r_ivf >= r_lsh
