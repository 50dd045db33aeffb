"""Determinism under re-execution and repartitioning (SURVEY.md §7.4 risk 4:
ids are content hashes — any partition recomputes to identical bytes, the
foundation of checkpoint/resume)."""

from joern_spark.corpus import fixture_docs_df
from joern_spark.pipeline import run_pipeline


def _triples(res):
    return sorted(tuple(r) for r in res.triples.select("subj", "pred", "obj").collect())


def test_identical_across_partition_counts(spark):
    docs = fixture_docs_df(spark)
    a = _triples(run_pipeline(spark, docs, n_parts=2))
    b = _triples(run_pipeline(spark, docs, n_parts=7))
    assert a == b


def test_identical_across_runs(spark):
    docs = fixture_docs_df(spark)
    a = _triples(run_pipeline(spark, docs, n_parts=4))
    b = _triples(run_pipeline(spark, docs, n_parts=4))
    assert a == b


def test_doc_subset_is_sub_multiset(spark):
    """Per-document independence: a subset corpus produces exactly the
    subset's triples (no cross-doc id interference except global stubs)."""
    from joern_spark.corpus import docs_df, fixture_docs

    all_docs = fixture_docs()
    full = run_pipeline(spark, docs_df(spark, all_docs), n_parts=4)
    part = run_pipeline(spark, docs_df(spark, all_docs[:2]), n_parts=2)
    doc_ids = {d["doc_id"] for d in all_docs[:2]}
    full_sub = sorted(
        tuple(r) for r in full.triples.filter(full.triples["doc_id"].isin(list(doc_ids)))
        .select("subj", "pred", "obj").collect()
    )
    part_sub = sorted(
        tuple(r) for r in part.triples.filter(part.triples["doc_id"].isin(list(doc_ids)))
        .select("subj", "pred", "obj").collect()
    )
    assert part_sub == full_sub
