"""Checkpoint/resume + lineage tests (north rule: resumable from checkpoint
with per-partition lineage + metrics).
"""

import shutil

import duckdb
import pytest

from joern_spark.corpus import fixture_docs_df
from joern_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cpg_out")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_materialize_resume_and_lineage(spark, out_dir):
    docs = fixture_docs_df(spark)
    res1 = run_pipeline(spark, docs, out_dir=out_dir, n_parts=4)
    n1 = res1.triples.count()
    assert res1.stats.get("ast_resumed_parts", 0) == 0

    # second run over the same out_dir must resume every recorded partition
    # (empty hash partitions never enter the manifest)
    import json
    with open(f"{out_dir}/_manifests/ast.json") as f:
        recorded = len(json.load(f)["part_ids"])
    res2 = run_pipeline(spark, docs, out_dir=out_dir, n_parts=4)
    n2 = res2.triples.count()
    assert res2.stats.get("ast_resumed_parts") == recorded > 0
    assert n1 == n2

    # per-partition lineage rows with checksums exist for every stage
    rows = duckdb.sql(
        f"select stage, count(*) n, count(distinct checksum) c "
        f"from read_parquet('{out_dir}/lineage/*.parquet') group by stage"
    ).fetchall()
    stages = {r[0] for r in rows}
    assert {"ast", "base_nodes", "triples"} <= stages
    assert "edges" in stages or "edges_pre_ddg" in stages
    assert all(r[1] > 0 for r in rows)


def test_resumed_output_identical(spark, out_dir):
    """Triples from the resumed run match a fresh in-memory run exactly
    (deterministic ids: any partition recomputes to the same bytes)."""
    docs = fixture_docs_df(spark)
    mem = run_pipeline(spark, docs, n_parts=4)
    mem_triples = {tuple(r) for r in mem.triples.select("subj", "pred", "obj").collect()}
    mat = run_pipeline(spark, docs, out_dir=out_dir, n_parts=4)
    mat_triples = {tuple(r) for r in mat.triples.select("subj", "pred", "obj").collect()}
    assert mem_triples == mat_triples
