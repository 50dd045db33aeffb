"""Checkpoint/resume + lineage tests (north rule: resumable from checkpoint
with per-partition lineage + metrics).
"""

import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

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


def test_snapshot_commit_survives_torn_write(spark, out_dir):
    """Iceberg-style commit protocol: a writer killed mid-snapshot leaves an
    unreferenced snap dir that readers never observe (the manifest pointer
    only flips after a complete write)."""
    import json
    import os

    from joern_spark.corpus import fixture_docs_df
    from joern_spark.lineage import read_manifest, read_snapshot

    docs = fixture_docs_df(spark)
    run_pipeline(spark, docs, out_dir=out_dir, n_parts=4)
    m = read_manifest(out_dir, "triples")
    assert m["complete"] and os.path.isdir(m["data_dir"])
    n_committed = read_snapshot(spark, out_dir, "triples").count()
    committed_dir = m["data_dir"]

    # simulate a kill mid-write: a torn, never-flipped snapshot directory
    torn = os.path.join(out_dir, "triples_data", "snap-99999")
    os.makedirs(torn, exist_ok=True)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00torn write, not parquet")
    # ...and a torn ast batch dir never referenced by the ast manifest
    torn_ast = os.path.join(out_dir, "ast_rows", "batch-77777")
    os.makedirs(torn_ast, exist_ok=True)
    with open(os.path.join(torn_ast, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00also torn")

    # readers resolve the pointer, not the directory listing: intact
    assert read_snapshot(spark, out_dir, "triples").count() == n_committed

    # a resumed run ignores both torn dirs (ast via manifest data_dirs,
    # triples by committing a FRESH snapshot) and reproduces the same rows
    res = run_pipeline(spark, docs, out_dir=out_dir, n_parts=4)
    assert res.triples.count() == n_committed
    m2 = read_manifest(out_dir, "triples")
    assert m2["snapshot"] == m["snapshot"] + 1
    assert m2["data_dir"] != committed_dir
    ast_m = read_manifest(out_dir, "ast")
    assert torn_ast not in ast_m["data_dirs"]


def test_snapshot_time_travel(spark, tmp_path):
    """VERSION/TIMESTAMP AS OF over the snapshot log: every commit appends
    an (id, ts_ms) entry; any retained snapshot is readable by id or by
    timestamp, and an expired one fails loudly (Iceberg time-travel
    semantics over the manifest-pointer proxy)."""
    import pytest as _pytest

    from joern_spark.lineage import (commit_snapshot, read_snapshot,
                                     snapshot_history)

    d = str(tmp_path / "tt")
    for version in (1, 2, 3):
        df = spark.range(version * 10).select(
            F.col("id"), F.lit(version).alias("v"))
        commit_snapshot(spark, df, d, "tbl", part_ids=[0],
                        keep_snapshots=2)

    log = snapshot_history(d, "tbl")
    assert [s["id"] for s in log] == [1, 2, 3]
    assert log[0]["ts_ms"] <= log[1]["ts_ms"] <= log[2]["ts_ms"]

    # default read = current snapshot
    cur = read_snapshot(spark, d, "tbl")
    assert cur.count() == 30 and cur.agg(F.max("v")).first()[0] == 3
    # VERSION AS OF a retained older snapshot
    v2 = read_snapshot(spark, d, "tbl", snapshot_id=2)
    assert v2.count() == 20 and v2.agg(F.max("v")).first()[0] == 2
    # TIMESTAMP AS OF: the snapshot current at snap-2's commit time
    t2 = read_snapshot(spark, d, "tbl", as_of_ms=log[1]["ts_ms"])
    assert t2.agg(F.max("v")).first()[0] == 2
    # before the first commit there was nothing
    assert read_snapshot(spark, d, "tbl",
                         as_of_ms=log[0]["ts_ms"] - 1) is None
    # snap-1's data was retired by keep_snapshots=2: loud failure, and the
    # log still records it (metadata outlives data, as in Iceberg)
    with _pytest.raises(ValueError, match="expired"):
        read_snapshot(spark, d, "tbl", snapshot_id=1)
    with _pytest.raises(ValueError, match="no snapshot 9"):
        read_snapshot(spark, d, "tbl", snapshot_id=9)
