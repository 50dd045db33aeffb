"""Per-partition lineage rows and resumable stage manifests.

The reference records layer completion in ``META_DATA.OVERLAYS``
(``semanticcpg/.../Overlays.scala:65-103``) and re-applies layers
idempotently; at cluster scale we instead persist, per materialized stage:
- a ``lineage`` table row per (part_id, stage): row count, checksum, duration,
- a JSON manifest listing completed part_ids (the checkpoint watermark).

Resume = anti-join incoming partitions against the manifest: only missing
part ranges are recomputed (north rule: "resumable from checkpoint with
per-partition lineage + metrics"). With Iceberg available these manifests
become snapshot metadata; plain parquet + JSON keeps the same contract in the
sandbox.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{stage}.json")


def read_manifest(out_dir: str, stage: str) -> dict | None:
    p = manifest_path(out_dir, stage)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def write_manifest(out_dir: str, stage: str, part_ids: list[int],
                   complete: bool, extra: dict | None = None) -> None:
    p = manifest_path(out_dir, stage)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    prev = read_manifest(out_dir, stage) or {"part_ids": []}
    merged = sorted(set(prev.get("part_ids", [])) | set(int(x) for x in part_ids))
    doc = {"stage": stage, "part_ids": merged, "complete": complete}
    doc.update(extra or {})
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, p)


def lineage_rows(df: DataFrame, stage: str, duration_ms: int,
                 part_col: str = "part_id") -> DataFrame:
    """One lineage row per partition: counts + order-insensitive checksum."""
    return (
        df.groupBy(F.col(part_col).alias("part_id"))
        .agg(
            F.count("*").alias("rows_out"),
            # order-insensitive sum of row hashes; decimal(38) accumulator —
            # a long sum overflows under ANSI mode
            F.sum(
                F.xxhash64(*[c for c in df.columns if c != part_col])
                .cast("decimal(38,0)")
            ).cast("string").alias("checksum"),
        )
        .select(
            "part_id", F.lit(stage).alias("stage"),
            F.lit(None).cast("long").alias("rows_in"),
            "rows_out", "checksum",
            F.lit(duration_ms).alias("duration_ms"),
            F.lit("ok").alias("status"),
        )
    )


def append_lineage(spark: SparkSession, out_dir: str, df: DataFrame,
                   stage: str, started: float) -> None:
    duration_ms = int((time.time() - started) * 1000)
    rows = lineage_rows(df, stage, duration_ms)
    rows.write.mode("append").parquet(os.path.join(out_dir, "lineage"))
