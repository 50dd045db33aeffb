"""Feature-hashed sparse vectors from the CPG (SURVEY.md §2.D).

Reference: ``joern-cli/.../JoernVectors.scala:16-60`` — bag-of-nodes /
bag-of-API-symbols embeddings. Spark-first: a HashingTF-style bucketing with
``xxhash64 % dim`` over JVM built-ins — one groupBy, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM_DEFAULT = 1024


def bag_of_nodes(nodes: DataFrame, dim: int = DIM_DEFAULT) -> DataFrame:
    """Per document: sparse (indices, values) counts of node kinds hashed
    into ``dim`` buckets."""
    return _hash_bag(nodes.select("doc_id", F.col("kind").alias("feature")), dim)


def bag_of_api_symbols(nodes: DataFrame, dim: int = DIM_DEFAULT) -> DataFrame:
    """Per document: hashed counts of called symbol names (API surface)."""
    calls = nodes.filter(
        (F.col("kind") == "CALL") & ~F.col("name").startswith("<operator>")
    )
    return _hash_bag(calls.select("doc_id", F.col("name").alias("feature")), dim)


def bag_of_api_symbols_long(nodes: DataFrame, dim: int = DIM_DEFAULT) -> DataFrame:
    """Exploded form: one (doc_id, bucket, cnt) row per non-empty bucket —
    scalar columns only (the driver's canonicalizer can hash them), same
    information as the array form. Bucket hash is md5-derived so a DuckDB
    oracle computes the identical bucketing."""
    calls = nodes.filter(
        (F.col("kind") == "CALL") & ~F.col("name").startswith("<operator>")
    )
    return _bucket_counts(calls.select("doc_id", F.col("name").alias("feature")), dim)


def _bucket_counts(feats: DataFrame, dim: int) -> DataFrame:
    # md5-hex → int bucket: portable to DuckDB ('0x'||substr(md5(f),1,8))
    h = F.conv(F.substring(F.md5("feature"), 1, 8), 16, 10).cast("long")
    bucketed = feats.withColumn("bucket", F.pmod(h, F.lit(dim)).cast("int"))
    return (
        bucketed.groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _hash_bag(feats: DataFrame, dim: int) -> DataFrame:
    counts = _bucket_counts(feats, dim)
    return (
        counts.withColumn("pair", F.struct("bucket", "cnt"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pair")).alias("pairs"))
        .select(
            "doc_id",
            F.col("pairs.bucket").alias("indices"),
            F.col("pairs.cnt").alias("values"),
        )
    )
