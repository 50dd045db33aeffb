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


def _hash_bag(feats: DataFrame, dim: int) -> DataFrame:
    bucketed = feats.withColumn(
        "bucket", F.pmod(F.xxhash64("feature"), F.lit(dim)).cast("int")
    )
    counts = bucketed.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
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
