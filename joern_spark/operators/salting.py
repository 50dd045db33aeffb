"""Skew-aware equi-join: salted replication for hot build-side keys.

The call-linking join (StaticCallLinker, SURVEY.md §2.A #22) is skewed by
construction — ``printf``/``malloc``-style callee names appear in a huge
fraction of documents. Three strategies, chosen by dimension size:

1. broadcast (default): dim fits in the broadcast threshold → map-side join,
   the skewed fact side never shuffles. Used by the pipeline.
2. salted: dim too big to broadcast → shuffle join would put every ``printf``
   fact row in one reducer. Replicate the dim rows for hot keys across
   ``n_salts`` salts and scatter fact rows with a deterministic salt; hot
   reducers split n_salts ways. Hot keys are either supplied (known-hot
   dictionary, the north rule's case) or detected with a count aggregation.
3. AQE skew-join (session conf) as the runtime backstop.

Salts are deterministic (hash of the fact row id) — retries reproduce the
same placement, keeping checkpoint/resume byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS_DEFAULT = 16


def detect_hot_keys(facts: DataFrame, key: str, threshold_ratio: float = 0.01,
                    min_count: int = 1000) -> DataFrame:
    """Keys carrying more than max(ratio·rows, min_count) fact rows."""
    total = facts.count()
    threshold = max(int(total * threshold_ratio), min_count)
    return (
        facts.groupBy(key).agg(F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") >= threshold)
        .select(key)
    )


def salted_join(facts: DataFrame, dim: DataFrame, key: str,
                fact_salt_from: str, hot_keys: DataFrame | None = None,
                n_salts: int = N_SALTS_DEFAULT, how: str = "inner") -> DataFrame:
    """facts ⋈ dim on ``key`` with hot-key salting.

    ``fact_salt_from``: a fact column whose hash scatters hot rows (a unique
    id — deterministic under retry). Non-hot keys join with salt 0 (no
    replication cost). Result columns = facts ∪ dim (minus the join key dup).
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(facts, key)
    hot = F.broadcast(hot_keys.select(F.col(key)).distinct()
                      .withColumn("_hot", F.lit(True)))

    facts_s = (
        facts.join(hot, key, "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(),
                   F.pmod(F.xxhash64(F.col(fact_salt_from)), F.lit(n_salts)))
            .otherwise(F.lit(0)).cast("int"),
        )
        .drop("_hot")
    )
    dim_s = (
        dim.join(hot, key, "left")
        .withColumn(
            "_salts",
            F.when(F.col("_hot").isNotNull(),
                   F.sequence(F.lit(0), F.lit(n_salts - 1)))
            .otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts", "_hot")
    )
    # the salted path is only taken when the dim is over the broadcast
    # budget; pin the shuffle join so Catalyst's (possibly stale or absent)
    # size stats can't flip it back to a broadcast that would OOM at scale
    return facts_s.join(dim_s.hint("shuffle_hash"), [key, "_salt"], how) \
        .drop("_salt")
