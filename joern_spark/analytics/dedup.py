"""Deduplication operators over the ``documents`` table.

Scale notes (100 TB): every operator here is a shuffle-on-key aggregation or
an equi-join on a derived key — no cross joins, no driver collection.
- exact: one hash-aggregate on md5(text); partial (map-side) aggregation
  applies, so the shuffle carries one row per distinct hash per partition.
- minhash/LSH: shingling explodes ~n_tokens rows per doc but reduces back to
  one signature row per doc before the band join; the band join key
  (band hash) is uniformly distributed by construction, so no skew.
- n-gram Jaccard: the shingle inverted index is the classic join-on-shingle
  plan; hot shingles (stopword trigrams) are the skew risk — mitigated by
  dropping shingles with document frequency > DF_CAP (standard
  stopword-shingle pruning), which also bounds the pair-candidate blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_HASHES = 4
DF_CAP = 50  # drop shingles appearing in more docs than this (skew + noise)
JACCARD_T = 0.1


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content hash; keeper = min doc_id."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
    )


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingles per doc (lowercased, whitespace-split)."""
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "w"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    return (
        tok.withColumn("w1", F.lead("w", 1).over(win))
        .withColumn("w2", F.lead("w", 2).over(win))
        .filter(F.col("w2").isNotNull())
        .select(
            "doc_id",
            F.concat(F.col("w"), F.lit(" "), F.col("w1"), F.lit(" "), F.col("w2")).alias("shingle"),
        )
        .distinct()
    )


_SHINGLES_SQL = """
    SELECT DISTINCT doc_id, w || ' ' || w1 || ' ' || w2 AS shingle FROM (
        SELECT doc_id, w,
               lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
               lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM (
            SELECT doc_id, pos, words[pos] AS w FROM (
                SELECT doc_id, unnest(generate_series(1, len(words))) AS pos, words
                FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words FROM documents)
            )
        )
    ) WHERE w2 IS NOT NULL
"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature per doc: min over shingles of md5(seed|shingle).

    md5 plays the role of the seeded hash family — identical and portable
    on both engines (signature values are hex strings; min is string-min).
    """
    sh = _shingles(spark, sf_dir)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("shingle")))).alias(f"h{j}")
        for j in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any MinHash band (band = 1 row).

    Self-equi-join on the band value — uniformly distributed hash keys, so
    the join is skew-free by construction.
    """
    mh = minhash_signatures(spark, sf_dir)
    bands = None
    for j in range(N_HASHES):
        b = mh.select("doc_id", F.col(f"h{j}").alias("band"), F.lit(j).alias("band_id"))
        bands = b if bands is None else bands.unionByName(b)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard >= 0.1 via shingle inverted index.

    DF-capped shingles bound the candidate blowup and remove hot keys.
    Jaccard |A∩B| / (|A| + |B| - |A∩B|) is emitted as integer micro units
    (round(j*1e6) as long) — IEEE-identical division/round on both engines —
    and the threshold filter is the exact integer form 10*|A∩B| >= denom.
    """
    sh = _shingles(spark, sf_dir)
    df_ok = sh.groupBy("shingle").agg(F.count("*").alias("df")).filter(F.col("df") <= DF_CAP)
    sh = sh.join(F.broadcast(df_ok.select("shingle")), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    denom = F.col("sz_a") + F.col("sz_b") - F.col("n_inter")
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.col("n_inter") * F.lit(int(round(1 / JACCARD_T))) >= denom)
        .select(
            "doc_a", "doc_b", "n_inter",
            F.round(F.col("n_inter").cast("double") * F.lit(1000000.0)
                    / denom.cast("double")).cast("long").alias("jaccard_micro"),
        )
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: large-star/small-star connected components over the
    LSH candidate pairs; cluster id = min doc_id; singletons own cluster."""
    from ..operators.canonicalize import connected_components, with_singletons

    pairs = lsh_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    comp = connected_components(pairs)
    docs = _docs(spark, sf_dir).select("doc_id")
    return with_singletons(comp, docs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


N_SIMHASH_BITS = 16
_HEX = "0123456789abcdef"


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash over word unigrams: bit j = sign of Σ_w count(w)·(±1 by
    md5(w) bit j). One token aggregation, 16 conditional sums — a single
    map+combine groupBy at any scale. Hash-bit extraction uses the md5 hex
    string so the DuckDB oracle computes the identical family.
    """
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).groupBy("doc_id", "w").agg(F.count("*").alias("cnt"))
    h = F.md5(F.col("w"))
    bit_cols = []
    for j in range(N_SIMHASH_BITS):
        nib = F.instr(F.lit(_HEX), F.substring(h, j // 4 + 1, 1)) - 1
        bit = F.shiftright(nib, j % 4).bitwiseAND(F.lit(1))
        bit_cols.append(
            F.sum(F.when(bit == 1, F.col("cnt")).otherwise(-F.col("cnt"))).alias(f"s{j}")
        )
    sums = tok.groupBy("doc_id").agg(*bit_cols)
    sig = None
    for j in range(N_SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return sums.select("doc_id", sig.cast("long").alias("simhash"))


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_signatures": minhash_signatures,
    "dedup_lsh_pairs": lsh_pairs,
    "dedup_ngram_jaccard": ngram_jaccard_pairs,
    "dedup_clusters": dedup_clusters,
    "dedup_simhash": simhash,
}

_SIMHASH_BIT_SQL = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(N_SIMHASH_BITS)
)
_SIMHASH_SUM_SQL = ", ".join(
    f"sum(CASE WHEN ((strpos('{_HEX}', substr(md5(w), {j // 4 + 1}, 1)) - 1) >> {j % 4}) & 1 = 1"
    f" THEN cnt ELSE -cnt END) AS s{j}"
    for j in range(N_SIMHASH_BITS)
)

_MINHASH_SQL = f"""
    SELECT doc_id,
           {', '.join(f"min(md5('{j}|' || shingle)) AS h{j}" for j in range(N_HASHES))}
    FROM ({_SHINGLES_SQL}) GROUP BY doc_id
"""

ORACLES = {
    "dedup_simhash": f"""
        WITH tok AS (
            SELECT doc_id, w, count(*)::BIGINT AS cnt FROM (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
                FROM documents
            ) GROUP BY doc_id, w
        ),
        sums AS (SELECT doc_id, {_SIMHASH_SUM_SQL} FROM tok GROUP BY doc_id)
        SELECT doc_id, ({_SIMHASH_BIT_SQL})::BIGINT AS simhash FROM sums
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash,
               count(*)::BIGINT AS n_docs,
               min(doc_id) AS keep_id
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash_signatures": _MINHASH_SQL,
    "dedup_lsh_pairs": f"""
        WITH mh AS ({_MINHASH_SQL}),
        bands AS (
            {' UNION ALL '.join(f"SELECT doc_id, h{j} AS band, {j} AS band_id FROM mh" for j in range(N_HASHES))}
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE mh AS ({_MINHASH_SQL}),
        bands AS (
            {' UNION ALL '.join(f"SELECT doc_id, h{j} AS band, {j} AS band_id FROM mh" for j in range(N_HASHES))}
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
        ),
        und AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach AS (
            SELECT a, b FROM und
            UNION SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a WHERE u.b != r.a
        )
        SELECT d.doc_id,
               coalesce(least(min(r.b), d.doc_id), d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
        GROUP BY d.doc_id
    """,
    "dedup_ngram_jaccard": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {DF_CAP}),
        shf AS (SELECT sh.* FROM sh JOIN ok USING (shingle)),
        sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM shf GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_inter
            FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b, n_inter,
               CAST(round(n_inter::DOUBLE * 1000000.0 / (sa.sz + sb.sz - n_inter)::DOUBLE) AS BIGINT) AS jaccard_micro
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter * {int(round(1 / JACCARD_T))} >= sa.sz + sb.sz - n_inter
    """,
}
