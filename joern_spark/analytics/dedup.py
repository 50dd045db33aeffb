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

# MinHash realism (SURVEY §4 / round-2 verdict): 64 signatures banded as
# 16 bands × 4 rows. One md5 per shingle seeds a universal hash family
# h_j(x) = (a_j·x + b_j) mod P — 64 integer ops instead of 64 md5 calls,
# expressible identically in DuckDB SQL.
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS
MINHASH_P = 2147483647  # 2^31 - 1 (prime)
JACCARD_VERIFY_T = 0.5  # candidate pairs below this true Jaccard never cluster
DF_CAP = 50  # drop shingles appearing in more docs than this (skew + noise)
JACCARD_T = 0.1


def _ab(j: int) -> tuple[int, int]:
    """Deterministic universal-hash coefficients for signature j."""
    return ((j * 2654435761 + 1) % MINHASH_P, (j * 40503 + 7) % MINHASH_P)


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
    """Distinct 3-word shingles per doc (lowercased, whitespace-split).

    Array-transform formulation — no window sort: the token array stays
    row-local, so shingling costs one map pass instead of a per-doc sort.
    """
    d = _docs(spark, sf_dir)
    return (
        d.select(
            "doc_id",
            F.split(F.lower("text"), r"\s+").alias("words"),
        )
        .select(
            "doc_id",
            F.explode(F.expr(
                "CASE WHEN size(words) >= 3 THEN "
                "transform(sequence(0, size(words) - 3), "
                "i -> concat_ws(' ', words[i], words[i+1], words[i+2])) "
                "ELSE array() END"
            )).alias("shingle"),
        )
        .distinct()
    )


_SHINGLES_SQL = """
    SELECT DISTINCT doc_id,
           words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
    FROM (
        SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
        FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS words
              FROM documents)
    )
"""

# shingle → 60-bit integer seed (first 15 md5 hex chars), reduced mod P
_M1_SPARK = (
    "pmod(cast(conv(substring(md5(shingle), 1, 15), 16, 10) as bigint), "
    f"{MINHASH_P})"
)
_M1_SQL = f"(('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P})"


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-signature MinHash per doc: min over shingles of the universal
    family h_j(m) = (a_j·m + b_j) mod P seeded by one md5 per shingle.

    One shuffle (groupBy doc_id) with map-side partial mins; products stay
    under 2^62 so the arithmetic is exact long math on both engines.
    """
    sh = _shingles(spark, sf_dir).withColumn("m1", F.expr(_M1_SPARK))
    aggs = []
    for j in range(N_HASHES):
        a, b = _ab(j)
        aggs.append(
            F.min((F.col("m1") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P))
            .alias(f"h{j}")
        )
    return sh.groupBy("doc_id").agg(*aggs)


def _band_cols(mh: DataFrame) -> DataFrame:
    """(doc_id, band_id, band) — band value = joined row signatures."""
    bands = F.array(*[
        F.concat_ws("|", *[
            F.col(f"h{b * ROWS_PER_BAND + r}").cast("string")
            for r in range(ROWS_PER_BAND)
        ])
        for b in range(N_BANDS)
    ])
    return mh.select(
        "doc_id", F.posexplode(bands).alias("band_id", "band")
    )


def lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any 4-row MinHash band.

    Self-equi-join on (band_id, band value) — uniformly distributed hash
    keys, so the join is skew-free by construction; 16 bands × 4 rows gives
    the classic S-curve (J=0.5 → ~0.64 candidate probability, J=0.9 → ~1).
    """
    bands = _band_cols(minhash_signatures(spark, sf_dir))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def verified_pairs(sh: DataFrame, pairs: DataFrame,
                   threshold: float = JACCARD_VERIFY_T) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs (LSH false-positive
    filter): compute |A∩B| only for candidates — a join on (pair, shingle),
    never all-pairs — and keep pairs with J >= threshold. Guards the
    cluster pass: one colliding band can no longer merge two clusters."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("sz"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    num = int(round(1 / threshold))
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b")), "doc_b")
        .filter(
            F.coalesce(F.col("n_inter"), F.lit(0)) * F.lit(num)
            >= F.col("sz_a") + F.col("sz_b") - F.coalesce(F.col("n_inter"), F.lit(0))
        )
        .select("doc_a", "doc_b")
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
    """Near-dup clusters: LSH candidates → exact-Jaccard verification →
    large-star/small-star connected components; cluster id = min doc_id;
    singletons own cluster. The verification join between banding and
    clustering keeps LSH false positives from merging clusters."""
    from ..operators.canonicalize import connected_components, with_singletons

    cand = lsh_pairs(spark, sf_dir)
    pairs = verified_pairs(_shingles(spark, sf_dir), cand).select(
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
           {', '.join(f"min((m1 * {_ab(j)[0]} + {_ab(j)[1]}) % {MINHASH_P}) AS h{j}" for j in range(N_HASHES))}
    FROM (SELECT doc_id, {_M1_SQL} AS m1 FROM ({_SHINGLES_SQL}))
    GROUP BY doc_id
"""

_BANDS_SQL = " UNION ALL ".join(
    "SELECT doc_id, "
    + " || '|' || ".join(
        f"CAST(h{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
    )
    + f" AS band, {b} AS band_id FROM mh"
    for b in range(N_BANDS)
)

_VERIFIED_PAIRS_SQL = f"""
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
        ),
        sh AS ({_SHINGLES_SQL}),
        sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY doc_id),
        vinter AS (
            SELECT c.doc_a, c.doc_b, count(*)::BIGINT AS n_inter
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
            GROUP BY c.doc_a, c.doc_b
        ),
        pairs AS (
            SELECT c.doc_a, c.doc_b
            FROM cand c
            LEFT JOIN vinter v ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b
            JOIN sizes sa ON sa.doc_id = c.doc_a
            JOIN sizes sb ON sb.doc_id = c.doc_b
            WHERE coalesce(v.n_inter, 0) * {int(round(1 / JACCARD_VERIFY_T))}
                  >= sa.sz + sb.sz - coalesce(v.n_inter, 0)
        )
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
        bands AS ({_BANDS_SQL})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_id = b.band_id AND a.doc_id < b.doc_id
    """,
    "dedup_clusters": f"""
        WITH RECURSIVE mh AS ({_MINHASH_SQL}),
        bands AS ({_BANDS_SQL}),
        {_VERIFIED_PAIRS_SQL},
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
