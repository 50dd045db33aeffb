"""Similarity search over the ``embeddings`` table.

- ``ann_bruteforce_topk``: exact cosine top-k for a query set — the
  correctness baseline. Query side is tiny → broadcast; the scan side streams
  (at 100 TB this is the classic broadcast-nested-loop scoring pass, one
  map stage, no shuffle except the per-query top-k aggregation).
- ``ann_lsh_topk`` / ``embedding_neardup_pairs``: the scale path — a
  **banded** random-hyperplane (SimHash) space: ``N_PLANES`` sign bits split
  into ``N_BANDS`` bands of ``BAND_BITS`` bits each, candidates = vectors
  sharing ANY band hash (multi-band OR, exactly how ``dedup.py`` bands
  MinHash 16x4). Recall is recovered by the band OR while each band's
  bucket count (2^BAND_BITS per band, N_BANDS * 2^BAND_BITS keys total)
  keeps the within-bucket join sub-quadratic. At larger corpora raise
  ``N_PLANES`` (~log2 n * N_BANDS) — bucket cardinality then grows with the
  table, which the 4-plane/16-bucket round-4 design did not.
- ``ann_ivf_topk``: inverted-file search with a **fixed-K** coarse
  quantizer: centroids are the ``IVF_K`` rows with the smallest
  ``md5(vec_id)`` — a deterministic hash-rank sample (no RNG), computed as
  an order-by-limit (Spark plans ``TakeOrderedAndProject``: constant-size
  result no matter the table size, so the broadcast NEVER grows with the
  corpus — fixing round 4's residue-rule n/29 centroid set whose coarse
  assignment was O(n^2/29)). Assignment is one O(n*K) map stage; the probe
  join is an equi-join on cluster id. At 100 TB raise IVF_K toward ~sqrt(n)
  and this stays a broadcast of K rows.

Planes are deterministic (no RNG at runtime): plane j weight for dim i =
sign pattern from a fixed hash formula, identical in the SQL oracle.

Dot products run in identical left-to-right fold order on both engines
(double precision), so cosine values are bit-identical and rank ties don't
flip. Similarity outputs are integer basis points (``cos_bp`` =
round(cos*10000) as long) so the driver's value hash sees no
decimal-rendering ambiguity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_QUERIES = 8
TOP_K = 5
DIM = 64

# Banded SimHash space: 16 planes = 4 bands x 4 bits. 2^4 buckets per band,
# 4-band OR for recall (p_collide = 1 - (1 - p_bit^4)^4).
N_PLANES = 16
N_BANDS = 4
BAND_BITS = N_PLANES // N_BANDS


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for vec_id < N_QUERIES (broadcast query side)."""
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    sim = pairs.withColumn("cos", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("cos") * F.lit(10000.0)).cast("long").alias("cos_bp"),
        )
    )


# deterministic pseudo-random hyperplanes: sign(ij-hash) per (plane, dim).
# Formula chosen to be expressible identically in Spark and DuckDB SQL:
# weight(j, i) = +1 if ((i*31 + j*17) % 7) % 2 == 0 else -1
def _plane_weight(j: int, i: int) -> int:
    return 1 if ((i * 31 + j * 17) % 7) % 2 == 0 else -1


def _proj_expr(vcol, j: int):
    return F.aggregate(
        F.zip_with(
            vcol,
            F.array(*[F.lit(float(_plane_weight(j, i))) for i in range(DIM)]),
            lambda x, w: x * w,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _band_hash_expr(vcol, band: int):
    """Band hash = bit pattern of sign(v . plane_j) over the band's planes."""
    h = F.lit(0)
    for b in range(BAND_BITS):
        j = band * BAND_BITS + b
        h = h + F.when(_proj_expr(vcol, j) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
    return h


def _with_bands(df: DataFrame, vcol: str = "v") -> DataFrame:
    """Explode each vector to one row per band: (.., band, bh)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                _band_hash_expr(F.col(vcol), band).alias("bh"),
            )
            for band in range(N_BANDS)
        ]
    )
    return df.withColumn("bb", F.explode(bands)).select(
        *df.columns, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-SimHash cosine top-k: candidates share ANY band with the query.

    Multi-band OR = the multi-probe knob; candidate duplicates (a pair
    colliding in several bands) are collapsed by a distinct on the pair key
    before scoring, so each candidate is scored once.
    """
    eb = _with_bands(_emb(spark, sf_dir))
    q = eb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("band").alias("qband"),
        F.col("bh").alias("qbh"),
    )
    cand = (
        eb.join(
            F.broadcast(q),
            (F.col("band") == F.col("qband"))
            & (F.col("bh") == F.col("qbh"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", "v", "qv")
        .distinct()
    )
    sim = cand.withColumn("cos", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv"))))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


# ---- IVF (inverted-file) ANN: fixed-K coarse quantizer + nprobe search ----
# Centroids = the IVF_K rows with the smallest md5(vec_id): a deterministic
# hash-rank sample (reproducibility over recall for the oracle twin; a
# k-means refinement would only move the centroid vectors, not the plan
# shape). |centroids| is a CONSTANT — the order-by-limit plans as
# TakeOrderedAndProject, so the broadcast stays K rows at any corpus size.
IVF_K = 16
# nprobe trades candidate-set size for recall — the same knob a real IVF
# deployment tunes. Hash-rank centroids are an unrefined sample, so lists
# are unbalanced; nprobe=6 of the 16 lists holds recall@5 at 0.675 at
# sf0.01 (tests/test_ann.py::test_ivf_recall_on_fixed_corpus). At scale the
# scanned fraction is nprobe/IVF_K of the table regardless of n; recall
# then depends on list quality (k-means would lift it), not on coverage.
N_PROBE = 6


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat cosine top-k: search the N_PROBE nearest coarse clusters."""
    e = _emb(spark, sf_dir)
    cent = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(IVF_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    scored = e.crossJoin(F.broadcast(cent)).withColumn(
        "cos_c",
        _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv"))),
    )
    # coarse assignment: argmax cosine, ties to the smallest centroid id
    # (min over the (-cos, cid) struct = one map-side partial aggregate)
    assign = (
        scored.groupBy("vec_id")
        .agg(
            F.min(F.struct((-F.col("cos_c")).alias("neg"), F.col("cid").alias("cid"))).alias("m"),
            F.first("v").alias("v"),
        )
        .select("vec_id", F.col("m.cid").alias("cid"), "v")
    )
    wq = Window.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid"))
    probes = (
        scored.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid")
    )
    cand = assign.join(F.broadcast(probes), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = cand.withColumn(
        "cos", _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("cos") * F.lit(10000.0)).cast("long").alias("cos_bp"),
        )
    )


def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label count + total L2 norm (exact decimal total)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x))
    return (
        e.select("label", F.round(norm * F.lit(1000000.0)).cast("long").alias("norm_u"))
        .groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.sum(F.col("norm_u").cast("decimal(38,0)")).cast("long").alias("total_norm_micro"),
        )
    )


NEARDUP_T = 0.35


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within banded SimHash buckets.

    The per-band bucket equi-join replaces the quadratic all-pairs scan —
    the scale path for embedding dedup. Pairs colliding in several bands
    are collapsed by a distinct on the pair key before the cosine filter,
    so each pair is scored once; recall is the multi-band OR.
    """
    eb = _with_bands(_emb(spark, sf_dir))
    a = eb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "band", "bh")
    b = eb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "band", "bh")
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "va", "vb")
        .distinct()
    )
    sim = pairs.withColumn(
        "cos", _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    )
    return sim.filter(F.col("cos") >= NEARDUP_T).select(
        "vec_a", "vec_b",
        F.round(F.col("cos") * F.lit(10000.0)).cast("long").alias("cos_bp"),
    )


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_embedding_stats": embedding_stats,
    "ann_neardup_pairs": embedding_neardup_pairs,
}


def _dot_sql(a: str, b: str) -> str:
    return f"list_sum(list_transform(generate_series(1, {DIM}), i -> {a}[i] * {b}[i]))"


def _plane_sql(vcol: str, j: int) -> str:
    terms = " + ".join(
        f"{vcol}[{i + 1}] * ({_plane_weight(j, i)})" for i in range(DIM)
    )
    return f"({terms})"


def _band_hash_sql(vcol: str, band: int) -> str:
    return " + ".join(
        f"(CASE WHEN {_plane_sql(vcol, band * BAND_BITS + b)} >= 0 THEN {1 << b} ELSE 0 END)"
        for b in range(BAND_BITS)
    )


# exploded banded view: one row per (vec_id, v, band, bh) — the SQL twin of
# _with_bands (a UNION ALL over the N_BANDS band hashes)
_EB_SQL = " UNION ALL ".join(
    f"SELECT vec_id, v, {band} AS band, {_band_hash_sql('v', band)} AS bh FROM e"
    for band in range(N_BANDS)
)

ORACLES = {
    "ann_neardup_pairs": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        eb AS ({_EB_SQL}),
        pairs AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.v AS va, b.v AS vb
            FROM eb a JOIN eb b ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b,
               CAST(round({_dot_sql('va', 'vb')} / (sqrt({_dot_sql('va', 'va')}) * sqrt({_dot_sql('vb', 'vb')})) * 10000.0) AS BIGINT) AS cos_bp
        FROM pairs
        WHERE {_dot_sql('va', 'vb')} / (sqrt({_dot_sql('va', 'va')}) * sqrt({_dot_sql('vb', 'vb')})) >= {NEARDUP_T}
    """,
    "ann_bruteforce_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
        sim AS (
            SELECT q.query_id, e.vec_id,
                   {_dot_sql('e.v', 'q.qv')} / (sqrt({_dot_sql('e.v', 'e.v')}) * sqrt({_dot_sql('q.qv', 'q.qv')})) AS cos
            FROM e, q WHERE e.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id AS neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
            FROM sim
        )
        SELECT query_id, neighbor_id, rank::BIGINT AS rank,
               CAST(round(cos * 10000.0) AS BIGINT) AS cos_bp
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "ann_lsh_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        eb AS ({_EB_SQL}),
        q AS (SELECT vec_id AS query_id, v AS qv, band AS qband, bh AS qbh
              FROM eb WHERE vec_id < {N_QUERIES}),
        cand AS (
            SELECT DISTINCT q.query_id, e.vec_id, e.v, q.qv
            FROM eb e JOIN q ON e.band = q.qband AND e.bh = q.qbh AND e.vec_id != q.query_id
        ),
        sim AS (
            SELECT query_id, vec_id,
                   {_dot_sql('v', 'qv')} / (sqrt({_dot_sql('v', 'v')}) * sqrt({_dot_sql('qv', 'qv')})) AS cos
            FROM cand
        ),
        ranked AS (
            SELECT query_id, vec_id AS neighbor_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
            FROM sim
        )
        SELECT query_id, neighbor_id, rank::BIGINT AS rank
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "ann_ivf_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT vec_id AS cid, v AS cv FROM e
                 ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {IVF_K}),
        scored AS (
            SELECT e.vec_id, e.v, cent.cid,
                   {_dot_sql('e.v', 'cent.cv')} / (sqrt({_dot_sql('e.v', 'e.v')}) * sqrt({_dot_sql('cent.cv', 'cent.cv')})) AS cos_c
            FROM e, cent
        ),
        assign AS (
            SELECT vec_id, v, cid FROM (
                SELECT vec_id, v, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) AS rn
                FROM scored) WHERE rn = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, v AS qv, cid FROM (
                SELECT vec_id, v, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY cos_c DESC, cid) AS rn
                FROM scored WHERE vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}
        ),
        sim AS (
            SELECT p.query_id, a.vec_id,
                   {_dot_sql('a.v', 'p.qv')} / (sqrt({_dot_sql('a.v', 'a.v')}) * sqrt({_dot_sql('p.qv', 'p.qv')})) AS cos
            FROM assign a JOIN probes p ON a.cid = p.cid AND a.vec_id != p.query_id
        ),
        ranked AS (
            SELECT query_id, vec_id AS neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
            FROM sim
        )
        SELECT query_id, neighbor_id, rank::BIGINT AS rank,
               CAST(round(cos * 10000.0) AS BIGINT) AS cos_bp
        FROM ranked WHERE rank <= {TOP_K}
    """,
    "ann_embedding_stats": f"""
        WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT label, CAST(round(sqrt({_dot_sql('v', 'v')}) * 1000000.0) AS BIGINT) AS norm_u FROM e)
        SELECT label, count(*)::BIGINT AS n_vecs,
               CAST(sum(norm_u) AS BIGINT) AS total_norm_micro
        FROM n GROUP BY label
    """,
}
