"""Text-analysis operators over the ``documents`` table.

All JVM-side built-ins (no Python UDFs): whole-stage-codegen string ops,
one narrow projection per operator — at 100 TB these are pure map stages
with parquet column pruning (only ``doc_id``/``text`` read).

Ratios are reported in integer basis points (floor(10000·x/y)) so the Spark
result and the DuckDB oracle agree exactly — decimal-vs-double midpoint
rounding differs between engines, integer division doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "is", "in", "to", "for"]
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
TOKEN_RE = "[a-z0-9]+|[^a-z0-9\\s]"

def _words():
    return F.split(F.lower("text"), r"\s+")


def _n_tokens():
    return F.size(_words()).cast("long")


def _n_stop():
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(_words(), lambda w: F.array_contains(stop_arr, w))).cast("long")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: char/token counts, stopword ratio, mean token length."""
    d = _docs(spark, sf_dir)
    n_nonspace = F.length(F.regexp_replace("text", r"\s+", "")).cast("long")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        _n_tokens().alias("n_tokens"),
        _n_stop().alias("n_stopwords"),
        F.floor(F.lit(10000) * _n_stop() / _n_tokens()).cast("long").alias("stop_ratio_bp"),
        F.floor(F.lit(100) * n_nonspace / _n_tokens()).cast("long").alias("mean_token_len_centi"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (alnum runs + single punctuation)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_RE), 0)).cast("long").alias("n_bpe_tokens"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: English stopword density >= 3% (integer compare)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.when(F.lit(100) * _n_stop() >= F.lit(3) * _n_tokens(), F.lit("en"))
        .otherwise(F.lit("unk")).alias("lang_pred"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: hash of the whitespace-normalized lowered text."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))).alias("fp"),
    )


QUERIES = {
    "text_quality": text_quality,
    "text_token_count": token_count,
    "text_lang_id": lang_id,
    "text_fingerprint": fingerprint,
}

_N_TOKENS_SQL = "len(string_split_regex(lower(text), '\\s+'))"
_N_STOP_SQL = f"len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w IN ({_STOP_SQL})))"

ORACLES = {
    "text_quality": f"""
        SELECT doc_id,
               length(text)::BIGINT AS len_chars,
               {_N_TOKENS_SQL}::BIGINT AS n_tokens,
               {_N_STOP_SQL}::BIGINT AS n_stopwords,
               floor(10000.0 * {_N_STOP_SQL} / {_N_TOKENS_SQL})::BIGINT AS stop_ratio_bp,
               floor(100.0 * length(regexp_replace(text, '\\s+', '', 'g')) / {_N_TOKENS_SQL})::BIGINT AS mean_token_len_centi
        FROM documents
    """,
    "text_token_count": f"""
        SELECT doc_id,
               len(regexp_extract_all(lower(text), '{TOKEN_RE}'))::BIGINT AS n_bpe_tokens
        FROM documents
    """,
    "text_lang_id": f"""
        SELECT doc_id,
               CASE WHEN 100 * {_N_STOP_SQL} >= 3 * {_N_TOKENS_SQL}
                    THEN 'en' ELSE 'unk' END AS lang_pred
        FROM documents
    """,
    "text_fingerprint": """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents
    """,
}
