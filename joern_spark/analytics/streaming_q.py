"""Driver-contract wrappers for the streaming operators' batch equivalents.

The streaming kernels are verified against these exact batch formulations
(tests/test_streaming.py); exposing them here puts the semantics under the
DuckDB oracle gate too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.events import SESSION_GAP_SECONDS, windowed_event_counts


def events_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_event_counts(events).select(
        F.col("window_start").cast("string").alias("window_start"),
        "event_type", "n_events", "total_value_bp",
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.events import sessionize_batch

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # value → integer 1e-4 units BEFORE sessionizing: the session sum is then
    # an exact long (order-independent), matching the oracle bit-for-bit
    bp = events.withColumn(
        "value", F.round(F.col("value").cast("double") * F.lit(10000.0)).cast("long")
    )
    out = sessionize_batch(bp)
    return out.select(
        "user_id",
        F.col("session_start").cast("string").alias("session_start"),
        F.col("session_end").cast("string").alias("session_end"),
        "n_events",
        F.col("total_value").cast("long").alias("total_value_bp"),
    )


QUERIES = {
    "stream_events_window": events_window_rollup,
    "stream_events_sessionize": events_sessionize,
}

ORACLES = {
    "stream_events_window": """
        SELECT date_trunc('hour', ts)::VARCHAR AS window_start,
               event_type,
               count(*)::BIGINT AS n_events,
               CAST(sum(CAST(round(value * 10000.0) AS BIGINT)) AS BIGINT) AS total_value_bp
        FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    "stream_events_sessionize": f"""
        WITH marked AS (
            SELECT user_id, ts, CAST(round(value * 10000.0) AS BIGINT) AS value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_SECONDS}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS session_no
            FROM marked
        )
        SELECT user_id,
               min(ts)::VARCHAR AS session_start,
               max(ts)::VARCHAR AS session_end,
               count(*)::BIGINT AS n_events,
               CAST(sum(value) AS BIGINT) AS total_value_bp
        FROM numbered GROUP BY user_id, session_no
    """,
}
