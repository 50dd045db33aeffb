"""Event-stream operators: watermarked windowed aggregation + custom
stateful sessionization.

- ``windowed_event_counts``: tumbling-window count/sum per event_type with a
  watermark bounding late data — append-mode safe (state for a window is
  dropped once the watermark passes its end).
- ``sessionize_stream``: ``applyInPandasWithState`` per-user sessions with an
  inactivity gap — the custom-stateful-operator pattern the brief calls for
  (state = open session aggregate; processing-time timeout flushes idle
  users).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_STATE_SCHEMA = "start long, end long, n long, total double"  # start/end: ns
_GAP_NS = SESSION_GAP_SECONDS * 10**9


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window rollup per event_type (works on batch or stream)."""
    src = events
    if events.isStreaming:
        # watermarks require TIMESTAMP (parquet may carry TIMESTAMP_NTZ)
        src = events.withColumn("ts", F.col("ts").cast("timestamp"))
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value").cast("double") * F.lit(10000.0)).cast("decimal(38,0)"))
            .cast("long").alias("total_value_bp"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value_bp",
        )
    )


def _sessionize(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Stateful kernel: merge incoming events into the open session; emit
    closed sessions (gap exceeded or timeout fired)."""
    (user_id,) = key
    def row(s, e, n, total):
        return {
            "user_id": user_id,
            "session_start": pd.Timestamp(int(s)),
            "session_end": pd.Timestamp(int(e)),
            "n_events": n, "total_value": total,
        }

    if state.hasTimedOut:
        if state.exists:
            s, e, n, total = state.get
            state.remove()
            yield pd.DataFrame([row(s, e, n, total)])
        return

    rows = []
    ts_all, val_all = [], []
    for pdf in pdfs:
        ts_all.extend(pdf["ts"].astype("int64"))  # ns
        val_all.extend(pdf["value"].astype(float))
    order = sorted(range(len(ts_all)), key=lambda i: ts_all[i])

    if state.exists:
        s, e, n, total = state.get
    else:
        s = e = None
        n, total = 0, 0.0
    for i in order:
        t, v = int(ts_all[i]), float(val_all[i])
        if s is None:
            s = e = t
            n, total = 1, v
        elif t - e <= _GAP_NS:
            e = max(e, t)
            n += 1
            total += v
        else:
            rows.append(row(s, e, n, total))
            s = e = t
            n, total = 1, v
    state.update((int(s), int(e), n, total))
    state.setTimeoutDuration(SESSION_GAP_SECONDS * 1000)
    if rows:
        yield pd.DataFrame(rows)


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Per-user session aggregates via applyInPandasWithState."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS) -> DataFrame:
    """Batch-equivalent sessionization (window-function formulation) — the
    oracle for the stateful stream kernel AND the 100 TB backfill path."""
    from pyspark.sql import Window as W

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts")
    marked = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_ts").isNull())
            | (F.col("ts").cast("long") - F.col("prev_ts").cast("long") > gap_seconds),
        )
        .withColumn("session_no", F.sum(F.when(F.col("new_session"), 1).otherwise(0)).over(w))
    )
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .drop("session_no")
    )
