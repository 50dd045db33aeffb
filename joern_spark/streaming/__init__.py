"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.E) — its incremental story is
overlay idempotence + per-file independence. The Spark-native equivalent:
- incremental triple-factory ingest: new document files → ``foreachBatch``
  into the SAME materialized tables + manifests the batch pipeline uses
  (per-partition resume semantics carry over unchanged);
- watermarked windowed aggregations and a custom stateful operator
  (``applyInPandasWithState`` sessionization) over the events stream.
"""

from .events import sessionize_stream, windowed_event_counts
from .ingest import stream_triple_factory

__all__ = ["stream_triple_factory", "windowed_event_counts", "sessionize_stream"]
