"""Training-data pipeline analytics over the driver's parquet tables.

Each module exposes ``QUERIES: dict[name -> (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name -> ANSI SQL]`` (DuckDB-runnable on the same tables).
Column names and types are aligned between the two so the driver's
order-insensitive value-hash comparison passes; floating-point outputs are
either avoided, computed in identical fold order, or cast to exact decimals.
"""

from . import ann, dedup, multimodal, relational, streaming_q, text

MODULES = [dedup, text, ann, relational, multimodal, streaming_q]


def all_queries():
    out = {}
    for m in MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in MODULES:
        out.update(m.ORACLES)
    return out
