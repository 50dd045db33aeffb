"""Deterministic 63-bit node ids.

The reference hands out sequential OverflowDB longs; a distributed factory
needs ids that are stable under task retry and independent of partition
placement (SURVEY.md §7.0), so ids are content hashes of
``(doc_id, span_offset, local_index)`` — or ``("stub", full_name)`` for
synthesized global stubs.
"""

from __future__ import annotations

import hashlib

_SEP = "\x1f"


def stable_id(*parts: object) -> int:
    """Positive 63-bit hash of the given parts (deterministic across processes)."""
    raw = _SEP.join(str(p) for p in parts).encode("utf-8")
    h = hashlib.blake2b(raw, digest_size=8).digest()
    return int.from_bytes(h, "big") >> 1


def node_id(doc_id: str, span_offset: int, local_index: int) -> int:
    return stable_id("n", doc_id, span_offset, local_index)


def stub_id(full_name: str, *extra: object) -> int:
    return stable_id("stub", full_name, *extra)


def synth_key(doc_id: str) -> int:
    """Deterministic 31-bit corpus seed for a document.

    md5-based on purpose: the identical value is expressible in Spark SQL
    (``conv(substring(md5(...), 1, 8), 16, 10)``) and DuckDB
    (``('0x' || substr(md5(...), 1, 8))::BIGINT``), which lets the
    span-provenance DuckDB oracle re-derive the synthesized corpus from the
    raw ``documents`` table with no Python in the loop.
    """
    raw = f"synth|{doc_id}".encode("utf-8")
    return int(hashlib.md5(raw).hexdigest()[:8], 16) % (1 << 31)


SYNTH_KEY_SPARK_SQL = (
    "pmod(cast(conv(substring(md5(concat('synth|', {doc_id})), 1, 8), 16, 10) "
    "as bigint), 2147483648)"
)

SYNTH_KEY_DUCKDB_SQL = (
    "(('0x' || substr(md5('synth|' || {doc_id}), 1, 8))::BIGINT % 2147483648)"
)
