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
