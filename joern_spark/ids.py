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
    """Positive 60-bit id for synthesized global stubs.

    md5-based (NOT blake2b like :func:`stable_id`) on purpose: the identical
    value is expressible as a pure Spark SQL column (:func:`stub_id_col`),
    which lets the vocabulary passes (TypeNodePass, MethodStubCreator,
    NamespaceCreator, DependenciesPass, MethodDecoratorPass) run entirely
    JVM-side — round-3 profiling showed their Python round-trips
    (``t_stubs`` 21-43 s) dominating the job pool's serial fraction. Python
    callers (the fused kernel's paramOut synthesis, lowering's
    INHERITS_FROM targets) compute the same value through this function.
    """
    raw = _SEP.join(["stub", str(full_name), *[str(x) for x in extra]])
    return int(hashlib.md5(raw.encode("utf-8")).hexdigest()[:15], 16)


def stub_id_col(*parts):
    """Spark Column computing :func:`stub_id` — bit-identical: md5 of the
    \\x1f-joined parts, first 15 hex digits as a base-16 bigint."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    cols = [p.cast("string") if isinstance(p, Column) else F.lit(str(p))
            for p in parts]
    return F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, F.lit("stub"), *cols)), 1, 15),
        16, 10,
    ).cast("long")


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
