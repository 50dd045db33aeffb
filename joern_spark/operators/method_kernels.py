"""Fused per-method kernel pass: CFG + dominators/CDG + reaching-def in ONE
shuffle-free ``mapInArrow`` over the doc-partitioned parse output.

Why: the separate ``applyInPandas`` passes are semantically right but
physically wasteful — each one shuffles every node row by ``method_id`` and
pays per-group pandas overhead on ~30-row groups (measured ~88 ms CPU/doc at
sf0.1, dominated by group plumbing, not kernel math). Methods never span
documents, and a document's rows never span partitions (they are emitted by
one parse call), so all three kernels can run partition-locally with a
python-side groupby: zero shuffles, one Arrow pass, same kernel functions
(`cfg_edges_for_method`, `dominator_edges_for_method`,
`reaching_def_edges_for_method`) — the individual passes remain available
and tested for API parity.

The reaching-def EdgeValidator needs to know whether a CALL's callee is an
internal method — a cross-document fact. It ships as a broadcast set of
internal full_names (the north rule's broadcast alias-dictionary pattern);
above ``MAX_BROADCAST_NAMES`` the pipeline falls back to the join+cogroup
implementation.
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ids import stub_id
from ..schema import EDGES_SCHEMA_DDL, arrow_schema
from .cfg_pass import cfg_edges_for_method
from .dominators import dominator_edges_for_method
from .reaching_def import reaching_def_edges_for_method

MAX_BROADCAST_NAMES = 2_000_000
_YIELD_EVERY = 50_000  # output edge rows per yielded Arrow frame


def internal_method_names(nodes: DataFrame) -> set[str] | None:
    """Distinct internal METHOD full_names (the broadcast dictionary), or
    None if the dictionary exceeds the broadcast budget."""
    rows = (
        nodes.filter((F.col("kind") == "METHOD") & (~F.col("is_external")))
        .select("full_name").distinct().limit(MAX_BROADCAST_NAMES + 1).collect()
    )
    if len(rows) > MAX_BROADCAST_NAMES:
        return None
    return {r["full_name"] for r in rows}


def _synth_param_outs(rows: list[dict]) -> list[dict]:
    """Mirror MethodDecoratorPass inside the kernel: paramOut row per
    paramIn, with the identical deterministic id (stub_id('PARAM_OUT', pid))
    so emitted edges match the table built by parameter_out_pass."""
    outs = []
    for r in rows:
        if r["kind"] != "METHOD_PARAMETER_IN":
            continue
        o = dict(r)
        o["node_id"] = stub_id("PARAM_OUT", r["node_id"])
        o["kind"] = "METHOD_PARAMETER_OUT"
        outs.append(o)
    return outs


def fused_method_kernels(
    nodes: DataFrame,
    internal_names: set[str],
    with_dominators: bool = True,
    with_dataflow: bool = True,
    recovery_dicts: tuple | None = None,
) -> DataFrame:
    """parse-output nodes → CFG (+DOMINATE/POST_DOMINATE/CDG) (+REACHING_DEF)
    edge rows, partition-locally.

    When ``recovery_dicts`` (ret_types, members, class_by_id — from
    ``type_recovery.collect_recovery_dicts``) is given, also runs the
    per-method type-recovery mirror and emits its events as rows with
    ``kind='_TYPE_HINT'`` (src=identifier id, variable=recovered type,
    dst=0) — the pipeline filters these out of the edge stream and feeds
    them to the field-access/hint linkers, replacing the DataFrame
    ``type_recovery_events`` join DAG on the hot path."""
    cols = ["node_id", "doc_id", "kind", "name", "full_name", "code",
            "signature", "dispatch_type", "order", "argument_index", "line",
            "span_offset", "type_full_name", "is_external", "parent_id",
            "method_id", "ctrl_type"]
    src = nodes.filter(F.col("method_id").isNotNull()).select(*cols)
    names_local = internal_names  # closure-captured; Spark broadcasts the task
    if recovery_dicts is not None:
        from .type_recovery import recover_types_for_method

        ret_types, members, class_by_id = recovery_dicts
    else:
        ret_types = members = class_by_id = None

    import pyarrow as pa

    out_schema = arrow_schema(EDGES_SCHEMA_DDL)

    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        # STREAMING group-by: a document's rows are contiguous in the parse
        # output (one parse call emits the whole doc, and this pass sits
        # shuffle-free on top of it), so methods complete at doc boundaries.
        # Peak memory = one document + the output buffer — O(doc), not
        # O(partition) — restoring Arrow streaming semantics. A reappearing
        # doc_id would mean the contiguity assumption broke: fail loudly.
        # Arrow-native row I/O: ``to_pylist`` hands the kernels plain dicts
        # with exact int64 ids and None nulls (no pandas records pass), and
        # ``from_pylist`` lands the output the same way.
        out_rows: list[dict] = []

        def process(buf: dict[int, list[dict]]) -> None:
            for mid, rows in buf.items():
                doc_id = rows[0]["doc_id"]

                def emit(s, d, kind, var=""):
                    out_rows.append({
                        "src": s, "dst": d, "kind": kind, "variable": var,
                        "doc_id": doc_id, "method_id": mid,
                    })

                cfg = cfg_edges_for_method(rows)
                for s, d in cfg:
                    emit(s, d, "CFG")
                if with_dominators and cfg:
                    for s, d, k in dominator_edges_for_method(rows, cfg):
                        emit(s, d, k)
                if recovery_dicts is not None:
                    for nid, rtype in recover_types_for_method(
                            rows, ret_types, members, class_by_id):
                        out_rows.append({
                            "src": nid, "dst": 0, "kind": "_TYPE_HINT",
                            "variable": rtype, "doc_id": doc_id,
                            "method_id": mid,
                        })
                if with_dataflow and cfg:
                    krows = rows + _synth_param_outs(rows)
                    for r in krows:
                        if r["kind"] == "CALL":
                            r["callee_internal"] = (
                                True if r["full_name"] in names_local else None
                            )
                    for s, d, v in reaching_def_edges_for_method(krows, cfg):
                        emit(s, d, "REACHING_DEF", v)

        buf: dict[int, list[dict]] = defaultdict(list)
        cur_doc: str | None = None
        seen_docs: set[str] = set()
        for batch in batches:
            for r in batch.to_pylist():
                d = r["doc_id"]
                if d != cur_doc:
                    if cur_doc is not None:
                        process(buf)
                        buf = defaultdict(list)
                        if len(out_rows) >= _YIELD_EVERY:
                            yield from pa.Table.from_pylist(
                                out_rows, schema=out_schema).to_batches()
                            out_rows = []
                    if d in seen_docs:
                        raise ValueError(
                            f"non-contiguous rows for doc {d!r}: fused kernel "
                            "requires the unshuffled parse output (use the "
                            "cogrouped per-pass path instead)")
                    seen_docs.add(d)
                    cur_doc = d
                buf[r["method_id"]].append(r)
        process(buf)
        yield from pa.Table.from_pylist(out_rows, schema=out_schema).to_batches()

    return src.mapInArrow(run, schema=EDGES_SCHEMA_DDL)
