"""End-to-end CPG triple factory (SURVEY.md §7.1 stage order).

docs → [ast] parse (mapInPandas) → [base] type/stub/paramOut passes (joins)
     → [cfg] per-method fringe kernel → [callgraph] static/CHA/naive linkers
     → [dataflow] reaching-def kernels → [triples] materialization,
each stage a pure DataFrame transformation; materialized stages write
partitioned parquet + lineage rows + a resume manifest.

In memory-only mode (tests) the unified parse output is cached instead of
written; on a cluster every stage boundary is a parquet/Iceberg snapshot so
any failed partition range resumes from the manifest without recomputation.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lineage import append_lineage, read_manifest, write_manifest
from .operators.ast_pass import parse_docs, split_rows
from .operators.base_passes import (
    eval_type_pass,
    macro_ref_linker,
    method_stubs,
    namespace_pass,
    parameter_out_pass,
    type_decl_stubs,
    type_nodes,
    type_ref_pass,
)
from .operators.callgraph import (
    dynamic_call_linker,
    link_misses,
    method_ref_linker,
    naive_call_linker,
    static_call_linker,
)
from .operators.cfg_pass import cfg_pass
from .operators.reaching_def import reaching_def_pass
from .triples import build_triples, part_id_col


@dataclass
class CpgResult:
    nodes: DataFrame
    edges: DataFrame
    spans: DataFrame
    triples: DataFrame
    link_misses: DataFrame
    stats: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str | None = None,
    n_parts: int = 32,
    with_dataflow: bool = True,
    with_dominators: bool = True,
    fuse_kernels: bool | None = None,
) -> CpgResult:
    stats: dict = {}

    # ---- stage: ast (resumable per partition) -----------------------------
    t0 = time.time()
    docs = docs.withColumn("part_id", part_id_col(n_parts=n_parts))
    if out_dir:
        ast_dir = os.path.join(out_dir, "ast_rows")
        manifest = read_manifest(out_dir, "ast")
        done = set(manifest["part_ids"]) if manifest else set()
        todo_docs = docs.filter(~F.col("part_id").isin(sorted(done))) if done else docs
        if done:
            stats["ast_resumed_parts"] = len(done)
        # any remaining partitions are parsed and appended; completed ones are
        # read back untouched (resume without recomputation)
        if todo_docs.limit(1).count() > 0 or not done:
            rows_new = parse_docs(todo_docs.repartition(n_parts, "doc_id")) \
                .withColumn("part_id", part_id_col(n_parts=n_parts))
            rows_new.write.mode("append").partitionBy("part_id").parquet(ast_dir)
            append_lineage(spark, out_dir, rows_new, "ast", t0)
            all_parts = [r[0] for r in docs.select("part_id").distinct().collect()]
            write_manifest(out_dir, "ast", all_parts, complete=True)
        cpg_rows = spark.read.parquet(ast_dir)
    else:
        cpg_rows = parse_docs(docs.repartition(min(n_parts, 32), "doc_id"))
        cpg_rows = cpg_rows.persist()
        # materialize NOW: the nodes union fans out into 5 branches whose
        # stages run concurrently inside one job — without this barrier they
        # race to populate the cache and each re-runs the parse
        cpg_rows.count()

    nodes0, edges0, spans = split_rows(cpg_rows)

    # ---- stage: base (types, stubs, paramOuts, type linking) ---------------
    types = type_nodes(nodes0)
    decl_stubs = type_decl_stubs(types, nodes0)
    m_stubs, m_stub_edges = method_stubs(nodes0, edges0)
    param_outs, param_edges = parameter_out_pass(nodes0)
    ns_nodes, ns_edges = namespace_pass(nodes0)
    if not out_dir:
        # each stub frame feeds both the nodes union and its edge projection —
        # persist so the generating pass runs once
        m_stubs = m_stubs.persist()
        param_outs = param_outs.persist()

    nodes = (
        nodes0.unionByName(types).unionByName(decl_stubs)
        .unionByName(m_stubs).unionByName(param_outs).unionByName(ns_nodes)
    )

    if out_dir:
        t1 = time.time()
        nodes = _materialize(spark, nodes, os.path.join(out_dir, "nodes"), "doc_id")
        append_lineage(spark, out_dir,
                       nodes.withColumn("part_id", part_id_col(n_parts=n_parts)),
                       "base_nodes", t1)
        write_manifest(out_dir, "base", list(range(n_parts)), complete=True)
    else:
        # eager barrier + LINEAGE TRUNCATION: the union concatenates
        # 5×n_parts partitions and has many downstream consumers (linkers,
        # kernels, triples). Without materializing first, concurrent
        # broadcast jobs race to compute the cache and re-run the whole
        # parse+stub chain several times over; and without truncation the
        # downstream logical plans embed this plan dozens of times — the
        # recovery/linker rounds then grow plans until Catalyst's plan
        # *stringification* alone OOMs the driver.
        # no repartition: compacting the 5-way union costs a full shuffle of
        # every wide node row and bought nothing downstream (the linkers
        # broadcast their dims; the kernels read the parse output directly) —
        # the extra union partitions are only task-scheduling overhead
        nodes = nodes.localCheckpoint(eager=True)

    from .operators.type_recovery import (
        field_access_linker,
        type_hint_call_linker,
        type_recovery_events,
    )

    # materialize once: the recovery hints feed BOTH field_access_linker and
    # the hint call linker — two plan branches that would each re-run the
    # multi-shuffle recovery rounds; the output is small (2 columns).
    # OVERLAP with the internal-method dictionary collect below: both are
    # independent jobs over already-materialized inputs, and running them on
    # the driver sequentially added their latencies to the serial fraction —
    # Spark schedules concurrent jobs from separate submitter threads.
    from concurrent.futures import ThreadPoolExecutor

    from .operators.method_kernels import internal_method_names

    with ThreadPoolExecutor(max_workers=2) as pool:
        recovered_f = pool.submit(
            lambda: type_recovery_events(nodes0).localCheckpoint(eager=True))
        names_f = pool.submit(
            lambda: internal_method_names(nodes)
            if fuse_kernels is not False else None)
        recovered = recovered_f.result()
        internal_names = names_f.result()
    base_edges = (
        edges0.unionByName(m_stub_edges).unionByName(param_edges)
        .unionByName(type_ref_pass(types, nodes0))
        .unionByName(eval_type_pass(nodes, types))
        .unionByName(field_access_linker(nodes0, edges0, recovered=recovered))
        .unionByName(method_ref_linker(nodes))
        .unionByName(macro_ref_linker(nodes0))
        .unionByName(ns_edges)
    )

    # ---- stage: controlflow + dataflow kernels -------------------------------
    # fast path: methods are document-local, so CFG/dominators/reaching-def
    # fuse into ONE shuffle-free mapInPandas over the parse partitions, with
    # the internal-method dictionary broadcast (method_kernels.py). Falls
    # back to the cogrouped per-pass implementations when the dictionary
    # exceeds the broadcast budget.
    from .operators.method_kernels import fused_method_kernels

    fused = internal_names is not None
    rd_fused = fused and with_dataflow
    if fused:
        kernel_edges = fused_method_kernels(
            nodes0, internal_names,
            with_dominators=with_dominators, with_dataflow=with_dataflow,
        )
    else:
        kernel_edges = cfg_pass(nodes0)
        if with_dominators:
            if not out_dir:
                kernel_edges = kernel_edges.persist()
            from .operators.dominators import dominator_pass

            kernel_edges = kernel_edges.unionByName(
                dominator_pass(nodes0, kernel_edges))

    # ---- stage: callgraph ----------------------------------------------------
    from .operators.callgraph import prefer_internal_call_edges

    static_edges = static_call_linker(nodes)
    # recovered-hint linking runs after CHA (it targets calls CHA could not
    # resolve) and before the naive name-only fallback
    ambiguous = dynamic_call_linker(nodes, base_edges)
    ambiguous = ambiguous.unionByName(type_hint_call_linker(
        nodes0, edges0, static_edges.unionByName(ambiguous), recovered=recovered))
    ambiguous = ambiguous.unionByName(
        naive_call_linker(nodes, static_edges.unionByName(ambiguous)))
    # prefer-internal pruning only over the ambiguous linkers' output: static
    # links resolve by full_name (unambiguous), and windowing the static bulk
    # (every printf/malloc site) would add a full shuffle for nothing
    call_edges = static_edges.unionByName(
        prefer_internal_call_edges(ambiguous, nodes))

    edges = base_edges.unionByName(kernel_edges).unionByName(call_edges)

    if out_dir:
        t2 = time.time()
        stage_name = "edges" if rd_fused else "edges_pre_ddg"
        edges = _materialize(spark, edges, os.path.join(out_dir, stage_name), "doc_id")
        append_lineage(spark, out_dir,
                       edges.withColumn("part_id", part_id_col(n_parts=n_parts)),
                       stage_name, t2)
    else:
        # no repartition: compacting ~9M wide edge rows costs a full shuffle,
        # while the extra union partitions only cost task-scheduling overhead.
        # localCheckpoint (not persist): truncates the edge plan so every
        # downstream consumer (triples, DSL, flows) starts from a leaf.
        edges = edges.localCheckpoint(eager=True)

    # ---- stage: dataflow (non-fused fallback only) ---------------------------
    if with_dataflow and not rd_fused:
        rd_edges = reaching_def_pass(nodes, edges)
        edges = edges.unionByName(rd_edges)
        if not out_dir:
            edges = edges.persist()

    misses = link_misses(nodes, call_edges)

    # ---- stage: triples --------------------------------------------------------
    triples = build_triples(nodes, edges, spans, n_parts=n_parts)
    if out_dir:
        t3 = time.time()
        triples_dir = os.path.join(out_dir, "triples")
        triples.write.mode("overwrite").partitionBy("part_id").parquet(triples_dir)
        triples = spark.read.parquet(triples_dir)
        append_lineage(spark, out_dir, triples, "triples", t3)
        write_manifest(out_dir, "triples", list(range(n_parts)), complete=True)

    return CpgResult(nodes=nodes, edges=edges, spans=spans, triples=triples,
                     link_misses=misses, stats=stats)


def _materialize(spark: SparkSession, df: DataFrame, path: str, *_part_cols) -> DataFrame:
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
