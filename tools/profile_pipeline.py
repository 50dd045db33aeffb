"""Stage-level wall/CPU profile of the triple factory at a given parallelism.

Usage: python tools/profile_pipeline.py <cpus> [sf_dir] [replicate]

Replays run_pipeline's in-memory stage structure with explicit timers around
each materialization barrier, to locate the serial fraction that caps N→4N
scaling efficiency. Prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    cpus = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import functions as F

    from joern_spark.session import get_spark
    from joern_spark.synth import synth_docs

    spark = get_spark(app_name=f"profile_{cpus}", cpus=cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if replicate > 1:
        documents = (
            documents.select(F.col("doc_id").cast("string").alias("doc_id"))
            .withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(replicate)])))
            .select(F.concat("doc_id", F.lit("_"), "rep").alias("doc_id"))
        )
    docs = synth_docs(documents).persist()
    n_docs = docs.count()

    stages: dict[str, float] = {}

    def mark(name, t0):
        stages[name] = round(time.time() - t0, 2)
        return time.time()

    from joern_spark.operators.ast_pass import parse_docs, split_rows
    from joern_spark.operators.base_passes import (
        eval_type_pass, macro_ref_linker, method_stubs, namespace_pass,
        parameter_out_pass, type_decl_stubs, type_nodes, type_ref_pass,
    )
    from joern_spark.operators.callgraph import (
        dynamic_call_linker, method_ref_linker, naive_call_linker,
        prefer_internal_call_edges, static_call_linker,
    )
    from joern_spark.operators.method_kernels import (
        fused_method_kernels, internal_method_names,
    )
    from joern_spark.operators.type_recovery import (
        field_access_linker, type_hint_call_linker, type_recovery_events,
    )
    from joern_spark.triples import build_triples

    n_parts = max(cpus, 8)
    t = time.time()
    t_all = t

    cpg_rows = parse_docs(docs.repartition(min(n_parts, 32), "doc_id")).persist()
    cpg_rows.count()
    t = mark("parse", t)

    nodes0, edges0, spans = split_rows(cpg_rows)
    types = type_nodes(nodes0)
    decl_stubs = type_decl_stubs(types, nodes0)
    m_stubs, m_stub_edges = method_stubs(nodes0, edges0)
    param_outs, param_edges = parameter_out_pass(nodes0)
    ns_nodes, ns_edges = namespace_pass(nodes0)
    m_stubs = m_stubs.persist()
    param_outs = param_outs.persist()
    nodes = (
        nodes0.unionByName(types).unionByName(decl_stubs)
        .unionByName(m_stubs).unionByName(param_outs).unionByName(ns_nodes)
    )
    nodes = nodes.localCheckpoint(eager=True)
    t = mark("nodes_union", t)

    recovered = type_recovery_events(nodes0).localCheckpoint(eager=True)
    base_edges = (
        edges0.unionByName(m_stub_edges).unionByName(param_edges)
        .unionByName(type_ref_pass(types, nodes0))
        .unionByName(eval_type_pass(nodes, types))
        .unionByName(field_access_linker(nodes0, edges0, recovered=recovered))
        .unionByName(method_ref_linker(nodes))
        .unionByName(macro_ref_linker(nodes0))
        .unionByName(ns_edges)
    )

    internal_names = internal_method_names(nodes)
    t = mark("internal_names_dict", t)
    kernel_edges = fused_method_kernels(nodes0, internal_names,
                                        with_dominators=True, with_dataflow=True)

    static_edges = static_call_linker(nodes)
    ambiguous = dynamic_call_linker(nodes, base_edges)
    t = mark("dynamic_linker_probe", t)  # includes the calls.limit(1).count probe
    ambiguous = ambiguous.unionByName(type_hint_call_linker(
        nodes0, edges0, static_edges.unionByName(ambiguous), recovered=recovered))
    ambiguous = ambiguous.unionByName(
        naive_call_linker(nodes, static_edges.unionByName(ambiguous)))
    call_edges = static_edges.unionByName(
        prefer_internal_call_edges(ambiguous, nodes))

    edges = base_edges.unionByName(kernel_edges).unionByName(call_edges).persist()
    edges.count()
    t = mark("edges_all", t)

    triples = build_triples(nodes, edges, spans, n_parts=n_parts)
    n_triples = triples.count()
    t = mark("triples", t)

    total = round(time.time() - t_all, 2)
    print(json.dumps({
        "cpus": cpus, "docs": n_docs, "triples": n_triples,
        "total_sec": total, "stages": stages,
        "tps": round(n_triples / total, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
