"""Finer decomposition of the flat edges_all stage (round-3 scaling work).

Usage: python tools/profile_edges.py <cpus> [sf_dir] [replicate]

Times, separately: fused kernel count, base_edges count, callgraph count,
and the final union persist — to locate which sub-stage is core-insensitive.
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

    spark = get_spark(app_name=f"profe_{cpus}", cpus=cpus,
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
    docs.count()

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

    n_parts = max(cpus, 8)
    t = time.time()
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

    internal_names = internal_method_names(nodes)
    t = mark("names_dict", t)

    kernel_edges = fused_method_kernels(nodes0, internal_names,
                                        with_dominators=True, with_dataflow=True)
    n_k = kernel_edges.count()
    t = mark("kernel_count_1st", t)
    kernel_edges = kernel_edges.localCheckpoint(eager=True)
    t = mark("kernel_ckpt_2nd", t)

    recovered = type_recovery_events(nodes0).localCheckpoint(eager=True)
    t = mark("recovery", t)
    base_edges = (
        edges0.unionByName(m_stub_edges).unionByName(param_edges)
        .unionByName(type_ref_pass(types, nodes0))
        .unionByName(eval_type_pass(nodes, types))
        .unionByName(field_access_linker(nodes0, edges0, recovered=recovered))
        .unionByName(method_ref_linker(nodes))
        .unionByName(macro_ref_linker(nodes0))
        .unionByName(ns_edges)
    )
    n_b = base_edges.count()
    t = mark("base_edges_count", t)

    static_edges = static_call_linker(nodes)
    ambiguous = dynamic_call_linker(nodes, base_edges)
    ambiguous = ambiguous.unionByName(type_hint_call_linker(
        nodes0, edges0, static_edges.unionByName(ambiguous), recovered=recovered))
    ambiguous = ambiguous.unionByName(
        naive_call_linker(nodes, static_edges.unionByName(ambiguous)))
    call_edges = static_edges.unionByName(
        prefer_internal_call_edges(ambiguous, nodes))
    n_c = call_edges.count()
    t = mark("callgraph_count", t)

    edges = base_edges.unionByName(kernel_edges).unionByName(call_edges)
    edges = edges.localCheckpoint(eager=True)
    t = mark("edges_union_ckpt", t)

    print(json.dumps({
        "cpus": cpus, "kernel_edges": n_k, "base_edges": n_b,
        "call_edges": n_c, "stages": stages,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
