"""Decompose the edges-stage wall time at a given parallelism.

Usage: python tools/profile_edges.py <cpus> [replicate]
Times each edge family's evaluation separately (counts against the warm
parse cache), then the combined spill write — to locate the anti-scaling
part of t_edges_spill.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    cpus = int(sys.argv[1])
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sf_dir = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from joern_spark.operators.ast_pass import parse_docs, split_rows
    from joern_spark.operators.base_passes import (
        eval_type_pass, macro_ref_linker, method_stubs, namespace_pass,
        parameter_out_pass, type_decl_stubs, type_nodes, type_ref_pass,
    )
    from joern_spark.operators.callgraph import (
        dynamic_call_linker, method_ref_linker, naive_call_linker,
        prefer_internal_call_edges, static_call_linker,
    )
    from joern_spark.session import get_spark
    from joern_spark.synth import synth_docs

    spark = get_spark(app_name=f"profile_edges_{cpus}", cpus=cpus,
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

    t = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        return out

    cpg_rows = parse_docs(docs.repartition(min(32, cpus), "doc_id")).persist()
    timed("parse", lambda: cpg_rows.count())
    nodes0, edges0, spans = split_rows(cpg_rows)

    from joern_spark.operators.type_recovery import collect_recovery_dicts
    dicts = timed("dicts", lambda: collect_recovery_dicts(nodes0))
    internal_names, ret_types, members, class_by_id = dicts

    from joern_spark.operators.method_kernels import fused_method_kernels
    from joern_spark.spill import SpillDir
    spill = SpillDir(None)
    k = fused_method_kernels(nodes0, internal_names,
                             recovery_dicts=(ret_types, members, class_by_id))
    kernel_out = timed("kernel_write", lambda: spill.write(k, "kernel_rows"))

    types = timed("types", lambda: type_nodes(nodes0).localCheckpoint(eager=True))
    decl_stubs = timed("decl_stubs", lambda: type_decl_stubs(types, nodes0).localCheckpoint(eager=True))
    m_stubs = timed("m_stubs", lambda: method_stubs(nodes0, edges0)[0].localCheckpoint(eager=True))
    param_outs = timed("param_outs", lambda: parameter_out_pass(nodes0)[0].localCheckpoint(eager=True))
    ns_nodes = timed("ns", lambda: namespace_pass(nodes0)[0].localCheckpoint(eager=True))

    nodes = (nodes0.unionByName(types).unionByName(decl_stubs)
             .unionByName(m_stubs).unionByName(param_outs).unionByName(ns_nodes))

    recovered = kernel_out.filter(F.col("kind") == "_TYPE_HINT").select(
        F.col("src").alias("node_id"), F.col("variable").alias("recovered_type"))
    kernel_edges = kernel_out.filter(F.col("kind") != "_TYPE_HINT")

    from joern_spark.operators.type_recovery import (
        field_access_linker, type_hint_call_linker,
    )

    # time each base-edge branch evaluation separately
    timed("b_type_ref", lambda: type_ref_pass(types, nodes0).count())
    timed("b_eval_type", lambda: eval_type_pass(nodes, types).count())
    timed("b_field_access", lambda: field_access_linker(nodes0, edges0, recovered=recovered).count())
    timed("b_method_ref", lambda: method_ref_linker(nodes).count())
    timed("b_macro_ref", lambda: macro_ref_linker(nodes0).count())

    static_edges = static_call_linker(nodes)
    timed("c_static", lambda: static_edges.count())
    ambiguous = dynamic_call_linker(nodes, edges0)
    timed("c_dynamic", lambda: ambiguous.count())
    hint = type_hint_call_linker(nodes0, edges0, static_edges.unionByName(ambiguous), recovered=recovered)
    timed("c_hint", lambda: hint.count())
    ambiguous = ambiguous.unionByName(hint)
    naive = naive_call_linker(nodes, static_edges.unionByName(ambiguous))
    timed("c_naive", lambda: naive.count())
    ambiguous = ambiguous.unionByName(naive)
    call_edges = static_edges.unionByName(prefer_internal_call_edges(ambiguous, nodes))
    timed("c_prefer_internal", lambda: call_edges.count())

    # the round-2 shape: whole union including kernel edges rewritten
    param_ast = param_outs.select(
        F.col("parent_id").alias("src"), F.col("node_id").alias("dst"),
        F.lit("AST").alias("kind"), F.lit("").alias("variable"),
        "doc_id", "method_id")
    base_edges = (edges0.unionByName(param_ast)
                  .unionByName(type_ref_pass(types, nodes0))
                  .unionByName(eval_type_pass(nodes, types))
                  .unionByName(field_access_linker(nodes0, edges0, recovered=recovered))
                  .unionByName(method_ref_linker(nodes))
                  .unionByName(macro_ref_linker(nodes0)))
    timed("w_full_union", lambda: spill.write(
        base_edges.unionByName(kernel_edges).unionByName(call_edges), "edges_full"))
    # the round-3 candidate: only base+call written, kernel stays on parquet
    timed("w_base_call_only", lambda: spill.write(
        base_edges.unionByName(call_edges), "edges_base_call"))

    n_kernel = kernel_edges.count()
    n_base = spark.read.parquet(spill.root + "/edges_base_call").count()
    print(json.dumps({"cpus": cpus, "rep": replicate, "t": t,
                      "kernel_edges": n_kernel, "base_call_edges": n_base}))
    spark.stop()


if __name__ == "__main__":
    main()
