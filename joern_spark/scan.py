"""Packaged query bundles → FINDING rows (joern-scan analog).

Reference: ``console/.../scan/package.scala:14-44`` (Query → NewFinding),
querydb bundle shape ``querydb/.../c/CopyLoops.scala:11-39`` /
``java/SQLInjection.scala:15-38``. A query here is (name, title, severity,
traversal function CpgQuery-in → DataFrame of matched node ids); running a
bundle unions per-query findings into one ``findings`` table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dataflow import reachable_by
from .query import Cpg


@dataclass(frozen=True)
class Query:
    name: str
    title: str
    severity: float
    run: Callable[[Cpg], DataFrame]  # → DataFrame with node_id column


def _malloc_to_free_missing(cpg: Cpg) -> DataFrame:
    """allocated-but-never-freed heuristic: malloc call sites in methods
    with no free() call (querydb resource-leak family)."""
    mallocs = cpg.call("^malloc$").to_df().select("node_id", "method_id")
    frees = cpg.call("^free$").to_df().select(F.col("method_id").alias("fm")).distinct()
    return mallocs.join(frees, mallocs["method_id"] == frees["fm"], "left_anti").select("node_id")


def _literal_argument_to_risky_sink(cpg: Cpg) -> DataFrame:
    """dataflow query: literals reaching printf-family sink arguments
    (format-string family; uses the reachableBy engine)."""
    sinks = cpg.call("^(printf|sprintf|fprintf)$").argument().ids()
    sources = cpg.literal().ids()
    hits = reachable_by(cpg.nodes, cpg.edges, sinks, sources)
    return hits.select(F.col("sink_id").alias("node_id")).distinct()


def _uncalled_internal_method(cpg: Cpg) -> DataFrame:
    """dead-code family: internal non-main methods with no incoming CALL."""
    methods = cpg.method().is_external(False).to_df().filter(
        ~F.col("name").rlike("^main")
    ).select("node_id")
    called = cpg.nodes.sparkSession.createDataFrame([], "node_id long")
    call_dsts = (
        cpg.edges.filter(F.col("kind") == "CALL").select(F.col("dst").alias("node_id")).distinct()
    )
    return methods.join(call_dsts, "node_id", "left_anti")


def _deep_nesting(cpg: Cpg, depth: int = 3) -> DataFrame:
    """complexity family: control structures nested >= depth deep."""
    cs = cpg.all().is_control_structure()
    cur = cs
    for _ in range(depth - 1):
        cur = cur.ast_minus_root().is_control_structure()
    return cur.ids()


DEFAULT_BUNDLE = [
    Query("malloc-without-free", "Allocation without matching free in method", 5.0,
          _malloc_to_free_missing),
    Query("literal-to-format-sink", "Literal flows into format-string sink", 4.0,
          _literal_argument_to_risky_sink),
    Query("uncalled-internal-method", "Internal method never called", 2.0,
          _uncalled_internal_method),
    Query("deeply-nested-control", "Control structures nested >= 3 deep", 1.0,
          _deep_nesting),
]


def run_scan(nodes: DataFrame, edges: DataFrame,
             bundle: list[Query] | None = None) -> DataFrame:
    """→ findings(name, title, severity, node_id, doc_id, code)."""
    cpg = Cpg(nodes=nodes, edges=edges)
    out: DataFrame | None = None
    meta = nodes.select("node_id", "doc_id", "code")
    for q in bundle or DEFAULT_BUNDLE:
        ids = q.run(cpg).select("node_id").distinct()
        f = ids.join(meta, "node_id").select(
            F.lit(q.name).alias("name"), F.lit(q.title).alias("title"),
            F.lit(q.severity).alias("severity"), "node_id", "doc_id", "code",
        )
        out = f if out is None else out.unionByName(f)
    return out
