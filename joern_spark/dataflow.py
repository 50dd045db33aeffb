"""Interprocedural backward taint reachability — ``reachableBy`` as bounded
iterative DataFrame joins.

Reference: the task-parallel engine in
``dataflowengineoss/.../queryengine/Engine.scala:43-268`` +
``TaskCreator.scala:26-100`` — per-sink backward DFS over in-REACHING_DEF
edges within a method, jumping interprocedurally at parameters (to caller
arguments) and at call sites (into callee returns), k-limited at
``maxCallDepth = 4`` (``Engine.scala:322``).

Spark shape: instead of per-sink tasks on a thread pool, ONE frontier
DataFrame carries every sink's wavefront simultaneously; each round is
  frontier ⋈ reversed REACHING_DEF  ∪  param→arg hop  ∪  call→return hop
with a visited-set anti-join. Rounds are bounded by the graph diameter ×
call depth; every sink shares the same joins, which is exactly the path-cache
sharing the reference implements by hand (``EngineConfig.shareCacheBetweenTasks``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CALL_DEPTH = 4  # Engine.scala:322
MAX_ROUNDS = 128


def _edges_of(edges: DataFrame, kind: str) -> DataFrame:
    return edges.filter(F.col("kind") == kind)


def reachable_by(nodes: DataFrame, edges: DataFrame,
                 sinks: DataFrame, sources: DataFrame,
                 max_call_depth: int = MAX_CALL_DEPTH) -> DataFrame:
    """Which sources reach which sinks through data flow?

    sinks/sources: DataFrames with a ``node_id`` column.
    Returns (source_id, sink_id) pairs.

    The frontier is (node_id, sink_id, depth): every node whose value flows
    into sink_id, reached backwards. depth counts interprocedural hops only,
    mirroring the reference's k-limit semantics.
    """
    rd_back = _edges_of(edges, "REACHING_DEF").select(
        F.col("dst").alias("node_id"), F.col("src").alias("prev_id")
    )
    call_edges = _edges_of(edges, "CALL").select(
        F.col("src").alias("call_id"), F.col("dst").alias("callee_id")
    )
    arg_edges = _edges_of(edges, "ARGUMENT").select(
        F.col("src").alias("call_id"), F.col("dst").alias("arg_id")
    )
    n = nodes.select("node_id", "kind", "method_id", "argument_index", "order")

    # param (METHOD m, index i) ← argument (call→m, argument_index i)
    params = n.filter(F.col("kind") == "METHOD_PARAMETER_IN").select(
        F.col("node_id").alias("param_id"),
        F.col("method_id").alias("callee_id"),
        F.col("order").alias("p_index"),
    )
    args = arg_edges.join(
        n.select(F.col("node_id").alias("arg_id"),
                 F.col("argument_index").alias("a_index")),
        "arg_id",
    )
    param_to_arg = (
        params.join(call_edges, "callee_id")
        .join(args, "call_id")
        .filter(F.col("p_index") == F.col("a_index"))
        .select(F.col("param_id").alias("node_id"), F.col("arg_id").alias("prev_id"))
        .distinct()
    )

    # call-site result ← callee's RETURN/METHOD_RETURN (arg-taints-return dual)
    returns = n.filter(F.col("kind").isin("RETURN", "METHOD_RETURN")).select(
        F.col("node_id").alias("ret_id"), F.col("method_id").alias("callee_id")
    )
    call_to_return = (
        call_edges.join(returns, "callee_id")
        .select(F.col("call_id").alias("node_id"), F.col("ret_id").alias("prev_id"))
        .distinct()
    )

    inter_back = param_to_arg.unionByName(call_to_return).persist()

    frontier = sinks.select(
        F.col("node_id"), F.col("node_id").alias("sink_id"), F.lit(0).alias("depth")
    ).distinct()
    visited = frontier.select("node_id", "sink_id", "depth").localCheckpoint(eager=True)
    frontier = visited

    for _ in range(MAX_ROUNDS):
        intra = frontier.join(rd_back, "node_id").select(
            F.col("prev_id").alias("node_id"), "sink_id", "depth"
        )
        inter = (
            frontier.filter(F.col("depth") < max_call_depth)
            .join(inter_back, "node_id")
            .select(F.col("prev_id").alias("node_id"), "sink_id",
                    (F.col("depth") + 1).alias("depth"))
        )
        nxt = intra.unionByName(inter).groupBy("node_id", "sink_id").agg(
            F.min("depth").alias("depth")
        )
        nxt = nxt.join(
            visited.select("node_id", "sink_id"), ["node_id", "sink_id"], "left_anti"
        ).localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt

    hits = visited.join(
        sources.select(F.col("node_id").alias("source_probe")).distinct(),
        visited["node_id"] == F.col("source_probe"),
    )
    return hits.select(
        F.col("node_id").alias("source_id"), F.col("sink_id").alias("sink_id")
    ).distinct()


def flow_result_pairs(nodes: DataFrame, paths: list[list[int]],
                      statement_level: bool = True) -> list[tuple]:
    """Map node-id paths to (code, line) tuples and dedup — the reference's
    ``flowToResultPairs`` comparison granularity (DataFlowTests.scala:46-60):
    each element renders as its enclosing statement's code (an identifier
    inside ``a = p0`` prints as ``a = p0``), consecutive duplicates collapse,
    and identical printed paths dedup."""
    rows = nodes.select("node_id", "code", "line", "kind", "parent_id").collect()
    meta = {r["node_id"]: r for r in rows}
    _STMT_PARENTS = {"BLOCK", "CONTROL_STRUCTURE", "METHOD", "JUMP_TARGET"}

    def stmt(nid):
        r = meta.get(nid)
        if r is None:
            return ("?", -1)
        if not statement_level:
            return (r["code"], r["line"])
        cur = r
        for _ in range(30):
            parent = meta.get(cur["parent_id"])
            if parent is None or parent["kind"] in _STMT_PARENTS:
                break
            cur = parent
        return (cur["code"], cur["line"])

    reps = set()
    for p in paths:
        rep = []
        for n in p:
            s = stmt(n)
            if not rep or rep[-1] != s:
                rep.append(s)
        reps.add(tuple(rep))
    return sorted(reps)


def reachable_by_flows(nodes: DataFrame, edges: DataFrame,
                       sinks: DataFrame, sources: DataFrame,
                       max_call_depth: int = MAX_CALL_DEPTH,
                       max_paths: int = 10000) -> list[list[int]]:
    """Path-materializing variant (driver-side reconstruction; test scale).

    Mirrors ``reachableByFlows``: returns source→sink node-id paths, deduped
    keep-longest per (source, sink) like ``Engine.scala:154-179``.
    """
    rd = _edges_of(edges, "REACHING_DEF").select("src", "dst").collect()
    src_ids = {r["node_id"] for r in sources.select("node_id").collect()}
    sink_ids = {r["node_id"] for r in sinks.select("node_id").collect()}
    back: dict[int, list[int]] = {}
    for r in rd:
        back.setdefault(r["dst"], []).append(r["src"])

    paths: list[list[int]] = []
    for sink in sorted(sink_ids):
        stack: list[tuple[int, tuple[int, ...]]] = [(sink, (sink,))]
        while stack and len(paths) < max_paths:
            cur, path = stack.pop()
            if cur in src_ids and len(path) > 1 or (cur in src_ids and cur != sink):
                paths.append(list(reversed(path)))
            for prev in sorted(back.get(cur, ())):
                if prev not in path:
                    stack.append((prev, path + (prev,)))
    # keep-longest dedup per (head, last)
    best: dict[tuple[int, int], list[int]] = {}
    for p in paths:
        key = (p[0], p[-1])
        if key not in best or len(p) > len(best[key]):
            best[key] = p
    return sorted(best.values())
