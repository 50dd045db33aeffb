"""Entity canonicalization: iterative large-star/small-star connected
components over a mention/alias graph.

Algorithm: Kiveris et al., "Connected Components in MapReduce and Beyond"
(SOCC'14) — alternate
  large-star: ∀u, connect every neighbor v > u to min(Γ⁺(u))
  small-star: ∀u, connect every neighbor v ≤ u (and u) to min(Γ⁺(u))
until the edge set is stable; converges in O(log n) rounds, each round two
shuffles (groupBy-min + join). This is the scale path the north rule demands
for merging aliased entities — unlike label propagation it does not need
O(diameter) rounds.

CPG wiring: the mention graph for symbols is built from
- dereference aliasing (``Dereference.scala:22-29``: ``T*`` ≡ ``T``),
- ALIAS_OF edges (``AliasLinkerPass.scala:9-25``),
- TYPE ↔ TYPE_DECL full-name identity,
and each component's canonical representative is its minimum id —
deterministic regardless of iteration order (SURVEY.md §7.4 risk 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 32


def _sym(e: DataFrame) -> DataFrame:
    """Symmetrize + dedup an (a, b) edge list, dropping self-loops."""
    return (
        e.select(F.col("a"), F.col("b"))
        .unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _gamma_min(e_sym: DataFrame) -> DataFrame:
    """min(Γ⁺(u)) per node over a symmetric edge list."""
    return (
        e_sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(e_sym.select(F.col("a").alias("u"), F.col("a").alias("v")))
        .groupBy("u")
        .agg(F.min("v").alias("m"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    # large-star is defined over the undirected neighborhood — symmetrize
    # every round (small-star's output is directed larger→smaller)
    e_sym = _sym(e)
    mins = _gamma_min(e_sym)
    return (
        e_sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # orient edges (u = max, v = min); connect each small neighbor + u to min
    oriented = e.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).distinct()
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbr = oriented.join(mins, "u").select(
        F.col("v").alias("a"), F.col("m").alias("b")
    )
    selfe = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return nbr.unionByName(selfe).filter(F.col("a") != F.col("b")).distinct()


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
                   F.lit(0).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(pairs: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """(a, b) edge list → (node, component) with component = min reachable id.

    Ids may be longs or strings (min is numeric or lexicographic
    respectively — deterministic either way).
    """
    nodes = (
        pairs.select(F.col("a").alias("node"))
        .unionByName(pairs.select(F.col("b").alias("node")))
        .distinct()
    )
    e = pairs.filter(F.col("a") != F.col("b")).distinct().localCheckpoint(eager=True)
    prev = _checksum(e)
    for _ in range(max_rounds):
        e = _large_star(e)
        e = _small_star(e).localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    # after convergence every edge points node → its component minimum
    comp = (
        e.select(F.col("a").alias("node"), F.col("b").alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    return (
        nodes.join(comp, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def with_singletons(components: DataFrame, universe: DataFrame) -> DataFrame:
    """Extend a component mapping to the full universe ((id) DataFrame):
    ids that appear in no pair become their own component."""
    key = universe.columns[0]
    return (
        universe.select(F.col(key).alias("node"))
        .join(components, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


# ---- CPG symbol canonicalization -----------------------------------------

def _deref(col):
    return F.regexp_replace(F.regexp_replace(col, r"\*", ""), r"\s+$", "")


def symbol_mention_graph(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Alias pairs (a, b) over symbol full_names."""
    # raw pointer spellings live in type_full_name on declarations/expressions
    # (TYPE rows are already dereferenced by TypeNodePass) — alias each raw
    # spelling to its dereferenced canonical form
    spellings = (
        nodes.select(F.col("type_full_name").alias("a"))
        .filter(F.col("a").isNotNull() & (F.col("a") != ""))
        .unionByName(
            nodes.filter(F.col("kind").isin("TYPE", "TYPE_DECL"))
            .select(F.col("full_name").alias("a"))
        )
        .distinct()
    )
    deref_pairs = spellings.select("a", _deref(F.col("a")).alias("b")).filter(
        (F.col("a") != F.col("b")) & (F.col("b") != "")
    )
    ids = nodes.select("node_id", "full_name")
    alias_edges = (
        edges.filter(F.col("kind") == "ALIAS_OF")
        .join(ids.withColumnRenamed("node_id", "src"), "src")
        .withColumnRenamed("full_name", "a")
        .join(ids.withColumnRenamed("node_id", "dst"), "dst")
        .withColumnRenamed("full_name", "b")
        .select("a", "b")
        .filter(F.col("a") != F.col("b"))
    )
    return deref_pairs.unionByName(alias_edges).distinct()


def canonical_symbols(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """(full_name, canonical) for every aliased symbol group."""
    mentions = symbol_mention_graph(nodes, edges)
    comp = connected_components(mentions)
    return comp.select(
        F.col("node").alias("full_name"), F.col("component").alias("canonical")
    )
