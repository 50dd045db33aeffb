"""Traversal query DSL over the CPG DataFrames (SURVEY.md §2.B).

The reference's query language is a Scala iterator-combinator chain over the
in-memory graph (``semanticcpg/.../language/NodeTypeStarters.scala:19-328``,
``AstNodeTraversal.scala``, ``CfgNodeMethods.scala``). Here a traversal is a
``CpgQuery`` value wrapping a nodes-DataFrame frontier plus the graph tables;
every step is a pure DataFrame transformation (label scans = partition-
prunable filters, edge steps = equi-joins, transitive closures = bounded
iterative joins), so Catalyst sees one declarative plan per query.
"""

from .dsl import Cpg, CpgQuery

__all__ = ["Cpg", "CpgQuery"]
