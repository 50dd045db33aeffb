"""joern_spark — a from-scratch, PySpark-native code-property-graph-as-knowledge-graph
triple factory with the query/data-processing capabilities of TheGreatAutomata/joern.

The reference (read-only at /root/reference) is a Scala/OverflowDB property-graph
engine; this package re-expresses what it *computes* as idiomatic Spark:

- per-document parse/AST construction = vectorized ``mapInPandas`` over an
  interleaved-span document table (reference: per-file ConcurrentWriterCpgPass,
  ``x2cpg/.../passes/AstCreationPass.scala``),
- linking passes = DataFrame joins (broadcast for dimension-sized symbol tables,
  salted/AQE for hot keys; reference: ``x2cpg/.../utils/LinkingUtil.scala``),
- per-method CFG / reaching-definitions = ``applyInPandas`` group kernels
  (reference: ``CfgCreator.scala``, ``ReachingDefProblem.scala``),
- materialization = partitioned parquet tables (``nodes``/``edges``/``triples``)
  with per-partition lineage rows and resumable stage manifests.
"""

__version__ = "0.1.0"
