"""Pipeline operators (the reference's CPG passes, re-expressed Spark-first).

Stage order mirrors the reference overlay order (``X2Cpg.scala:344-355``):
ast → base → controlflow → typerel/callgraph → dataflow; each stage is a pure
DataFrame → DataFrame transformation (no mutation — union of new rows).
"""
