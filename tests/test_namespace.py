"""NamespaceCreator tests (SURVEY.md §2.A #5): Java packages →
NAMESPACE_BLOCK per file, grouped into NAMESPACE nodes with REF edges."""

import pytest
from pyspark.sql import functions as F

from joern_spark.corpus import docs_df, split_code_spans
from joern_spark.pipeline import run_pipeline

A_SRC = """package com.acme.core;
import java.util.List;
class Alpha { int a() { return 1; } }"""

B_SRC = """package com.acme.core;
class Beta { int b() { return 2; } }"""

C_SRC = """package org.other;
class Gamma { int g() { return 3; } }"""


@pytest.fixture(scope="module")
def ns_cpg(spark):
    docs = docs_df(spark, [
        {"doc_id": "ns/A.java", "spans": split_code_spans(A_SRC, 2)},
        {"doc_id": "ns/B.java", "spans": split_code_spans(B_SRC, 1)},
        {"doc_id": "ns/C.java", "spans": split_code_spans(C_SRC, 1)},
    ])
    return run_pipeline(spark, docs, n_parts=2, with_dataflow=False)


def test_namespace_blocks_per_file(ns_cpg):
    blocks = ns_cpg.nodes.filter(F.col("kind") == "NAMESPACE_BLOCK")
    rows = [(r["doc_id"], r["name"]) for r in blocks.collect()]
    assert sorted(rows) == [
        ("ns/A.java", "com.acme.core"),
        ("ns/B.java", "com.acme.core"),
        ("ns/C.java", "org.other"),
    ]


def test_one_namespace_per_name(ns_cpg):
    ns = ns_cpg.nodes.filter(F.col("kind") == "NAMESPACE")
    assert sorted(r["name"] for r in ns.collect()) == ["com.acme.core", "org.other"]


def test_ref_edges_group_blocks(ns_cpg):
    ns = {r["node_id"]: r["name"]
          for r in ns_cpg.nodes.filter(F.col("kind") == "NAMESPACE").collect()}
    blocks = {r["node_id"]: r["doc_id"]
              for r in ns_cpg.nodes.filter(F.col("kind") == "NAMESPACE_BLOCK").collect()}
    refs = [
        (blocks[r["src"]], ns[r["dst"]])
        for r in ns_cpg.edges.filter(F.col("kind") == "REF").collect()
        if r["src"] in blocks and r["dst"] in ns
    ]
    assert sorted(refs) == [
        ("ns/A.java", "com.acme.core"),
        ("ns/B.java", "com.acme.core"),
        ("ns/C.java", "org.other"),
    ]


def test_classes_sit_under_block(ns_cpg):
    # id-safe: resolve the parent via a Spark join (pandas floats corrupt ids)
    decls = ns_cpg.nodes.filter(
        (F.col("kind") == "TYPE_DECL") & (F.col("name") == "Alpha")
    ).select(F.col("parent_id").alias("node_id"))
    parents = decls.join(ns_cpg.nodes, "node_id")
    assert [r["kind"] for r in parents.collect()] == ["NAMESPACE_BLOCK"]


def test_methods_still_parse_inside_package(ns_cpg):
    methods = ns_cpg.nodes.filter(F.col("kind") == "METHOD")
    assert {r["name"] for r in methods.collect()} >= {"a", "b", "g"}
