"""XTypeRecovery-lite + FieldAccessLinker tests (SURVEY.md §2.A #20/#27)."""

import pytest
from pyspark.sql import functions as F

from joern_spark.corpus import docs_df, split_code_spans
from joern_spark.operators.ast_pass import parse_docs, split_rows
from joern_spark.operators.type_recovery import field_access_linker, type_recovery_pass

SRC = """class Point {
  int x;
  int y;
  int getX() { return this.x; }
  void setX(int v) { this.x = v; }
}
class Use {
  int f(Point p) { return p.x; }
  int g() { Point q = new Point(); return q.y; }
}"""


@pytest.fixture(scope="module")
def graph(spark):
    docs = docs_df(spark, [{"doc_id": "tr/Fields.java",
                            "spans": split_code_spans(SRC, 3)}])
    rows = parse_docs(docs).persist()
    nodes, edges, _ = split_rows(rows)
    return nodes.persist(), edges.persist()


def test_declared_param_type_recovered(graph):
    nodes, edges = graph
    rec = type_recovery_pass(nodes)
    typed = (
        nodes.filter((F.col("kind") == "IDENTIFIER") & (F.col("name") == "p"))
        .join(rec, "node_id")
    )
    assert {r["recovered_type"] for r in typed.collect()} == {"Point"}


def test_this_type_is_enclosing_class(graph):
    nodes, edges = graph
    rec = type_recovery_pass(nodes)
    typed = (
        nodes.filter((F.col("kind") == "IDENTIFIER") & (F.col("name") == "this"))
        .join(rec, "node_id")
    )
    assert {r["recovered_type"] for r in typed.collect()} == {"Point"}


def test_field_access_links_to_member(graph):
    nodes, edges = graph
    refs = field_access_linker(nodes, edges)
    n = nodes.toPandas().set_index("node_id")
    pairs = {
        (n.loc[r["src"], "code"], n.loc[r["dst"], "name"])
        for r in refs.collect()
    }
    assert ("p.x", "x") in pairs       # declared param type
    assert ("this.x", "x") in pairs    # this-binding (both methods)


def test_alloc_propagation_links_q(graph):
    """q = new Point(); q.y — type flows through the assignment round."""
    nodes, edges = graph
    refs = field_access_linker(nodes, edges)
    n = nodes.toPandas().set_index("node_id")
    pairs = {
        (n.loc[r["src"], "code"], n.loc[r["dst"], "name"])
        for r in refs.collect()
    }
    assert ("q.y", "y") in pairs


def test_no_cross_class_false_links(graph):
    """Members only link within the receiver's class (no name-only match)."""
    nodes, edges = graph
    refs = field_access_linker(nodes, edges)
    classes = nodes.filter(F.col("kind") == "TYPE_DECL").select(
        F.col("node_id").alias("c_id"), F.col("full_name").alias("c_full")
    )
    member_class = (
        nodes.filter(F.col("kind") == "MEMBER")
        .join(classes, F.col("parent_id") == F.col("c_id"))
        .select(F.col("node_id").alias("dst"), "c_full")
    )
    got = refs.join(member_class, "dst")
    assert {r["c_full"] for r in got.collect()} == {"Point"}
    assert got.count() == refs.count()
