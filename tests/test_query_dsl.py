"""Query-DSL tests (SURVEY.md §2.B traversal steps as DataFrame combinators).

Mirrors the reference's querying suites
(c2cpg/src/test/.../querying/ — MethodTests, CallGraphQueryTests, AstTests).
"""

import pytest

from joern_spark.query import Cpg
from tests.conftest import F1, F3, F4


@pytest.fixture(scope="session")
def q(cpg) -> Cpg:
    return Cpg(nodes=cpg.nodes, edges=cpg.edges)


def _codes(query):
    return {r["code"] for r in query.l()}


def _names(query):
    return {r["name"] for r in query.l()}


def test_method_starter(q):
    assert "flow" in _names(q.method())
    assert _names(q.method("^flow$")) == {"flow"}


def test_ast_children_of_method(q):
    kids = q.method("^flow$").ast_children()
    kinds = {r["kind"] for r in kids.l()}
    # paramOut synthesized by MethodDecoratorPass (ref #9) is AST-attached too
    assert kinds == {"METHOD_PARAMETER_IN", "METHOD_PARAMETER_OUT", "BLOCK", "METHOD_RETURN"}


def test_ast_transitive_closure(q, g):
    # .ast from the flow method reaches every node the method contains
    in_method = q.method("^flow$").ast()
    got = {r["node_id"] for r in in_method.l()}
    flow_method = [r for r in q.method("^flow$").l()][0]
    expected = set(
        g.nodes[(g.nodes["method_id"] == flow_method["node_id"])].index
    ) - {flow_method["node_id"]}
    assert expected <= got


def test_ast_parent(q):
    parents = q.call().code_exact("b + c").ast_parent()
    assert "z = b + c" in _codes(parents)


def test_cfg_next(q):
    nxt = q.all().code_exact("return x").cfg_next()
    assert "RET" in _codes(nxt)


def test_argument_step(q):
    args = q.call().code_exact("print_number(42)").argument(1)
    assert _codes(args) == {"42"}


def test_callee_and_caller(q):
    callees = q.call().code_exact("print_number(42)").callee()
    assert _names(callees) == {"print_number"}
    callers = q.method("^print_number$").caller()
    assert "main" in _names(callers)


def test_method_calls_step(q):
    called = q.method("^main$").calls()
    assert "print_number" in _names(called)


def test_owner_method(q):
    owners = q.call().code_exact("z = b + c").method()
    assert _names(owners) == {"flow"}


def test_assignment_operator_view(q, g):
    flow_assigns = [
        r for r in q.assignment().l() if r["doc_id"] == F1
    ]
    # 5 plain assignments + z++ (postIncrement is in the assignment family)
    assert len(flow_assigns) == 6


def test_array_access_operator_view(q):
    """arrayAccess starter (operatorextension NodeTypeStarters.scala:23-26):
    F4's peek() subscripts lower to indirectIndexAccess (c2cpg spelling)."""
    rows = [r for r in q.array_access().l() if r["doc_id"] == F4]
    assert len(rows) == 3  # a[i] =, a[0], return a[i]
    assert {r["name"] for r in rows} == {"<operator>.indirectIndexAccess"}


def test_where_not_in(q):
    # whereNot: calls with no outgoing CALL edge — none on the fixture corpus
    from pyspark.sql import functions as F

    from joern_spark.query.dsl import CpgQuery

    linked = CpgQuery(
        q, q.edges.filter(F.col("kind") == "CALL").select(F.col("src").alias("node_id"))
    )
    assert q.call().where_not_in(linked).count() == 0


def test_is_external_filter(q):
    ext = q.method("^printf$").is_external(True)
    assert ext.count() >= 1


def test_control_structure_filter(q):
    ctrl = q.all().is_control_structure()
    assert {r["ctrl_type"] for r in ctrl.l() if r["doc_id"] == F4} >= {"IF", "WHILE", "DO", "SWITCH"}


def test_ddg_in(q):
    srcs = q.all().code_exact("return x").ddg_in()
    assert "x" in _codes(srcs)


def test_tag_step(q):
    tags = q.call("^printf$").tag("risky-sink")
    rows = tags.collect()
    assert len(rows) >= 1
    assert all(r["tag_name"] == "risky-sink" for r in rows)


def test_location_step(q, cpg):
    loc = q.call().code_exact("print_number(42)").location(cpg.spans)
    rows = loc.collect()
    assert len(rows) == 1
    assert "print_number(42)" in rows[0]["span_text"]


def test_repeat_combinator(q):
    two_up = q.all().code_exact("b + c").repeat(lambda s: s.ast_parent(), times=2)
    assert "BLOCK" in {r["kind"] for r in two_up.l()}
