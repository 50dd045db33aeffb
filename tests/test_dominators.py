"""Dominator / post-dominator / CDG golden tests.

Mirrors the reference semantics of CfgDominatorPass (DOMINATE = idom → node,
immediate only) and CdgPass (CDG c → n iff c ∈ post-dominance frontier of n).
"""

from tests.conftest import F1, F4


def test_straightline_dominator_chain(g):
    dom = g.edge_codes(F1, "DOMINATE")
    # each node's immediate dominator is its unique CFG predecessor
    assert ("int flow(int p0)", "a") in dom
    assert ("p0", "a = p0") in dom
    assert ("x", "return x") in dom
    assert ("return x", "RET") in dom


def test_straightline_has_no_cdg(g):
    assert g.edge_codes(F1, "CDG") == set()


def test_if_branches_dominated_by_condition(g):
    dom = g.edge_codes(F4, "DOMINATE")
    # both branch entries (the 'x' reads) have the condition as idom
    assert ("x < 10", "x") in dom


def test_branch_bodies_control_dependent_on_condition(g):
    cdg = g.edge_codes(F4, "CDG")
    assert ("x < 10", "x += 1") in cdg
    assert ("x < 10", "x -= 1") in cdg
    # the statement AFTER the if is not control-dependent on it
    assert ("x < 10", "x < 3") not in cdg


def test_loop_body_control_dependent_on_loop_condition(g):
    cdg = g.edge_codes(F4, "CDG")
    assert ("x == 5", "break;") in cdg  # break controlled by its if
    # x-- runs only when the break's condition is false → immediate
    # controller is x == 5 (x > 0 controls it transitively, not directly)
    assert ("x == 5", "x--") in cdg
    # inner if (re)evaluation is controlled by the while condition
    assert ("x > 0", "x == 5") in cdg


def test_post_dominators(g):
    pdom = g.edge_codes(F4, "POST_DOMINATE")
    # the node after the if join post-dominates the condition
    assert any(src in ("x", "5", "x == 5") and dst == "x < 10" for src, dst in pdom) or \
           ("x", "x < 10") in pdom


def test_method_entry_dominates_everything(g):
    """Transitively, the METHOD entry dominates every CFG node (walk the
    immediate-dominator tree up from each node)."""
    for doc in [F1, F4]:
        dom_edges = g.doc_edges(doc, "DOMINATE")
        idom = {d: s for s, d in zip(dom_edges["src"], dom_edges["dst"])}
        nodes = g.doc_nodes(doc)
        entries = set(nodes[nodes["kind"] == "METHOD"].index)
        for n in idom:
            cur, steps = n, 0
            while cur not in entries and steps < 500:
                assert cur in idom or cur in entries, f"dangling idom chain at {doc}"
                cur = idom[cur]
                steps += 1
            assert cur in entries


def test_dsl_controls_step(cpg):
    from joern_spark.query import Cpg

    q = Cpg(nodes=cpg.nodes, edges=cpg.edges)
    controlled = q.all().code_exact("x < 10").controls()
    codes = {r["code"] for r in controlled.l()}
    assert "x += 1" in codes and "x -= 1" in codes
