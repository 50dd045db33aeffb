"""Reaching-def / DDG golden tests.

Mirrors the reference's ReachingDefTests + DataFlowTests
(c2cpg/src/test/.../dataflow/DataFlowTests.scala:13-60): assert REACHING_DEF
edge endpoints on the canonical flow() program and loop-carried defs in
free_list(). Edge semantics: DdgGenerator.scala:30-217 (entry edges, def→use,
defs reach RET, VARIABLE property from UsageAnalyzer.sameVariable).
"""

from tests.conftest import F1, F2


def test_flow_def_use_chain(g):
    rd = g.rd_pairs(F1)
    # the canonical chain a=p0 → b=a → z=b+c → z++ → x=z → return x,
    # carried through identifier defs/uses
    assert ("p0", "a = p0") in rd
    assert ("a", "b=a") in rd
    assert ("b", "b + c") in rd
    assert ("c", "b + c") in rd
    assert ("z", "z++") in rd
    assert ("z", "x = z") in rd
    assert ("x", "return x") in rd


def test_flow_entry_edges(g):
    """Method entry taints its parameters (DdgGenerator.scala:47-54)."""
    rd = g.rd_pairs(F1)
    assert ("int flow(int p0)", "p0") in rd or ("int flow(int p0)", "int p0") in rd


def test_flow_defs_reach_exit(g):
    """Definitions reach METHOD_RETURN (DdgGenerator.scala:147-152)."""
    rd = g.rd_pairs(F1)
    assert ("x", "RET") in rd
    assert ("return x", "RET") in rd


def test_flow_variable_property(g):
    """REACHING_DEF carries the VARIABLE edge property (DdgGenerator.scala:227)."""
    rd = g.rd(F1)
    assert ("x", "return x", "x") in rd
    assert ("p0", "a = p0", "p0") in rd


def test_no_false_transitive_skip(g):
    """b's def must not jump straight past its redefinition sites."""
    rd = g.rd_pairs(F1)
    # 'a' (defined at a = p0) is used only at b=a; it must not reach x = z
    assert ("a", "x = z") not in rd


def test_free_list_loop_carried(g):
    rd = g.rd_pairs(F2)
    # q defined in iteration k reaches p = q in iteration k+1 (back edge)
    assert ("q", "p = q") in rd
    # p defined by init/update reaches the condition and the body use
    assert ("p", "p != NULL") in rd
    assert ("p", "free(p)") in rd
    assert ("p", "p->next") in rd


def test_param_entry_free_list(g):
    rd = g.rd_pairs(F2)
    assert ("head", "p = head") in rd
