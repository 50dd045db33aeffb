"""CFG golden successor-set tests.

Mirrors the reference's CfgTestFixture.succOf style
(x2cpg/src/test/.../testfixtures/CfgTestFixture.scala:45-70): for each node
identified by its code string, assert the exact set of CFG successor code
strings. Semantics under test come from CfgCreator.scala:41-627 — argument
evaluation before the enclosing call, short-circuit &&/||, ternary branches,
loop back-edges, do/while, switch with break, method entry/exit wiring.
"""

from tests.conftest import F1, F2, F4


# ---- straight-line (flow.c) ------------------------------------------------

def test_flow_entry_and_exit(g):
    assert g.succ_of(F1, "int flow(int p0)") == {"a"}
    assert g.succ_of(F1, "return x") == {"RET"}


def test_flow_assignment_chain(g):
    # target evaluates, then RHS, then the assignment call, then next statement
    # (succ_of unions over both identifiers spelled 'a': in `a = p0` and `b=a`)
    assert g.succ_of(F1, "a") == {"p0", "b=a"}
    assert g.succ_of(F1, "p0") == {"a = p0"}
    assert g.succ_of(F1, "a = p0") == {"b"}
    assert g.succ_of(F1, "b=a") == {"c"}
    assert g.succ_of(F1, "0x31") == {"c=0x31"}
    assert g.succ_of(F1, "b + c") == {"z = b + c"}
    assert g.succ_of(F1, "z++") == {"x"}
    assert g.succ_of(F1, "x = z") == {"x"}


# ---- for loop with break-out condition (free_list.c) -----------------------

def test_for_loop_condition_branches(g):
    # p != NULL: true → loop body (q of q = p->next), false → method exit
    assert g.succ_of(F2, "p != NULL") == {"q", "RET"}


def test_for_loop_back_edge(g):
    # update p = q flows back to the condition's first operand
    assert g.succ_of(F2, "p = q") == {"p"}
    assert g.succ_of(F2, "free(p)") == {"p"}  # next stmt is update expr's read of p … via loop


def test_for_init_enters_condition(g):
    assert g.succ_of(F2, "p = head") == {"p"}


# ---- control-structure zoo -------------------------------------------------

def test_if_branches(g):
    # if (x < 10): true → then-body (x of x += 1), false → else-body (x of x -= 1);
    # both targets are spelled 'x' so count successors at node-id level
    nodes = g.doc_nodes(F4)
    cond_id = nodes[nodes["code"] == "x < 10"].index[0]
    e = g.doc_edges(F4, "CFG")
    assert len(e[e["src"] == cond_id]) == 2
    assert g.succ_of(F4, "x < 10") == {"x"}


def test_while_condition_branches(g):
    # while (x > 0) {...}: one of the x > 0 nodes branches into body and out
    succs = [g.succ_of(F4, c) for c in ["x > 0"]]
    # both x > 0 occurrences (while cond, && lhs) exist; union covers 3+ targets
    assert len(succs[0]) >= 2


def test_do_while(g):
    # do { x++ } while (x < 3): condition true → body (x of x++), false → next
    assert "x" in g.succ_of(F4, "x < 3")
    assert g.succ_of(F4, "x++") == {"x"}


def test_switch_cases(g):
    # switch jump targets flow into their statements
    assert g.succ_of(F4, "case 1:") == {"x"}
    assert g.succ_of(F4, "default:") == {"x"}
    assert g.succ_of(F4, "x = 2") == {"break;"}


def test_ternary_branches(g):
    # (cond) ? x : 0 — both branch values flow into the conditional call
    assert "(x > 0 && x < 100) ? x : 0" in g.succ_of(F4, "x")
    assert "(x > 0 && x < 100) ? x : 0" in g.succ_of(F4, "0")


def test_short_circuit_and(g):
    # x > 0 && x < 100: lhs false → the && node directly; lhs true → rhs
    succ = g.succ_of(F4, "x > 0")
    assert "x > 0 && x < 100" in succ  # short-circuit edge


def _kernel_cfg(src: str):
    """Kernel-level succOf helper (no Spark) for extra control-flow cases."""
    from joern_spark.corpus import split_code_spans
    from joern_spark.frontend.lowering import lower_doc
    from joern_spark.operators.cfg_pass import cfg_edges_for_method

    nodes, _, _ = lower_doc("k", split_code_spans(src, 2))
    code = {n["node_id"]: (n["code"] or n["kind"]) for n in nodes}
    mid = [n["node_id"] for n in nodes if n["kind"] == "METHOD"][0]
    rows = [n for n in nodes if n.get("method_id") == mid]
    return {(code[s], code[d]) for s, d in cfg_edges_for_method(rows)}


def test_goto_label_resolution():
    """withResolvedJumpToLabel (Cfg.scala:77-97): goto jumps to its label."""
    edges = _kernel_cfg(
        "int jumpy(int x) {\n  if (x > 0) goto done;\n  x = x + 1;\n"
        "done:\n  return x;\n}"
    )
    assert ("goto done;", "done:") in edges
    assert ("done:", "x") in edges
    assert ("x = x + 1", "done:") in edges  # fallthrough into the label


def test_continue_targets_loop_update():
    """ContinueEdges land on the for-update expression (CfgCreator.scala:364-394)."""
    edges = _kernel_cfg(
        "int skippy(int n) {\n  int s = 0;\n"
        "  for (int i = 0; i < n; i++) {\n    if (i == 3) continue;\n"
        "    s = s + i;\n  }\n  return s;\n}"
    )
    assert ("continue;", "i") in edges  # i of i++
    assert ("i == 3", "continue;") in edges


def test_switch_fallthrough():
    """Case without break falls through to the next case's statements
    (CfgCreator.scala:591-616 case-edge semantics)."""
    edges = _kernel_cfg(
        "int f(int x) { switch(x) { case 1: x=2; case 2: x=3; break; } return x; }"
    )
    assert ("x=2", "case 2:") in edges  # fallthrough, NOT straight to exit
    assert ("x=3", "break;") in edges
    # scrutinee fans out to every case label
    assert ("x", "case 1:") in edges and ("x", "case 2:") in edges


def test_infinite_for_loop():
    """for(;;): no condition — entry flows straight into the body; only
    break exits (CfgCreator.scala:364-394 with empty condition)."""
    edges = _kernel_cfg("int f() { for(;;) { break; } return 0; }")
    assert ("int f()", "break;") in edges
    assert ("break;", "0") in edges  # break exits to the statement after


def test_operator_lowering_extras():
    """sizeof / indexAccess / addressOf / indirection / cast lowering
    (AstForExpressionsCreator.scala:13-58 + operatorextension taxonomy)."""
    from joern_spark.corpus import split_code_spans
    from joern_spark.frontend.lowering import lower_doc

    cases = {
        "int f() { int x; return sizeof(x); }": "<operator>.sizeOf",
        # c2cpg lowers C subscripts through the pointer form
        # (AstForExpressionsCreator.scala:189-190)
        "int f(int *a, int i) { return a[i]; }": "<operator>.indirectIndexAccess",
        "int f() { int x; int *p = &x; return *p; }": "<operator>.addressOf",
        "int f(double d) { return (int) d; }": "<operator>.cast",
    }
    for src, op in cases.items():
        nodes, _, _ = lower_doc("k.c", split_code_spans(src, 1))
        ops = {n["name"] for n in nodes if n["kind"] == "CALL"}
        assert op in ops, f"{op} not lowered in {src!r}: {ops}"


def test_cfg_connectivity_every_method(g):
    """Every CFG node is reachable from its METHOD entry (no orphan islands)."""
    for doc in [F1, F2, F4]:
        edges = g.edge_codes(doc, "CFG")
        nodes_with_cfg = {s for s, _ in edges} | {d for _, d in edges}
        entries = {
            c for c in nodes_with_cfg
            if not any(d == c for _, d in edges)
        }
        # walk forward from entries
        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
        seen = set(entries)
        stack = list(entries)
        while stack:
            cur = stack.pop()
            for nxt in adj.get(cur, ()):
                if nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        assert seen == nodes_with_cfg, f"unreachable CFG nodes in {doc}: {nodes_with_cfg - seen}"


# ---- try/catch/finally fan-out (CfgCreationPassTests.scala:515-545) --------

def test_try_single_catch(g):
    from tests.conftest import F9
    # try fringe fans out to the catch entry AND (no finally) the method exit
    assert g.succ_of(F9, "a") == {"b", "RET"}
    assert g.succ_of(F9, "b") == {"RET"}
    assert g.succ_of(F9, "int try1()") == {"a"}


def test_try_multiple_catches(g):
    from tests.conftest import F9
    # try body → every catch entry + exit; catches flow only to the exit
    assert g.succ_of(F9, "c") == {"d", "e", "f", "RET"}
    assert g.succ_of(F9, "d") == {"RET"}
    assert g.succ_of(F9, "e") == {"RET"}
    assert g.succ_of(F9, "f") == {"RET"}


def test_try_catch_finally(g):
    from tests.conftest import F9
    # with a finally: try → catch + finally; catch → finally (never the exit)
    assert g.succ_of(F9, "g") == {"h", "i"}
    assert g.succ_of(F9, "h") == {"i"}
    assert g.succ_of(F9, "i") == {"RET"}
