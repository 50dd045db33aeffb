"""jimple-mini frontend (F18): the bytecode-shaped twin.

Reference parity targets: ``jimple2cpg/.../AstForStatementsCreator.scala``
(identity statements emit no AST and redefine parameters as locals, :161-165;
3-address assignment lowering :59-85), ``AstForMethodsCreator.scala:63-67``
(parameters = the identity-bound body locals, @this at index 0),
``AstForExpressionsCreator.scala:71-75`` (constructor/static → STATIC,
instance invoke → DYNAMIC dispatch) — and the reference's own benchmark
discipline of running every suite source AND bytecode
(``benchmarks/README.md:28-45``).
"""

import pyspark.sql.functions as F

from joern_spark.frontend.jimple_parser import parse_jimple
from joern_spark.frontend.lowering import detect_language

F18 = "fixtures/jimple/Dispatch.jimple"


def test_detect_language_jimple():
    assert detect_language("a.jimple", "") == "jimple"
    assert detect_language("d", "r0 := @this: Foo;") == "jimple"
    assert detect_language("d", "virtualinvoke r0.<A: int f()>();") == "jimple"
    # Java stays Java: no identity statements / typed invokes
    assert detect_language("d", "class A { int f() { return 1; } }") == "java"


def _method(src: str, name: str):
    tops = parse_jimple(src)
    for t in tops:
        for n in t.walk():
            if n.kind == "METHOD" and n.name == name:
                return n
    raise AssertionError(f"no method {name}")


def test_identity_statements_become_parameters():
    src = """class A {
      public int f(int, int) {
        A r0; int i0, i1;
        r0 := @this: A;
        i0 := @parameter0: int;
        i1 := @parameter1: int;
        return i0;
      }
    }"""
    m = _method(src, "f")
    params = [c for c in m.children if c.kind == "METHOD_PARAMETER_IN"]
    # @this at argument_index 0, @parameterN at N+1 (AstForMethodsCreator)
    assert [(p.name, p.argument_index) for p in params] == [
        ("r0", 0), ("i0", 1), ("i1", 2)]
    assert params[0].type_full_name == "A"
    # identity-bound locals are NOT re-declared as LOCALs
    block = next(c for c in m.children if c.kind == "BLOCK")
    assert [c.kind for c in block.children] == ["RETURN"]
    assert m.full_name == "A.f"
    assert m.signature == "int(int,int)"


def test_invoke_dispatch_and_fullnames():
    src = """class B {
      public void g() {
        B r0; C r1; int i0;
        r0 := @this: B;
        r1 = new C;
        specialinvoke r1.<C: void <init>()>();
        i0 = virtualinvoke r1.<C: int run(int)>(3);
        staticinvoke <java.lang.Math: int abs(int)>(i0);
        return;
      }
    }"""
    m = _method(src, "g")
    calls = {}
    for n in m.walk():
        if n.kind == "CALL" and not n.name.startswith("<operator>"):
            calls[n.full_name] = n
    # constructor → STATIC even through specialinvoke (isConstructor first,
    # AstForExpressionsCreator.scala:72); instance → DYNAMIC; static → STATIC
    assert calls["C.<init>"].dispatch_type == "STATIC_DISPATCH"
    assert calls["C.run"].dispatch_type == "DYNAMIC_DISPATCH"
    assert calls["C.run"].signature == "int(int)"
    # qualified class simple-named for linker keying
    assert calls["Math.abs"].dispatch_type == "STATIC_DISPATCH"
    # receiver child at argument_index 0
    recv = [c for c in calls["C.run"].children if c.is_receiver]
    assert len(recv) == 1 and recv[0].argument_index == 0


def test_three_address_operators():
    src = """class D {
      public int h(int) {
        int i0, i1; int[] a0;
        i0 := @parameter0: int;
        a0 = newarray (int)[i0];
        i1 = a0[0];
        i1 = i1 cmp i0;
        i1 = (int) i1;
        i1 = lengthof a0;
        i1 = neg i1;
        return i1;
      }
    }"""
    m = _method(src, "h")
    ops = [n.name for n in m.walk()
           if n.kind == "CALL" and n.name.startswith("<operator>")]
    assert ops.count("<operator>.assignment") == 6
    assert "<operator>.alloc" in ops            # newarray → alloc (scala:157)
    assert "<operator>.indexAccess" in ops
    assert "<operator>.compare" in ops          # cmp/cmpg/cmpl (scala:49-51)
    assert "<operator>.cast" in ops
    assert "<operator>.lengthOf" in ops
    assert "<operator>.minus" in ops            # NegExpr (scala:27)


def test_goto_labels_and_switch():
    src = """class E {
      public int k(int) {
        int i0;
        i0 := @parameter0: int;
        lookupswitch(i0) { case 1: goto one; default: goto other; };
      one:
        return 1;
      other:
        if i0 > 5 goto one;
        return i0;
      }
    }"""
    m = _method(src, "k")
    kinds = [n.kind for n in m.walk()]
    assert kinds.count("JUMP_TARGET") == 4      # one, other + case 1, default
    ctrls = [n.ctrl_type for n in m.walk() if n.kind == "CONTROL_STRUCTURE"]
    assert ctrls.count("SWITCH") == 1
    assert ctrls.count("GOTO") == 3
    assert ctrls.count("IF") == 1


# ---- pipeline-level (session fixture includes F18) --------------------------

def test_jimple_cha_and_static_link(g):
    """virtualinvoke on the DECLARED class resolves to it and its override
    (CHA over INHERITS_FROM); staticinvoke resolves exactly."""
    names = g.nodes["full_name"]  # indexed by node_id
    call_edges = g.edges[(g.edges["kind"] == "CALL")
                         & (g.edges["doc_id"] == F18)]
    callees = {names.get(d) for d in call_edges["dst"]}
    assert {"JAnimal.jnoise", "JDog.jnoise", "JKennel.jtally",
            "JDog.<init>"} <= callees


def test_jimple_inherits_and_members(g):
    n = g.nodes[g.nodes["doc_id"] == F18]
    decls = set(n[n["kind"] == "TYPE_DECL"]["name"])
    assert decls == {"JAnimal", "JDog", "JKennel"}
    assert "jbark" in set(n[n["kind"] == "MEMBER"]["name"])
    inh = g.edges[(g.edges["kind"] == "INHERITS_FROM")
                  & (g.edges["doc_id"] == F18)]
    assert len(inh) == 1  # JDog -> JAnimal (Object roots filtered)


def test_jimple_loop_cfg(g):
    """jmain's if-goto loop: the IF condition must have two CFG successors
    (loop body and jdone fall-through) and the loop-closing goto must jump
    back — i.e. the condition call has an incoming CFG edge from later code."""
    n = g.nodes[g.nodes["doc_id"] == F18]
    cond_ids = n.index[(n["kind"] == "CALL")
                       & (n["name"] == "<operator>.lessEqualsThan")]
    assert len(cond_ids) == 1
    cid = cond_ids[0]
    cfg = g.edges[(g.edges["kind"] == "CFG") & (g.edges["doc_id"] == F18)]
    assert len(cfg[cfg["src"] == cid]) == 2
    # the loop back-edge lands on the jloop JUMP_TARGET, which is the
    # condition's predecessor: entry fall-through + closing goto
    tgt_ids = n.index[(n["kind"] == "JUMP_TARGET") & (n["name"] == "jloop")]
    assert len(tgt_ids) == 1
    assert len(cfg[cfg["dst"] == tgt_ids[0]]) >= 2


def test_jimple_param_dataflow(g):
    """i0 := @parameter0 makes the parameter the def of every i0 use: a
    REACHING_DEF edge must leave jtally's METHOD_PARAMETER_IN (found via the
    AST edge — method_id goes through float64 in pandas, node ids must not)."""
    n = g.nodes[g.nodes["doc_id"] == F18]
    mids = n.index[(n["kind"] == "METHOD") & (n["name"] == "jtally")]
    assert len(mids) == 1
    ast = g.edges[(g.edges["kind"] == "AST") & (g.edges["src"] == mids[0])]
    pids = [d for d in ast["dst"]
            if d in n.index and n.loc[d, "kind"] == "METHOD_PARAMETER_IN"]
    assert [n.loc[p, "name"] for p in pids] == ["i0"]
    rd = g.edges[(g.edges["kind"] == "REACHING_DEF")
                 & (g.edges["doc_id"] == F18)]
    assert len(rd[rd["src"] == pids[0]]) >= 1
