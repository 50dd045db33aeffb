"""pysrc-mini frontend (F15): <module> method, indentation blocks,
constructor-call type inference.

Reference parity targets: ``pysrc2cpg/PythonAstVisitor.scala:95-110``
(module-method convention), ``ContextStack.scala:170-179`` (first assignment
declares a scope LOCAL), and the linker split shared with the JS frontend:
CHA for lattice-typed receivers, NaiveCallLinker for bare-name leftovers.
"""

import pyspark.sql.functions as F
import pytest

from joern_spark.frontend.lowering import detect_language, lower_doc

F15 = "fixtures/py/app.py"


def test_detect_language_py():
    assert detect_language("a.py", "") == "py"
    assert detect_language("d", "def f(x):\n    return x\n") == "py"
    # C stays C: no def-colon header
    assert detect_language("d", "int f(int x) { return x; }") == "c"


def _lower(src: str):
    return lower_doc("d.py", [
        {"kind": "code", "text": src, "media_ref": "", "offset": 0}])


def test_py_module_method_and_locals():
    src = "import m\nx = 1\ny = x + 2\n"
    nodes, _, _ = _lower(src)
    methods = {n["full_name"] for n in nodes if n["kind"] == "METHOD"}
    assert methods == {"<module>"}
    # first assignment declares a module-level LOCAL (ContextStack.scala:174)
    locals_ = {n["name"] for n in nodes if n["kind"] == "LOCAL"}
    assert locals_ == {"x", "y"}
    assert [n["name"] for n in nodes if n["kind"] == "IMPORT"] == ["m"]


def test_py_def_class_inherits():
    src = (
        "class A:\n"
        "    def m(self, v):\n"
        "        return v\n"
        "class B(A):\n"
        "    def m(self, v):\n"
        "        return v + 1\n"
    )
    nodes, edges, _ = _lower(src)
    methods = {n["full_name"] for n in nodes if n["kind"] == "METHOD"}
    assert methods == {"A.m", "B.m"}
    decls = {n["name"]: n for n in nodes if n["kind"] == "TYPE_DECL"}
    assert set(decls) == {"A", "B"}
    assert sum(1 for e in edges if e["kind"] == "INHERITS_FROM") == 1
    # self parameter is typed with the enclosing class
    selfs = {n["type_full_name"] for n in nodes
             if n["kind"] == "METHOD_PARAMETER_IN" and n["name"] == "self"}
    assert selfs == {"A", "B"}


def test_py_constructor_call_inference():
    src = (
        "class K:\n"
        "    def m(self, y):\n"
        "        return y\n"
        "k = K()\n"
        "out = k.m(2)\n"
        "other = mystery.m(3)\n"
    )
    nodes, _, _ = _lower(src)
    by_name = {}
    for n in nodes:
        if n["kind"] == "CALL" and not n["name"].startswith("<operator>"):
            by_name.setdefault(n["name"], []).append(n)
    # lattice-typed receiver → CHA-resolvable dotted name
    km = [n for n in by_name["m"] if n["full_name"] == "K.m"]
    assert len(km) == 1 and km[0]["dispatch_type"] == "DYNAMIC_DISPATCH"
    # unknown receiver stays a bare name (naive/hint workload)
    bare = [n for n in by_name["m"] if n["full_name"] == "m"]
    assert len(bare) == 1
    locals_ = {n["name"]: n["type_full_name"] for n in nodes
               if n["kind"] == "LOCAL"}
    assert locals_["k"] == "K"


def test_py_control_flow_shapes():
    src = (
        "def f(xs, q):\n"
        "    t = 0\n"
        "    for i in xs:\n"
        "        t = t + i\n"
        "    if q > 0:\n"
        "        t = t + 1\n"
        "    elif q < 0:\n"
        "        t = 0\n"
        "    else:\n"
        "        t = t - 1\n"
        "    while t > 10:\n"
        "        t = t - 2\n"
        "    return t\n"
    )
    nodes, _, _ = _lower(src)
    ctrls = [n for n in nodes if n["kind"] == "CONTROL_STRUCTURE"]
    # for → WHILE (iterator-protocol mini-lowering), if, elif, 2× else, while
    assert len(ctrls) == 6
    # the for-loop binding is the loop condition: i = xs each iteration
    binds = [n for n in nodes if n["kind"] == "CALL"
             and n["name"] == "<operator>.assignment" and "i in xs" in n["code"]]
    assert len(binds) == 1


@pytest.fixture(scope="module")
def py_nodes(cpg):
    return cpg.nodes.filter(F.col("doc_id") == F15)


def test_py_decorator_lowering():
    """``@dec`` → `f = dec(f)` rebinding with a METHOD_REF argument
    (pysrc2cpg decorator-to-call conversion; round-5 depth work)."""
    src = "@trace\ndef fx(x):\n    return x\n"
    nodes, _, _ = _lower(src)
    methods = {n["full_name"] for n in nodes if n["kind"] == "METHOD"}
    assert "fx" in methods
    asg = [n for n in nodes if n["kind"] == "CALL"
           and n["code"] == "fx = trace(fx)"]
    assert asg
    refs = [n for n in nodes if n["kind"] == "METHOD_REF"]
    assert refs and refs[0]["full_name"] == "fx"
    dec_calls = [n for n in nodes if n["kind"] == "CALL"
                 and n["name"] == "trace"]
    assert dec_calls


def test_py_comprehension_and_displays():
    src = ("def g(items):\n"
           "    q = [v + 2 for v in items if v > 0]\n"
           "    d = {1: q}\n"
           "    return q\n")
    nodes, _, _ = _lower(src)
    ll = [n for n in nodes if n["kind"] == "CALL"
          and n["name"] == "<operator>.listLiteral"]
    assert len(ll) == 1
    assert ll[0]["code"] == "[v + 2 for v in items if v > 0]"
    binds = [n for n in nodes if n["kind"] == "CALL"
             and n["code"] == "v = items"]
    assert binds  # per-iteration binding: def-of-v-from-items precedes body
    dl = [n for n in nodes if n["kind"] == "CALL"
          and n["name"] == "<operator>.dictLiteral"]
    assert len(dl) == 1


def test_py_try_except_with():
    src = ("def h(p):\n"
           "    try:\n"
           "        r = work(p)\n"
           "    except ValueError as e:\n"
           "        r = 0\n"
           "    finally:\n"
           "        log(r)\n"
           "    with open_ctx() as f:\n"
           "        f.write(r)\n"
           "    return r\n")
    nodes, _, _ = _lower(src)
    cs = {n["ctrl_type"] for n in nodes if n["kind"] == "CONTROL_STRUCTURE"}
    assert {"TRY", "CATCH", "FINALLY"} <= cs
    locs = {n["name"]: n["type_full_name"] for n in nodes
            if n["kind"] == "LOCAL"}
    assert locs.get("e") == "ValueError"
    assert "f" in locs
    binds = [n for n in nodes if n["kind"] == "CALL"
             and n["code"] == "f = open_ctx()"]
    assert binds


def test_py_kwargs_and_annotations():
    src = ("def k(a: int, scale=2, *args, **kw) -> int:\n"
           "    return a * scale\n"
           "def caller(z):\n"
           "    return k(z, scale=3)\n")
    nodes, _, _ = _lower(src)
    k = [n for n in nodes if n["kind"] == "METHOD" and n["name"] == "k"][0]
    params = [n["name"] for n in nodes
              if n["kind"] == "METHOD_PARAMETER_IN"
              and n["method_id"] == k["node_id"]]
    assert params == ["a", "scale", "args", "kw"]
    # kwarg is the VALUE expression — no phantom assignment to `scale`
    call = [n for n in nodes if n["kind"] == "CALL"
            and n["code"] == "k(z, scale=3)"]
    assert call
    phantom = [n for n in nodes if n["kind"] == "CALL"
               and n["name"] == "<operator>.assignment"
               and n["code"] == "scale=3"]
    assert not phantom


def test_py_fixture_in_pipeline(cpg, py_nodes):
    methods = {r["full_name"] for r in
               py_nodes.filter(F.col("kind") == "METHOD").collect()}
    assert {"<module>", "py_greet", "PWid.draw", "PWid.total",
            "PWidSub.draw"} <= methods


def test_py_callgraph_cha(cpg, py_nodes):
    """w = PWid(); w.draw(41) → CHA candidates PWid.draw AND
    PWidSub.draw (subclass closure), like DynamicCallLinker."""
    call = py_nodes.filter(
        (F.col("kind") == "CALL") & (F.col("full_name") == "PWid.draw"))
    call_ids = [r["node_id"] for r in call.collect()]
    assert len(call_ids) == 1
    dsts = (
        cpg.edges.filter((F.col("kind") == "CALL")
                         & F.col("src").isin(call_ids))
        .select("dst").collect()
    )
    dst_names = {
        r["full_name"] for r in cpg.nodes.filter(
            F.col("node_id").isin([d["dst"] for d in dsts])).collect()
    }
    assert {"PWid.draw", "PWidSub.draw"} <= dst_names


def test_py_except_tuple_and_dict_comprehension():
    """Round-5 review fixes: `except (A, B) as e:` binds e with the tuple
    type; dict/set comprehensions and multi-for list comprehensions stay
    inside their display (no leaked phantom control structures)."""
    src = ("def h2(p):\n"
           "    d = {k: 1 for k in p}\n"
           "    m = [a + b for a in p for b in p if a > b]\n"
           "    try:\n"
           "        r = work2(p)\n"
           "    except (ValueError, KeyError) as e:\n"
           "        r = 0\n"
           "    return r\n")
    nodes, _, _ = _lower(src)
    locs = {n["name"]: n["type_full_name"] for n in nodes
            if n["kind"] == "LOCAL"}
    assert locs.get("e") == "ValueError,KeyError"
    dl = [n for n in nodes if n["kind"] == "CALL"
          and n["name"] == "<operator>.dictLiteral"]
    assert dl and dl[0]["code"] == "{k: 1 for k in p}"
    ll = [n for n in nodes if n["kind"] == "CALL"
          and n["name"] == "<operator>.listLiteral"]
    assert ll and ll[0]["code"] == "[a + b for a in p for b in p if a > b]"
    # both iteration bindings present, body after them
    binds = [n["code"] for n in nodes if n["kind"] == "CALL"
             and n["code"] in ("a = p", "b = p")]
    assert sorted(binds) == ["a = p", "b = p"]
    # no phantom loop from leaked 'for' tokens: only TRY/CATCH here
    cs = sorted({n["ctrl_type"] for n in nodes
                 if n["kind"] == "CONTROL_STRUCTURE"})
    assert cs == ["CATCH", "TRY"]
