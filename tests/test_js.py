"""jssrc-mini frontend (F13): :program method, untyped-receiver linking.

Reference parity targets: ``JsSrc2Cpg.scala:29-65`` pass pipeline,
``AstForExpressionsCreator`` member/index access and ``Operators.alloc``,
``DependenciesPass.scala:14-35`` DEPENDENCY universe, and the linker split:
CHA for typed receivers, XTypeHintCallLinker for recovered ones,
NaiveCallLinker for bare-name leftovers.
"""

import pyspark.sql.functions as F
import pytest

from joern_spark.frontend.lowering import detect_language, lower_doc

F13 = "fixtures/js/app.js"


def test_detect_language():
    assert detect_language("a.js", "") == "js"
    assert detect_language("d", "function f() { return 1; }") == "js"
    assert detect_language("d", "const x = require('y');") == "js"
    # `class X` alone stays Java (both languages use it; Java hint wins
    # only when no JS marker is present)
    assert detect_language("d", "class A { int f() { return 1; } }") == "java"


def test_js_lowering_shape():
    js = (
        "const util = require('mod_a');\n"
        "function fn(a) { let x = a + 1; return x; }\n"
        "class K { m(y) { return y; } }\n"
        "let k = new K();\n"
        "let out = k.m(fn(2));\n"
    )
    nodes, edges, _ = lower_doc("d.js", [
        {"kind": "code", "text": js, "media_ref": "", "offset": 0}])
    by_kind = {}
    for n in nodes:
        by_kind.setdefault(n["kind"], []).append(n)
    methods = {n["full_name"] for n in by_kind["METHOD"]}
    assert {"fn", "K.m", ":program"} <= methods
    assert [n["name"] for n in by_kind["IMPORT"]] == ["mod_a"]
    ops = {n["name"] for n in by_kind["CALL"] if n["name"].startswith("<op")}
    assert "<operator>.alloc" in ops
    # `new K()` types the alloc; declaration transfers it to the local
    locals_ = {n["name"]: n["type_full_name"] for n in by_kind["LOCAL"]}
    assert locals_["k"] == "K"
    # the typed receiver makes `k.m` a CHA-resolvable dynamic call
    km = [n for n in by_kind["CALL"] if n["name"] == "m"]
    assert km[0]["full_name"] == "K.m"
    assert km[0]["dispatch_type"] == "DYNAMIC_DISPATCH"


def test_js_arrow_functions():
    """Arrow functions (round-5 depth work): named-binding arrows become
    statically-linkable named METHODs; anonymous ones hoist as `<lambda>N`
    with a METHOD_REF at the use site (jssrc2cpg nextClosureName)."""
    js = (
        "const add = (a, b) => a + b;\n"
        "let sq = x => { return x * x; };\n"
        "let z = add(sq(2), 3);\n"
        "reg(e => e + 1);\n"
    )
    nodes, edges, _ = lower_doc("d.js", [
        {"kind": "code", "text": js, "media_ref": "", "offset": 0}])
    methods = {n["full_name"]: n for n in nodes if n["kind"] == "METHOD"}
    assert {"add", "sq", "<lambda>2"} <= set(methods)
    # expression-body arrow lowers to `return a + b`
    add_rets = [n for n in nodes if n["kind"] == "RETURN"
                and n["code"] == "a + b"]
    assert add_rets
    refs = [n for n in nodes if n["kind"] == "METHOD_REF"]
    assert {r["full_name"] for r in refs} == {"add", "sq", "<lambda>2"}
    # `add(…)` is a bare-name static-dispatch call whose full_name matches
    # the named arrow METHOD — StaticCallLinker input shape (linking itself
    # runs in the pipeline, covered by test_callgraph)
    add_calls = [n for n in nodes if n["kind"] == "CALL"
                 and n["name"] == "add"]
    assert add_calls and add_calls[0]["full_name"] == "add"


def test_js_destructuring():
    js = "let {p, q: r} = src();\nlet [u, v] = pair();\nlog(p, r, u, v);\n"
    nodes, _, _ = lower_doc("d.js", [
        {"kind": "code", "text": js, "media_ref": "", "offset": 0}])
    locals_ = {n["name"] for n in nodes if n["kind"] == "LOCAL"}
    assert {"p", "r", "u", "v", "_tmp0", "_tmp1"} <= locals_
    calls = [n["code"] for n in nodes if n["kind"] == "CALL"
             and n["name"] == "<operator>.assignment"]
    assert "p = _tmp0.p" in calls and "r = _tmp0.q" in calls
    assert "u = _tmp1[0]" in calls and "v = _tmp1[1]" in calls


def test_js_template_literal():
    js = "let n = 7;\nlet msg = `n=${n + 1}!`;\n"
    nodes, _, _ = lower_doc("d.js", [
        {"kind": "code", "text": js, "media_ref": "", "offset": 0}])
    fmt = [n for n in nodes if n["kind"] == "CALL"
           and n["name"] == "<operator>.formatString"]
    assert len(fmt) == 1 and fmt[0]["code"] == "`n=${n + 1}!`"
    # interpolation parsed as a real expression AST
    adds = [n for n in nodes if n["kind"] == "CALL"
            and n["name"] == "<operator>.addition" and n["code"] == "n + 1"]
    assert adds
    lits = {n["code"] for n in nodes if n["kind"] == "LITERAL"}
    assert {"n=", "!"} <= lits


def test_js_member_index_access():
    js = "let o = po;\nlet a = o.field;\nlet b = o['key'];\nlet c = o[2];\n"
    nodes, _, _ = lower_doc("d.js", [
        {"kind": "code", "text": js, "media_ref": "", "offset": 0}])
    names = [n["name"] for n in nodes if n["kind"] == "CALL"]
    assert names.count("<operator>.fieldAccess") == 1
    assert names.count("<operator>.indexAccess") == 2


def test_js_not_null_assert():
    """`??=` lowers to notNullAssert (jssrc2cpg
    AstForExpressionsCreator.scala:187)."""
    js = "let z = 1;\nz ??= 7;\n"
    nodes, _, _ = lower_doc("d.js", [
        {"kind": "code", "text": js, "media_ref": "", "offset": 0}])
    calls = [n for n in nodes if n["kind"] == "CALL"
             and n["name"] == "<operator>.notNullAssert"]
    assert len(calls) == 1
    assert calls[0]["code"] == "z ??= 7"


@pytest.fixture(scope="module")
def js_callgraph(cpg):
    calls = cpg.edges.filter(F.col("kind") == "CALL").select("src", "dst")
    n = cpg.nodes.filter(F.col("doc_id") == F13) \
        .select("node_id", "code", "full_name")
    nm = cpg.nodes.select("node_id", "full_name")
    return {
        (r["call_code"], r["callee"])
        for r in calls
        .join(n.selectExpr("node_id as src", "code as call_code"), "src")
        .join(nm.selectExpr("node_id as dst", "full_name as callee"), "dst")
        .collect()
    }


def test_js_linker_split(js_callgraph):
    cg = js_callgraph
    # CHA over `extends`: typed receiver links to the impl AND the override
    assert ("h.render(41)", "Wid.render") in cg and ("h.render(41)", "WidSub.render") in cg
    # assignment-transfer hint (XTypeRecovery): `b = a = new Impl()` receivers
    # resolve through the recovered-type lattice — Impl.g only, no Sub
    assert ("b.tally(2)", "Wid.tally") in cg
    assert not any(code == "b.tally(2)" and callee != "Wid.tally"
                   for code, callee in cg)
    # bare-name leftover (NaiveCallLinker): untyped parameter receiver links
    # to every internal same-name method, external stub pruned
    assert ("obj.render(1)", "Wid.render") in cg and ("obj.render(1)", "WidSub.render") in cg
    assert not any(code == "obj.render(1)" and callee not in ("Wid.render", "WidSub.render")
                   for code, callee in cg)
    # plain function call
    assert ("greet('bob')", "greet") in cg


def test_js_dependencies(cpg):
    deps = {r["name"] for r in
            cpg.nodes.filter(F.col("kind") == "DEPENDENCY").collect()}
    assert "my_utils" in deps
    # IMPORT --IMPORTS--> DEPENDENCY (DependenciesPass + EdgeTypes.IMPORTS)
    imports = cpg.nodes.filter(
        (F.col("kind") == "IMPORT") & (F.col("doc_id") == F13))
    linked = (
        cpg.edges.filter(F.col("kind") == "IMPORTS")
        .join(imports.select(F.col("node_id").alias("src")), "src")
    )
    assert linked.count() == 1


def test_config_file_pass(cpg):
    """F14 package.json → one CONFIG_FILE node carrying name + full content
    (XConfigFileCreationPass.runOnPart), no parse tree."""
    from joern_spark.corpus import F14_PACKAGE_JSON
    from joern_spark.query import Cpg

    doc = "fixtures/js/package.json"
    cfg = cpg.nodes.filter(
        (F.col("kind") == "CONFIG_FILE") & (F.col("doc_id") == doc))
    rows = cfg.collect()
    assert len(rows) == 1
    assert rows[0]["name"] == doc
    assert rows[0]["code"] == F14_PACKAGE_JSON
    # no METHOD/CALL parse artifacts from a config doc
    assert cpg.nodes.filter(
        (F.col("doc_id") == doc) & F.col("kind").isin("METHOD", "CALL")
    ).count() == 0
    # DSL starter
    q = Cpg(nodes=cpg.nodes, edges=cpg.edges)
    assert q.config_file("package").to_df().count() == 1
    assert q.dependency().to_df().count() >= 1
    assert q.imports("my_utils").to_df().count() == 1


def test_template_dom(cpg, g):
    """F21 JSX → TEMPLATE_DOM shapes (AstForTemplateDomCreator.scala:10-97;
    expectations from TemplateDomAstCreationPassTests.scala:11-36:
    parentTemplateDom(formatName call) is the JSXExpressionContainer, whose
    parent dom is the enclosing JSXElement)."""
    doc = "fixtures/js/view.jsx"
    nd = g.doc_nodes(doc)
    doms = nd[nd["kind"] == "TEMPLATE_DOM"]
    assert set(doms["name"]) == {
        "JSXElement", "JSXOpeningElement", "JSXClosingElement",
        "JSXAttribute", "JSXText", "JSXExpressionContainer"}

    ast = g.doc_edges(doc, "AST")
    parent = {d: s for s, d in zip(ast["src"], ast["dst"])}

    def parent_dom(nid):
        p = parent.get(nid)
        while p is not None and g.nodes.loc[p, "kind"] != "TEMPLATE_DOM":
            p = parent.get(p)
        return p

    call = nd[(nd["kind"] == "CALL") & (nd["code"] == "formatName(user)")]
    assert len(call) == 1
    dom1 = parent_dom(call.index[0])
    assert g.nodes.loc[dom1, "name"] == "JSXExpressionContainer"
    assert g.nodes.loc[dom1, "code"] == "{formatName(user)}"
    dom2 = parent_dom(dom1)
    assert g.nodes.loc[dom2, "name"] == "JSXElement"
    assert g.nodes.loc[dom2, "code"] == \
        '<h1 className={style} id="top">Hello, {formatName(user)}!</h1>'

    # attribute value wiring: className={style} holds an expression
    # container; id="top" holds the string literal
    attrs = {r["code"] for _, r in doms.iterrows() if r["name"] == "JSXAttribute"}
    assert attrs == {"className={style}", 'id="top"'}

    # the DSL starter surfaces them
    from joern_spark.query import Cpg
    q = Cpg(nodes=cpg.nodes, edges=cpg.edges)
    assert q.template_dom("JSXElement").to_df().count() >= 3


def test_js_destructuring_hole_and_escaped_template():
    """Round-5 review fixes: array-destructuring holes keep element
    positions (`[a, , b]` binds b from index 2), and escaped `\\${…}` in a
    template literal stays literal text."""
    js = "let [a, , b] = v;\nlet t = `keep \\${x} end`;\n"
    nodes, _, _ = lower_doc("d.js", [
        {"kind": "code", "text": js, "media_ref": "", "offset": 0}])
    codes = {n["code"] for n in nodes if n["kind"] == "CALL"
             and n["name"] == "<operator>.assignment"}
    assert "a = _tmp0[0]" in codes and "b = _tmp0[2]" in codes
    fmt = [n for n in nodes if n["kind"] == "CALL"
           and n["name"] == "<operator>.formatString"]
    assert fmt
    assert not any(n["kind"] == "IDENTIFIER" and n["name"] == "x"
                   for n in nodes)
