"""AST-layer golden tests (reference: c2cpg/src/test/.../passes/ast/* suites).

Asserts node kinds, operator lowering (AstForExpressionsCreator.scala:13-58),
sibling ordering (Ast.scala:68-82), and ARGUMENT edge structure for the
fixture programs.
"""

from collections import Counter

from tests.conftest import F1, F2, F3, F4, F5


def test_flow_node_inventory(g):
    kinds = Counter(g.doc_nodes(F1)["kind"])
    assert kinds["METHOD"] == 1
    assert kinds["METHOD_PARAMETER_IN"] == 1
    assert kinds["METHOD_RETURN"] == 1
    assert kinds["LOCAL"] == 5  # a b c z x
    assert kinds["CALL"] == 7  # 5 assignments + addition + postIncrement
    assert kinds["LITERAL"] == 1  # 0x31
    assert kinds["RETURN"] == 1
    assert kinds["IDENTIFIER"] == 12
    assert kinds["FILE"] == 1


def test_flow_operator_lowering(g):
    """Everything-is-a-call: operators become CALL nodes with <operator>.* names."""
    calls = g.doc_nodes(F1)
    calls = calls[calls["kind"] == "CALL"]
    names = Counter(calls["name"])
    assert names["<operator>.assignment"] == 5
    assert names["<operator>.addition"] == 1
    assert names["<operator>.postIncrement"] == 1


def test_free_list_operator_lowering(g):
    names = set(g.doc_nodes(F2)[g.doc_nodes(F2)["kind"] == "CALL"]["name"])
    assert "<operator>.indirectFieldAccess" in names  # p->next
    assert "<operator>.notEquals" in names  # p != NULL
    assert "free" in names


def test_zoo_control_structures(g):
    nodes = g.doc_nodes(F4)
    ctrl = nodes[nodes["kind"] == "CONTROL_STRUCTURE"]
    assert set(ctrl["ctrl_type"]) >= {"IF", "WHILE", "DO", "SWITCH"}
    names = set(nodes[nodes["kind"] == "CALL"]["name"])
    assert "<operator>.conditional" in names  # ternary
    assert "<operator>.logicalAnd" in names  # short-circuit &&
    assert "<operator>.assignmentPlus" in names  # x += 1


def test_argument_edges_flow(g):
    """Assignment a = p0 has ARGUMENT edges to 'a' and 'p0'."""
    args = g.edge_codes(F1, "ARGUMENT")
    assert ("a = p0", "a") in args
    assert ("a = p0", "p0") in args
    assert ("b + c", "b") in args
    assert ("b + c", "c") in args
    assert ("return x", "x") in args


def test_ast_sibling_order(g):
    """Block children carry 1-based consecutive order (Ast.scala:68-82)."""
    nodes = g.doc_nodes(F1)
    block_id = nodes[nodes["kind"] == "BLOCK"].index[0]
    ast = g.doc_edges(F1, "AST")
    child_ids = ast[ast["src"] == block_id]["dst"]
    orders = sorted(g.nodes.loc[c, "order"] for c in child_ids)
    assert orders == list(range(1, len(orders) + 1))


def test_call_args_have_argument_index(g):
    nodes = g.doc_nodes(F3)
    lit42 = nodes[(nodes["kind"] == "LITERAL") & (nodes["code"] == "42")]
    assert len(lit42) == 1
    assert lit42["argument_index"].iloc[0] == 1


def test_java_methods(g):
    methods = g.doc_nodes(F5)
    methods = methods[methods["kind"] == "METHOD"]
    assert {
        "staticMethod", "nonStaticMethod", "callsExternalMethod",
        "internalMethod", "callsNoExternalMethod",
    } <= set(methods["name"])


def test_method_full_names_qualified(g):
    methods = g.doc_nodes(F5)
    methods = methods[methods["kind"] == "METHOD"]
    full = set(methods["full_name"])
    assert any(f.startswith("MethodTest.") for f in full)


def test_contains_edges_cover_method_body(g):
    """CONTAINS gives O(1) owner lookup (ContainsEdgePass.scala:14-47)."""
    nodes = g.doc_nodes(F1)
    method_id = nodes[nodes["kind"] == "METHOD"].index[0]
    contains = g.doc_edges(F1, "CONTAINS")
    owned = set(contains[contains["src"] == method_id]["dst"])
    body = nodes[nodes["kind"].isin(["CALL", "IDENTIFIER", "LITERAL", "RETURN", "BLOCK", "LOCAL"])]
    assert set(body.index) <= owned


# ---- struct/enum member declarator regressions -----------------------------

def test_enum_initializer_no_phantom_members():
    """enum E { A = FOO, B }: FOO is an initializer expression, not a MEMBER
    (reference TYPE_DECL member semantics, c2cpg AstCreator enum handling)."""
    from joern_spark.frontend.c_parser import CParser

    members = [
        n.name
        for top in CParser("enum E { A = FOO, B = 2, C };").parse_translation_unit()
        for n in top.walk() if n.kind == "MEMBER"
    ]
    assert members == ["A", "B", "C"]


def test_enum_initializer_paren_depth():
    """enum E { A = MAX(X, Y), B }: the ',' inside the parenthesized
    initializer must not end the skip — Y is not a MEMBER (round-2 ADVICE)."""
    from joern_spark.frontend.c_parser import CParser

    members = [
        n.name
        for top in CParser(
            "enum E { A = MAX(X, Y), B };").parse_translation_unit()
        for n in top.walk() if n.kind == "MEMBER"
    ]
    assert members == ["A", "B"]


def test_method_ref_retagging_respects_shadowing():
    """A local/parameter that shadows a function name keeps its IDENTIFIER
    kind; non-shadowed uses still become METHOD_REF (round-2 ADVICE)."""
    from joern_spark.frontend.lowering import lower_doc

    code = (
        "void cb() { }\n"
        "int use() { int cb = 1; cb = cb + 2; return cb; }\n"
        "int take() { int x = 0; x = go(cb); return x; }\n"
    )
    nodes, _edges, _spans = lower_doc("d", [
        {"kind": "code", "text": code, "media_ref": "", "offset": 0}])
    by_kind = {}
    for r in nodes:
        by_kind.setdefault(r["kind"], []).append(r["name"])
    # use(): all three shadowed cb uses stay IDENTIFIER
    assert by_kind.get("METHOD_REF", []).count("cb") == 1  # only in take()
    assert by_kind["IDENTIFIER"].count("cb") >= 3


def test_struct_member_stars_bind_per_declarator():
    from joern_spark.frontend.c_parser import CParser

    types = {
        n.name: n.type_full_name
        for top in CParser("struct S { int *a, b; int c, *d; };").parse_translation_unit()
        for n in top.walk() if n.kind == "MEMBER"
    }
    assert types == {"a": "int*", "b": "int", "c": "int", "d": "int*"}


def test_extended_operator_vocabulary():
    """delete / elvis (C side) and arrayNew (Java side) — operatorextension
    taxonomy members (package.scala allAllocTypes etc.)."""
    from joern_spark.frontend.c_parser import CParser
    from joern_spark.frontend.java_parser import JavaParser

    c_ops = [
        n.name
        for top in CParser(
            "void f() { delete p; int y = a ?: b; }").parse_translation_unit()
        for n in top.walk() if n.kind == "CALL"
    ]
    assert "<operator>.delete" in c_ops
    assert "<operator>.elvis" in c_ops

    j = [
        (n.name, n.type_full_name)
        for top in JavaParser(
            "class K { int[] mk() { int[] xs = new int[5]; return xs; } }"
        ).parse_translation_unit()
        for n in top.walk() if n.kind == "CALL"
    ]
    assert ("<operator>.arrayNew", "int[]") in j


def test_macro_decl_and_refs(cpg, g):
    """Fork macro model: #define → MACRO_DECL; object-like use → MACRO_REF
    with a REF edge; function-like call site REF-links to its MACRO_DECL."""
    from tests.conftest import F12

    nodes = g.doc_nodes(F12)
    decls = nodes[nodes["kind"] == "MACRO_DECL"]
    assert sorted(decls["name"]) == ["LIMIT", "SQR"]
    refs = nodes[nodes["kind"] == "MACRO_REF"]
    assert list(refs["name"]) == ["LIMIT"]
    e = g.doc_edges(F12, "REF")
    limit_decl = decls[decls["name"] == "LIMIT"].index[0]
    sqr_decl = decls[decls["name"] == "SQR"].index[0]
    assert len(e[(e["src"] == refs.index[0]) & (e["dst"] == limit_decl)]) == 1
    sqr_call = nodes[(nodes["kind"] == "CALL") & (nodes["name"] == "SQR")]
    assert len(sqr_call) == 1
    assert len(e[(e["src"] == sqr_call.index[0]) & (e["dst"] == sqr_decl)]) == 1


def test_modifier_nodes(g):
    """Explicit Java modifiers become MODIFIER children (javasrc2cpg
    modifier emission; NodeTypeStarters.modifier)."""
    mods = g.doc_nodes(F5)
    mods = mods[mods["kind"] == "MODIFIER"]
    assert {"PUBLIC", "STATIC", "PRIVATE"} <= set(mods["name"])
    # staticMethod carries both public and static
    methods = g.doc_nodes(F5)
    sm = methods[(methods["kind"] == "METHOD")
                 & (methods["name"] == "staticMethod")].index[0]
    kid_kinds = set(
        g.nodes.loc[d, "name"] for _, (s, d) in
        g.doc_edges(F5, "AST")[["src", "dst"]].iterrows()
        if s == sm and g.nodes.loc[d, "kind"] == "MODIFIER")
    assert kid_kinds == {"PUBLIC", "STATIC"}


def test_comment_nodes(g):
    """// and /* */ runs become COMMENT nodes under the FILE node
    (NodeTypeStarters.comment)."""
    sc = g.doc_nodes("fixtures/c/scanners")
    comments = sc[sc["kind"] == "COMMENT"]
    assert list(comments["code"]) == ["/* seeded querydb-scanner positives */"]
    # parent via AST edges, NOT the pandas parent_id column (nullable id
    # column → float64 → silently rounds 64-bit ids, CLAUDE.md trap)
    cid = comments.index[0]
    e = g.doc_edges("fixtures/c/scanners", "AST")
    parents = [s for s, d in zip(e["src"], e["dst"]) if d == cid]
    assert parents and g.nodes.loc[parents[0], "kind"] == "FILE"


def test_annotation_nodes(g):
    """ANNOTATION + ANNOTATION_PARAMETER_ASSIGN/_PARAMETER under the
    annotated METHOD (javasrc2cpg AstForTypeDeclsCreator.scala:456-484;
    NodeTypeStarters annotation starter)."""
    n = g.nodes[g.nodes["doc_id"] == "fixtures/java/Injection.java"]
    annos = n[n["kind"] == "ANNOTATION"]
    assert set(annos["name"]) == {"Route", "Deprecated", "Wired"}
    assigns = n[n["kind"] == "ANNOTATION_PARAMETER_ASSIGN"]
    # marker annotation (@Deprecated) has no assigns; single-member gets the
    # implicit `value` parameter
    assert sorted(assigns["name"]) == ["path", "value"]
    params = n[n["kind"] == "ANNOTATION_PARAMETER"]
    assert sorted(params["name"]) == ["path", "value"]
    # AST-linked under the annotated method
    route_id = annos.index[annos["name"] == "Route"][0]
    ast = g.edges[(g.edges["kind"] == "AST") & (g.edges["dst"] == route_id)]
    assert len(ast) == 1
    parent = ast.iloc[0]["src"]
    assert g.nodes.loc[parent, "kind"] == "METHOD"
    assert g.nodes.loc[parent, "name"] == "handle"


def test_cpp_template_subset():
    """`template <typename T>` headers (round 5): parameter names become
    opaque types for the templated entity, template args on known types are
    swallowed into the type string, and call sites into the templated
    function stay statically linkable by bare name (c2cpg dispatches the
    full CDT template AST — the mini keeps the entity parseable)."""
    from joern_spark.frontend.lowering import lower_doc

    src = (
        "template <typename T>\n"
        "T maxv(T a, T b) {\n"
        "  if (a > b) { return a; }\n"
        "  return b;\n"
        "}\n"
        "template <class U> struct Box {\n"
        "  U v;\n"
        "};\n"
        "int use(int x) {\n"
        "  int m = maxv(x, 3);\n"
        "  return m;\n"
        "}\n"
    )
    nodes, _, _ = lower_doc("d.c", [
        {"kind": "code", "text": src, "media_ref": "", "offset": 0}])
    methods = {n["name"]: n for n in nodes if n["kind"] == "METHOD"}
    assert {"maxv", "use"} <= set(methods)
    params = {n["name"]: n["type_full_name"] for n in nodes
              if n["kind"] == "METHOD_PARAMETER_IN"
              and n["method_id"] == methods["maxv"]["node_id"]}
    assert params == {"a": "T", "b": "T"}
    box = [n for n in nodes if n["kind"] == "TYPE_DECL" and n["name"] == "Box"]
    assert box
    member = [n for n in nodes if n["kind"] == "MEMBER" and n["name"] == "v"]
    assert member and member[0]["type_full_name"] == "U"
    calls = [n for n in nodes if n["kind"] == "CALL" and n["name"] == "maxv"]
    assert calls and calls[0]["full_name"] == "maxv"


def test_lambda_expressions_java_csharp_python():
    """Lambdas across dialects (round 5): Java `->`, C# `=>`, Python
    `lambda` all lower to hoisted `<lambda>N` METHODs with a METHOD_REF at
    the use site; named bindings adopt the variable's name (statically
    linkable). PHP's array `=>` must never misfire as a lambda."""
    from joern_spark.frontend.lowering import lower_doc

    jsrc = ("class A {\n  int go(int z) {\n"
            "    each(items, x -> use(x + z));\n    return 0;\n  }\n}\n")
    nodes, _, _ = lower_doc("d.java", [
        {"kind": "code", "text": jsrc, "media_ref": "", "offset": 0}])
    kinds = {(n["kind"], n["name"]) for n in nodes}
    assert ("METHOD", "<lambda>0") in kinds
    assert ("METHOD_REF", "<lambda>0") in kinds

    cs = ("using Sys;\nclass B {\n  public int Go(int z) {\n"
          "    var f = (int a) => a + z;\n    return 0;\n  }\n}\n")
    nodes, _, _ = lower_doc("d.cs", [
        {"kind": "code", "text": cs, "media_ref": "", "offset": 0}])
    assert any(n["kind"] == "METHOD" and n["name"] == "<lambda>0"
               for n in nodes)

    py = "sq = lambda x: x * x\nr = sq(4)\n"
    nodes, _, _ = lower_doc("d.py", [
        {"kind": "code", "text": py, "media_ref": "", "offset": 0}])
    methods = {n["name"] for n in nodes if n["kind"] == "METHOD"}
    assert "sq" in methods  # named binding adopted
    calls = [n for n in nodes if n["kind"] == "CALL" and n["name"] == "sq"]
    assert calls and calls[0]["full_name"] == "sq"

    php = "<?php\n$m = array(1, 2);\n$x = 3;\n"
    nodes, _, _ = lower_doc("d.php", [
        {"kind": "code", "text": php, "media_ref": "", "offset": 0}])
    assert not any("<lambda>" in (n["name"] or "")
                   for n in nodes if n["kind"] == "METHOD")


def test_template_scoping_and_detection_precision():
    """Round-5 review fixes: template parameter names don't leak past the
    templated entity; a templated struct's own name stays a type (`Box<int>
    v;` parses as a declaration); and a Java doc mentioning a variable
    named `template` compared with `<` is NOT routed to the C parser."""
    from joern_spark.frontend.c_parser import CParser
    from joern_spark.frontend.lowering import detect_language

    src = (
        "template <class U> struct Box {\n  U v;\n};\n"
        "int later() {\n  int T = 1;\n  T = 2;\n  Box<int> b;\n"
        "  return T;\n}\n"
    )
    tops = CParser(src).parse_translation_unit()
    later = [t for t in tops if t.kind == "METHOD" and t.name == "later"][0]
    # `T = 2;` is an assignment to the int local, not a declaration of a
    # T-typed variable; `Box<int> b;` IS a declaration
    names = [(n.kind, n.name, n.type_full_name) for n in later.walk()
             if n.kind == "LOCAL"]
    assert ("LOCAL", "T", "int") in names
    assert any(k == "LOCAL" and nm == "b" and ty.startswith("Box")
               for k, nm, ty in names)
    assert sum(1 for k, nm, _ in names if nm == "T") == 1

    java = ("class A { int go(int template, int max) {"
            " if (template < max) { return 1; } return 0; } }")
    assert detect_language("doc", java) == "java"
