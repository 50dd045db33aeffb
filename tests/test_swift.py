"""swift-mini frontend (F48): `-> Ret` clauses, `_ q:` labels, let locals.

Reference parity targets: ``swiftsrc2cpg`` lowering conventions —
``AstForDeclSyntaxCreator.scala`` function/variable declarations
(FunctionSignatureSyntax return clauses, FunctionParameterSyntax
firstName/secondName label pairs, stored properties), and
``AstForExprSyntaxCreator.scala`` constructor-call lowering. The grammar
is three dials on the Kotlin mini-frontend (``func`` keyword, ``let``
declarations, ``->`` return marker); everything else is the shared
JS/Java machinery.
"""

import pyspark.sql.functions as F

from joern_spark.frontend.lowering import detect_language, lower_doc

F48 = "fixtures/swift/Net.swift"


def test_detect_language_swift():
    assert detect_language("a.swift", "") == "swift"
    assert detect_language(
        "d", "func f(x: Int) -> Int { return x; }") == "swift"
    # kotlin's `fun` must not trip the swift sniff, and vice versa
    assert detect_language("d", "fun f(x: Int): Int { return x; }") == "kotlin"


def test_swift_lowering_shape():
    sw = (
        "import Foundation;\n"
        "class S {\n"
        "  let tag = 7;\n"
        "  func m(_ y: Int) -> Int { return y; }\n"
        "}\n"
        "func fn(with a: Int) -> Int {\n"
        "  let x = a + 1;\n"
        "  return x;\n"
        "}\n"
        "let s = S();\n"
        "let out = s.m(fn(2));\n"
    )
    nodes, _, _ = lower_doc("d.swift", [
        {"kind": "code", "text": sw, "media_ref": "", "offset": 0}])
    by_kind = {}
    for n in nodes:
        by_kind.setdefault(n["kind"], []).append(n)
    methods = {n["full_name"]: n
               for n in by_kind["METHOD"] if not n["is_external"]}
    assert {"fn", "S.m", ":program"} <= set(methods)
    # `-> Int` return clause survives into the signature
    assert methods["fn"]["signature"] == "Int(Int)"
    # label pairs bind the SECOND name (FunctionParameterSyntax secondName)
    params = {n["name"]: n["type_full_name"]
              for n in by_kind["METHOD_PARAMETER_IN"]}
    assert params == {"y": "Int", "a": "Int"}
    # `let tag = 7` stored property → MEMBER
    assert [(m["name"], m["code"]) for m in by_kind["MEMBER"]] == [
        ("tag", "let tag")]
    # new-less constructor of a same-file class → alloc typed S
    allocs = [n for n in by_kind["CALL"] if n["name"] == "<operator>.alloc"]
    assert allocs[0]["type_full_name"] == "S" and allocs[0]["code"] == "S()"
    locals_ = {n["name"]: n["type_full_name"] for n in by_kind["LOCAL"]}
    assert locals_["s"] == "S"
    sm = [n for n in by_kind["CALL"] if n["name"] == "m"]
    assert sm[0]["full_name"] == "S.m"
    assert sm[0]["dispatch_type"] == "DYNAMIC_DISPATCH"


def test_swift_external_constructor():
    """An unknown capitalized bare call is an external constructor —
    `URL.<init>` — the anchor the insecure-protocol scanner matches
    (shared with kotlin; NetworkProtocols.scala:13-29)."""
    sw = "func g() -> Int {\n  let u = URL(\"http://x\");\n  return u;\n}\n"
    nodes, _, _ = lower_doc("d.swift", [
        {"kind": "code", "text": sw, "media_ref": "", "offset": 0}])
    inits = [n for n in nodes if n["kind"] == "CALL" and n["name"] == "<init>"]
    assert len(inits) == 1
    assert inits[0]["full_name"] == "URL.<init>"
    assert inits[0]["code"] == 'URL("http://x")'


def test_swift_linker(cpg):
    calls = cpg.edges.filter(F.col("kind") == "CALL").select("src", "dst")
    n = cpg.nodes.filter(F.col("doc_id") == F48) \
        .select("node_id", "code")
    nm = cpg.nodes.select("node_id", "full_name")
    cg = {
        (r["call_code"], r["callee"])
        for r in calls
        .join(n.selectExpr("node_id as src", "code as call_code"), "src")
        .join(nm.selectExpr("node_id as dst", "full_name as callee"), "dst")
        .collect()
    }
    # constructor-typed receiver → CHA-resolved dynamic call
    assert ("f.insecure()", "SFetch.insecure") in cg
    # bare in-class call → static link to the same class's method
    assert ("stash(u)", "SFetch.stash") in cg and \
        ("stash(v)", "SFetch.stash") in cg


def test_swift_dependencies(cpg):
    deps = {r["name"] for r in
            cpg.nodes.filter(F.col("kind") == "DEPENDENCY").collect()}
    assert "Foundation" in deps
