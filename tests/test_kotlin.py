"""kotlin-mini frontend (F47): typed params, new-less constructors, val/var.

Reference parity targets: ``kotlin2cpg`` lowering conventions —
``AstForFunctionsCreator`` typed METHOD/parameter/return emission and
``<init>`` constructor full names, ``AstForDeclarationsCreator
.astsForProperty`` val/var locals and members, and the linker split shared
with the other mini-frontends. The ``fun`` keyword is token-rewritten to
drive the shared JS/Java machinery with positions preserved, so every code
slice keeps the original Kotlin spelling.
"""

import pyspark.sql.functions as F
import pytest

from joern_spark.frontend.lowering import detect_language, lower_doc

F47 = "fixtures/kotlin/Net.kt"


def test_detect_language_kotlin():
    assert detect_language("a.kt", "") == "kotlin"
    assert detect_language("d", "fun f(x: Int): Int { return x; }") == "kotlin"
    # `function` must not trip the \\bfun\\b sniff
    assert detect_language("d", "function f() { return 1; }") == "js"
    assert detect_language("d", "class A { int f() { return 1; } }") == "java"


def test_kotlin_lowering_shape():
    kt = (
        "import java.net;\n"
        "fun fn(a: Int): Int {\n"
        "  val x = a + 1;\n"
        "  return x;\n"
        "}\n"
        "class K {\n"
        "  val tag = 7;\n"
        "  fun m(y: Int): Int { return y; }\n"
        "}\n"
        "val k = K();\n"
        "val out = k.m(fn(2));\n"
    )
    nodes, _, _ = lower_doc("d.kt", [
        {"kind": "code", "text": kt, "media_ref": "", "offset": 0}])
    by_kind = {}
    for n in nodes:
        by_kind.setdefault(n["kind"], []).append(n)
    methods = {n["full_name"]: n for n in by_kind["METHOD"] if not n["is_external"]}
    assert {"fn", "K.m", ":program"} <= set(methods)
    # typed parameters and signatures survive the `name: Type` grammar
    assert methods["fn"]["signature"] == "Int(Int)"
    params = {n["name"]: (n["code"], n["type_full_name"])
              for n in by_kind["METHOD_PARAMETER_IN"]}
    assert params["a"] == ("a: Int", "Int")
    # dotted import → IMPORT with the last segment as name
    imports = [(n["name"], n["full_name"]) for n in by_kind["IMPORT"]]
    assert imports == [("net", "java.net")]
    # `val tag = 7` inside the class body → MEMBER
    assert [(m["name"], m["code"]) for m in by_kind["MEMBER"]] == [
        ("tag", "val tag")]
    # new-less constructor of a same-file class → alloc typed K; the local
    # and the CHA-resolved receiver call follow
    allocs = [n for n in by_kind["CALL"] if n["name"] == "<operator>.alloc"]
    assert allocs[0]["type_full_name"] == "K" and allocs[0]["code"] == "K()"
    locals_ = {n["name"]: n["type_full_name"] for n in by_kind["LOCAL"]}
    assert locals_["k"] == "K"
    km = [n for n in by_kind["CALL"] if n["name"] == "m"]
    assert km[0]["full_name"] == "K.m"
    assert km[0]["dispatch_type"] == "DYNAMIC_DISPATCH"


def test_kotlin_external_constructor():
    """A bare capitalized call to an unknown class is an external
    constructor invocation: full_name `X.<init>` (the kotlin querydb
    anchor, NetworkProtocols.scala:13-29)."""
    kt = "fun g(): Int {\n  val u = URL(\"http://x\");\n  return u;\n}\n"
    nodes, _, _ = lower_doc("d.kt", [
        {"kind": "code", "text": kt, "media_ref": "", "offset": 0}])
    inits = [n for n in nodes if n["kind"] == "CALL" and n["name"] == "<init>"]
    assert len(inits) == 1
    assert inits[0]["full_name"] == "URL.<init>"
    assert inits[0]["code"] == 'URL("http://x")'
    assert inits[0]["type_full_name"] == "URL"


@pytest.fixture(scope="module")
def kt_callgraph(cpg):
    calls = cpg.edges.filter(F.col("kind") == "CALL").select("src", "dst")
    n = cpg.nodes.filter(F.col("doc_id") == F47) \
        .select("node_id", "code", "full_name")
    nm = cpg.nodes.select("node_id", "full_name")
    return {
        (r["call_code"], r["callee"])
        for r in calls
        .join(n.selectExpr("node_id as src", "code as call_code"), "src")
        .join(nm.selectExpr("node_id as dst", "full_name as callee"), "dst")
        .collect()
    }


def test_kotlin_linker(kt_callgraph):
    cg = kt_callgraph
    # constructor-typed receiver → CHA-resolved dynamic call
    assert ("f.insecure()", "KFetch.insecure") in cg
    # bare in-class call → static link to the same class's method
    assert ("stash(u)", "KFetch.stash") in cg and ("stash(v)", "KFetch.stash") in cg


def test_kotlin_dependencies(cpg):
    deps = {r["name"] for r in
            cpg.nodes.filter(F.col("kind") == "DEPENDENCY").collect()}
    assert "net" in deps
    imports = cpg.nodes.filter(
        (F.col("kind") == "IMPORT") & (F.col("doc_id") == F47))
    linked = (
        cpg.edges.filter(F.col("kind") == "IMPORTS")
        .join(imports.select(F.col("node_id").alias("src")), "src")
    )
    assert linked.count() == 1
