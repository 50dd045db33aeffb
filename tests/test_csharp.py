"""csharp-mini frontend (F51): using, namespace, auto-properties.

Reference parity targets: ``csharpsrc2cpg`` lowering conventions —
``AstForStatementsCreator.scala`` using directives,
``AstForDeclarationsCreator.scala`` namespace declarations and
auto-property lowering (property → MEMBER), and the Java-shared typed
declaration machinery with C#'s lower-case primitive type keywords.
"""

import pyspark.sql.functions as F

from joern_spark.frontend.lowering import detect_language, lower_doc

F51 = "fixtures/csharp/Client.cs"


def test_detect_language_csharp():
    assert detect_language("a.cs", "") == "csharp"
    assert detect_language("x/csharp/y", "") == "csharp"


def test_csharp_lowering_shape():
    cs = (
        "using System;\n"
        "using System.Net;\n"
        "namespace App {\n"
        "  class C {\n"
        "    public int Tag { get; set; }\n"
        "    private int m(string s) {\n"
        "      return 1;\n"
        "    }\n"
        "  }\n"
        "}\n"
    )
    nodes, _, _ = lower_doc("d.cs", [
        {"kind": "code", "text": cs, "media_ref": "", "offset": 0}])
    by_kind = {}
    for n in nodes:
        by_kind.setdefault(n["kind"], []).append(n)
    # using directives → IMPORT nodes with dotted full names
    assert [(n["name"], n["full_name"]) for n in by_kind["IMPORT"]] == [
        ("System", "System"), ("Net", "System.Net")]
    # namespace block wraps the contained types (astForNamespaceDeclaration)
    assert [n["full_name"] for n in by_kind["NAMESPACE_BLOCK"]] == ["App"]
    assert [n["name"] for n in by_kind["TYPE_DECL"]] == ["C"]
    # auto-property → MEMBER with its type and accessor code
    members = [(m["name"], m["type_full_name"], m["code"])
               for m in by_kind["MEMBER"]]
    assert members == [("Tag", "int", "int Tag { get; set; }")]
    # lower-case `string` parameter type parses through the Java grammar
    methods = {n["full_name"]: n["signature"]
               for n in by_kind["METHOD"] if not n["is_external"]}
    assert methods["C.m"] == "int(string)"


def test_csharp_static_dispatch():
    cs = (
        "class P {\n"
        "  static int Main(int m) {\n"
        "    Console.WriteLine(m);\n"
        "    return m;\n"
        "  }\n"
        "}\n"
    )
    nodes, _, _ = lower_doc("d.cs", [
        {"kind": "code", "text": cs, "media_ref": "", "offset": 0}])
    wl = [n for n in nodes
          if n["kind"] == "CALL" and n["name"] == "WriteLine"]
    assert wl[0]["full_name"] == "Console.WriteLine"


def test_csharp_linker(cpg):
    calls = cpg.edges.filter(F.col("kind") == "CALL").select("src", "dst")
    n = cpg.nodes.filter(F.col("doc_id") == F51) \
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
    assert ("f.Insecure()", "CFetch.Insecure") in cg
    # bare in-class call → static link
    assert ("stash(Tag)", "CFetch.stash") in cg


def test_csharp_dependencies(cpg):
    deps = {r["name"] for r in
            cpg.nodes.filter(F.col("kind") == "DEPENDENCY").collect()}
    assert "Net" in deps
