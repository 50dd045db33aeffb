"""go-mini frontend (F49): receiver methods, :=, new(T), struct members.

Reference parity targets: ``gosrc2cpg`` lowering conventions —
``AstForFunctionsCreator.scala`` method declarations with receivers,
``AstForGenDeclarationCreator.scala`` short-var declarations,
``AstForTypeDeclCreator.scala`` struct types, and the builtin ``new``
allocation (``AstForMethodCallExpressionCreator``). The ``func`` keyword
is token-rewritten to drive the shared machinery with positions
preserved, so code slices keep the Go spelling.
"""

import pyspark.sql.functions as F

from joern_spark.frontend.lowering import detect_language, lower_doc

F49 = "fixtures/go/pool.go"


def test_detect_language_go():
    assert detect_language("a.go", "") == "go"
    assert detect_language(
        "d", "package main;\nfunc f(x int) int { return x; }") == "go"
    # swift's `->` return clause keeps swift out of the go sniff
    assert detect_language(
        "d", "func f(x: Int) -> Int { return x; }") == "swift"


def test_go_lowering_shape():
    go = (
        'import "net/http";\n'
        "type W struct {\n  n int;\n}\n"
        "func (w W) run(v int) int {\n  return v + w.n;\n}\n"
        "func fn(a int) int {\n  x := a + 1;\n  return x;\n}\n"
    )
    nodes, _, _ = lower_doc("d.go", [
        {"kind": "code", "text": go, "media_ref": "", "offset": 0}])
    by_kind = {}
    for n in nodes:
        by_kind.setdefault(n["kind"], []).append(n)
    methods = {n["full_name"]: n
               for n in by_kind["METHOD"] if not n["is_external"]}
    # the receiver binds the method to its type: full name `W.run`
    assert {"W.run", "fn"} <= set(methods)
    assert methods["fn"]["signature"] == "int(int)"
    params = {n["name"]: (n["code"], n["type_full_name"])
              for n in by_kind["METHOD_PARAMETER_IN"]}
    assert params["v"] == ("v int", "int")
    # struct fields → MEMBER under the TYPE_DECL
    assert [n["name"] for n in by_kind["TYPE_DECL"]] == ["W"]
    assert [(m["name"], m["type_full_name"])
            for m in by_kind["MEMBER"]] == [("n", "int")]
    # string import keeps the full path, names the basename
    assert [(n["name"], n["full_name"]) for n in by_kind["IMPORT"]] == [
        ("http", "net/http")]
    # := declares a LOCAL at first use
    locals_ = {n["name"] for n in by_kind["LOCAL"]}
    assert "x" in locals_


def test_go_new_alloc_and_dispatch():
    go = (
        "type W struct {\n  n int;\n}\n"
        "func (w W) run(v int) int {\n  return v;\n}\n"
        "func g(m int) int {\n"
        "  w := new(W);\n"
        "  t := w.run(m);\n"
        "  return t;\n"
        "}\n"
    )
    nodes, _, _ = lower_doc("d.go", [
        {"kind": "code", "text": go, "media_ref": "", "offset": 0}])
    allocs = [n for n in nodes
              if n["kind"] == "CALL" and n["name"] == "<operator>.alloc"]
    assert allocs[0]["type_full_name"] == "W"
    assert allocs[0]["code"] == "new(W)"
    # the := lattice types `w`, so `w.run(m)` CHA-resolves at parse time
    locs = {n["name"]: n["type_full_name"]
            for n in nodes if n["kind"] == "LOCAL"}
    assert locs["w"] == "W"
    runs = [n for n in nodes if n["kind"] == "CALL" and n["name"] == "run"]
    assert runs[0]["full_name"] == "W.run"
    assert runs[0]["dispatch_type"] == "DYNAMIC_DISPATCH"


def test_go_linker(cpg):
    calls = cpg.edges.filter(F.col("kind") == "CALL").select("src", "dst")
    n = cpg.nodes.filter(F.col("doc_id") == F49) \
        .select("node_id", "code")
    nm = cpg.nodes.select("node_id", "full_name")
    cg = {
        (r["call_code"], r["callee"])
        for r in calls
        .join(n.selectExpr("node_id as src", "code as call_code"), "src")
        .join(nm.selectExpr("node_id as dst", "full_name as callee"), "dst")
        .collect()
    }
    assert ("w.run(m)", "Worker.run") in cg
    assert ("fetch(t)", "fetch") in cg


def test_go_dependencies(cpg):
    deps = {r["name"] for r in
            cpg.nodes.filter(F.col("kind") == "DEPENDENCY").collect()}
    assert "http" in deps and "fmt" in deps
