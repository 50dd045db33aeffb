"""ruby-mini frontend (F50): def/end blocks, X.new, @ivars, require.

Reference parity targets: ``rubysrc2cpg`` lowering conventions — the
``:program`` script wrapper, ``AstForExpressionsCreator``
objectInstantiation (``X.new`` → alloc / ``<init>``), constant receivers
dispatching on the class name, and first-assignment LOCAL creation
(shared with the Python mini-frontend). Blocks are recovered from the
``end`` keyword — nested constructs consume their own ``end`` first.
"""

import pyspark.sql.functions as F

from joern_spark.frontend.lowering import detect_language, lower_doc

F50 = "fixtures/ruby/feed.rb"


def test_detect_language_ruby():
    assert detect_language("a.rb", "") == "ruby"
    assert detect_language(
        "d", "def f(x)\n  return x\nend\n") == "ruby"
    # the colon-terminated def stays Python
    assert detect_language("d", "def f(x):\n    return x\n") == "py"


def test_ruby_lowering_shape():
    rb = (
        "require 'json'\n"
        "class R\n"
        "  def initialize(tag)\n"
        "    @tag = tag\n"
        "  end\n"
        "  def run(v)\n"
        "    if v > 3\n"
        "      return v + @tag\n"
        "    else\n"
        "      return v\n"
        "    end\n"
        "  end\n"
        "end\n"
        "r = R.new(3)\n"
        "t = r.run(5)\n"
    )
    nodes, _, _ = lower_doc("d.rb", [
        {"kind": "code", "text": rb, "media_ref": "", "offset": 0}])
    by_kind = {}
    for n in nodes:
        by_kind.setdefault(n["kind"], []).append(n)
    methods = {n["full_name"]
               for n in by_kind["METHOD"] if not n["is_external"]}
    assert {"R.initialize", "R.run", ":program"} <= methods
    assert [(n["name"], n["full_name"]) for n in by_kind["IMPORT"]] == [
        ("json", "json")]
    # same-file X.new → alloc typed R, seeding the local's type
    allocs = [n for n in by_kind["CALL"] if n["name"] == "<operator>.alloc"]
    assert allocs[0]["type_full_name"] == "R"
    assert allocs[0]["code"] == "R.new(3)"
    locals_ = {n["name"]: n["type_full_name"] for n in by_kind["LOCAL"]}
    assert locals_["r"] == "R"
    # the typed receiver CHA-resolves `r.run(5)` at parse time
    runs = [n for n in by_kind["CALL"] if n["name"] == "run"]
    assert runs[0]["full_name"] == "R.run"
    # if/else recovered from end-delimited blocks
    ctrl = {n["ctrl_type"] for n in by_kind["CONTROL_STRUCTURE"]}
    assert {"IF", "ELSE"} <= ctrl
    # @ivar parses as a stable identifier on both sides of the def
    ivars = [n["name"] for n in by_kind["IDENTIFIER"]
             if n["name"].startswith("@")]
    assert ivars.count("@tag") == 2


def test_ruby_external_new():
    """`X.new` on a class not defined in the file is an external
    constructor: `X.<init>` (objectInstantiation external path)."""
    rb = "q = Marshal.new(1)\n"
    nodes, _, _ = lower_doc("d.rb", [
        {"kind": "code", "text": rb, "media_ref": "", "offset": 0}])
    inits = [n for n in nodes if n["kind"] == "CALL" and n["name"] == "<init>"]
    assert len(inits) == 1
    assert inits[0]["full_name"] == "Marshal.<init>"
    assert inits[0]["type_full_name"] == "Marshal"


def test_ruby_linker(cpg):
    calls = cpg.edges.filter(F.col("kind") == "CALL").select("src", "dst")
    n = cpg.nodes.filter(F.col("doc_id") == F50) \
        .select("node_id", "code")
    nm = cpg.nodes.select("node_id", "full_name")
    cg = {
        (r["call_code"], r["callee"])
        for r in calls
        .join(n.selectExpr("node_id as src", "code as call_code"), "src")
        .join(nm.selectExpr("node_id as dst", "full_name as callee"), "dst")
        .collect()
    }
    assert ("f.run(5)", "RFetch.run") in cg
    assert ("fetch(t)", "fetch") in cg


def test_ruby_dependencies(cpg):
    deps = {r["name"] for r in
            cpg.nodes.filter(F.col("kind") == "DEPENDENCY").collect()}
    assert "net/http" in deps
