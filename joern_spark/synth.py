"""Deterministic synthetic code-doc corpus derived from the driver's
``documents`` table (TESTDATA.md).

The input contract (BASELINE.json input_hint) is an interleaved-doc table
``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``. The driver
ships a generic ``documents(doc_id, text, ...)`` table; this module maps each
row to a deterministic C program (seeded by the doc_id hash — no wall clock,
no randomness), split into spans with media spans interleaved on every fifth
doc. Scale-out is free: the generation is a ``mapInPandas`` over whatever
partitioning the documents table already has.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .corpus import split_code_spans, with_media
from .ids import synth_key
from .schema import DOCS_SCHEMA


def code_for_key(k: int, helper: str) -> str:
    """Deterministic C program: main + helper, hot calls to printf/malloc
    (the skewed call-linking keys), branches and a loop for CFG/DDG work."""
    return (
        f"int main_{k % 1000000:06d}() {{\n"
        f"  int a = {k % 97};\n"
        f"  int b = a + {k % 13};\n"
        f"  char *buf = malloc(b);\n"
        f"  {helper}(a, b);\n"
        f"  printf(buf);\n"
        f"  if (a > b) {{ a = b; }} else {{ b = a; }}\n"
        f"  while (a > 0) {{ a--; }}\n"
        f"  return b;\n"
        f"}}\n"
        f"void {helper}(int x, int y) {{\n"
        f"  int s = x + y;\n"
        f"  printf(s);\n"
        f"}}"
    )


def js_code_for_key(k: int, helper: str) -> str:
    """Deterministic JS program for the jssrc-mini slice of the corpus
    (``k % 11 == 3``): require → DEPENDENCY, a bare function (static link),
    a class with a typed receiver call (CHA via alloc), and an untyped
    ``log`` leftover (NaiveCallLinker). Mirrored line-for-line by the
    cpg_span_provenance DuckDB oracle (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"const util = require('pkg_{k % 50:02d}');\n"
        f"const fmt_{m6} = (a) => a + {k % 13};\n"
        f"function {helper}(x) {{\n"
        f"  let s = fmt_{m6}(x);\n"
        f"  log(s);\n"
        f"  return s;\n"
        f"}}\n"
        f"class W_{m6} {{\n"
        f"  run(v) {{ return v + {k % 7}; }}\n"
        f"}}\n"
        f"let w = new W_{m6}();\n"
        f"let t = w.run({k % 97});\n"
        f"let [p, q] = t;\n"
        f"let m = `t=${{p + {k % 13}}}`;\n"
        f"let u = {helper}(p);"
    )


def py_code_for_key(k: int, helper: str) -> str:
    """Deterministic Python program for the pysrc-mini slice of the corpus
    (``k % 11 == 7``): import → DEPENDENCY, a module function (static link),
    a class with a lattice-typed receiver call (CHA via constructor-call
    inference), and an untyped ``log`` leftover (NaiveCallLinker). Mirrored
    line-for-line by the cpg_span_provenance DuckDB oracle
    (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"import pkg_{k % 50:02d}\n"
        f"@trace\n"
        f"def {helper}(x, scale=1):\n"
        f"    s = x + {k % 13}\n"
        f"    log(s)\n"
        f"    return s * scale\n"
        f"class W_{m6}:\n"
        f"    def run(self, v):\n"
        f"        return v + {k % 7}\n"
        f"w = W_{m6}()\n"
        f"t = w.run({k % 97})\n"
        f"q = [e + {k % 7} for e in [t]]\n"
        f"try:\n"
        f"    u = {helper}(t, scale={k % 13})\n"
        f"except ValueError as err:\n"
        f"    u = 0\n"
        f"finally:\n"
        f"    log(u)"
    )


def jimple_code_for_key(k: int, helper: str) -> str:
    """Deterministic Jimple class for the bytecode slice of the corpus
    (``k % 11 == 5``): identity-statement parameters, an internal
    virtualinvoke (exact static-shape CHA), and a corpus-wide hot stub key
    ``JLog.log`` (the skewed call-linking key, like printf/malloc in the C
    slice). Mirrored line-for-line by the cpg_span_provenance DuckDB oracle
    (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"public class JW_{m6} extends java.lang.Object {{\n"
        f"  public int jrun(int) {{\n"
        f"    JW_{m6} r0;\n"
        f"    int i0, i1;\n"
        f"    r0 := @this: JW_{m6};\n"
        f"    i0 := @parameter0: int;\n"
        f"    i1 = i0 + {k % 7};\n"
        f"    i1 = virtualinvoke r0.<JW_{m6}: int jtally(int)>(i1);\n"
        f"    i1 = staticinvoke <JLog: int log(int)>(i1);\n"
        f"    return i1;\n"
        f"  }}\n"
        f"  public int jtally(int) {{\n"
        f"    int j0;\n"
        f"    j0 := @parameter0: int;\n"
        f"    return j0;\n"
        f"  }}\n"
        f"}}"
    )


def php_code_for_key(k: int, helper: str) -> str:
    """Deterministic PHP script for the php-mini slice of the corpus
    (``k % 11 == 9``): require → DEPENDENCY, a sigil-parameter function
    (static link), a class with a typed receiver call (CHA via ``new``), and
    an untyped ``log`` leftover (NaiveCallLinker). The leading ``<?php`` line
    is the language sniff for extension-less synth doc_ids. Mirrored
    line-for-line by the cpg_span_provenance DuckDB oracle
    (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"<?php\n"
        f"require 'pkg_{k % 50:02d}';\n"
        f"function {helper}($x) {{\n"
        f"  $s = $x + {k % 13};\n"
        f"  log($s);\n"
        f"  return $s;\n"
        f"}}\n"
        f"class W_{m6} {{\n"
        f"  public function run($v) {{ return $v + {k % 7}; }}\n"
        f"}}\n"
        f"$w = new W_{m6}();\n"
        f"$t = $w->run({k % 97});\n"
        f"$u = {helper}($t);"
    )


def kotlin_code_for_key(k: int, helper: str) -> str:
    """Deterministic Kotlin script for the kotlin-mini slice of the corpus
    (``k % 11 == 1``): dotted import → DEPENDENCY, a typed-parameter
    function (static link), a class with a constructor-typed receiver call
    (CHA via the new-less constructor), and an untyped ``log`` leftover
    (NaiveCallLinker). The ``fun helper(`` head is the language sniff for
    extension-less synth doc_ids. Mirrored line-for-line by the
    cpg_span_provenance DuckDB oracle (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"import pkg_{k % 50:02d};\n"
        f"fun {helper}(x: Int): Int {{\n"
        f"  val s = x + {k % 13};\n"
        f"  log(s);\n"
        f"  return s;\n"
        f"}}\n"
        f"class W_{m6} {{\n"
        f"  fun run(v: Int): Int {{ return v + {k % 7}; }}\n"
        f"}}\n"
        f"val w = W_{m6}();\n"
        f"val t = w.run({k % 97});\n"
        f"val u = {helper}(t);"
    )


def swift_code_for_key(k: int, helper: str) -> str:
    """Deterministic Swift script for the swift-mini slice of the corpus
    (``k % 11 == 6``): dotted import → DEPENDENCY, a typed-parameter
    function with a ``-> Ret`` clause (static link; the clause is also the
    language sniff for extension-less synth doc_ids), a class with a
    constructor-typed receiver call (CHA via the new-less constructor), and
    an untyped ``log`` leftover (NaiveCallLinker). Mirrored line-for-line
    by the cpg_span_provenance DuckDB oracle (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"import pkg_{k % 50:02d};\n"
        f"func {helper}(x: Int) -> Int {{\n"
        f"  let s = x + {k % 13};\n"
        f"  log(s);\n"
        f"  return s;\n"
        f"}}\n"
        f"class W_{m6} {{\n"
        f"  func run(v: Int) -> Int {{ return v + {k % 7}; }}\n"
        f"}}\n"
        f"let w = W_{m6}();\n"
        f"let t = w.run({k % 97});\n"
        f"let u = {helper}(t);"
    )


def go_code_for_key(k: int, helper: str) -> str:
    """Deterministic Go file for the go-mini slice of the corpus
    (``k % 11 == 2``): string import → DEPENDENCY, a ``name Type``
    parameter function (static link; the ``func name(`` head is the
    language sniff), a struct with a receiver method reached through the
    ``:=``/``new(T)`` type lattice (CHA), and an untyped ``log`` leftover
    (NaiveCallLinker). Mirrored line-for-line by the cpg_span_provenance
    DuckDB oracle (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f'import "pkg_{k % 50:02d}";\n'
        f"func {helper}(x int) int {{\n"
        f"  s := x + {k % 13};\n"
        f"  log(s);\n"
        f"  return s;\n"
        f"}}\n"
        f"type W_{m6} struct {{ n int; }}\n"
        f"func (w W_{m6}) run(v int) int {{ return v + {k % 7}; }}\n"
        f"w := new(W_{m6});\n"
        f"t := w.run({k % 97});\n"
        f"u := {helper}(t);\n"
        f"log(u);"
    )


def ruby_code_for_key(k: int, helper: str) -> str:
    """Deterministic Ruby script for the ruby-mini slice of the corpus
    (``k % 11 == 4``): require → DEPENDENCY, an ``end``-delimited method
    (static link; the colon-less ``def`` + ``end`` pair is the language
    sniff), a class with an ``X.new`` constructor-typed receiver call
    (CHA), and an untyped ``log`` leftover (NaiveCallLinker). Mirrored
    line-for-line by the cpg_span_provenance DuckDB oracle
    (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"require 'pkg_{k % 50:02d}'\n"
        f"def {helper}(x)\n"
        f"  s = x + {k % 13}\n"
        f"  log(s)\n"
        f"  return s\n"
        f"end\n"
        f"class W_{m6}\n"
        f"  def run(v)\n"
        f"    return v + {k % 7}\n"
        f"  end\n"
        f"end\n"
        f"w = W_{m6}.new()\n"
        f"t = w.run({k % 97})\n"
        f"u = {helper}(t)\n"
        f"log(u)"
    )


def csharp_code_for_key(k: int, helper: str) -> str:
    """Deterministic C# file for the csharp-mini slice of the corpus
    (``k % 11 == 8``): using directive → DEPENDENCY (also the language
    sniff for extension-less synth doc_ids), a class pair with a typed
    receiver call through the ``new``-typed declaration lattice (CHA), a
    bare in-class call (static link), and an untyped ``log`` leftover
    (NaiveCallLinker). Mirrored line-for-line by the cpg_span_provenance
    DuckDB oracle (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"using pkg_{k % 50:02d};\n"
        f"class W_{m6} {{\n"
        f"  public int run(int v) {{ return v + {k % 7}; }}\n"
        f"  public int {helper}(int x) {{\n"
        f"    int s = x + {k % 13};\n"
        f"    log(s);\n"
        f"    return s;\n"
        f"  }}\n"
        f"}}\n"
        f"class P_{m6} {{\n"
        f"  static int go(int m) {{\n"
        f"    W_{m6} w = new W_{m6}();\n"
        f"    int t = w.run(m);\n"
        f"    return w.{helper}(t);\n"
        f"  }}\n"
        f"}}"
    )


def asm_code_for_key(k: int, helper: str) -> str:
    """Deterministic disassembly listing for the ghidra-mini slice of the
    corpus (``k % 11 == 10``): register-parameter functions, an internal
    CALL (exact functionByName link), the corpus-wide hot stub key ``log``
    (the skewed call-linking key), and a CMP/JNZ skip for CFG work. The
    binary artifact itself arrives as the doc's media span on the usual
    ``k % 5`` residue. Mirrored line-for-line by the cpg_span_provenance
    DuckDB oracle (cpg_oracles._SPAN_SQL)."""
    m6 = f"{k % 1000000:06d}"
    return (
        f"fn main_{m6} @ 0x401000\n"
        f"0x401000: MOV EAX, {k % 97}\n"
        f"0x401004: ADD EAX, {k % 13}\n"
        f"0x401008: CMP EAX, 64\n"
        f"0x40100c: JNZ 0x401014\n"
        f"0x401010: CALL {helper}\n"
        f"0x401014: CALL log\n"
        f"0x401018: RET\n"
        f"endfn\n"
        f"fn {helper} @ 0x401020 params EDI\n"
        f"0x401020: MOV EAX, EDI\n"
        f"0x401024: ADD EAX, {k % 7}\n"
        f"0x401028: RET\n"
        f"endfn"
    )


def synth_code_for_key(k: int, helper: str) -> str:
    """The corpus language dispatch: each ``k % 11`` residue is one
    language slice (shared by :func:`synth_docs` and the parse profiler so
    single-process attribution sees the same doc mix the pipeline parses)."""
    if k % 11 == 3:
        return js_code_for_key(k, helper)
    if k % 11 == 5:
        return jimple_code_for_key(k, helper)
    if k % 11 == 7:
        return py_code_for_key(k, helper)
    if k % 11 == 9:
        return php_code_for_key(k, helper)
    if k % 11 == 1:
        return kotlin_code_for_key(k, helper)
    if k % 11 == 6:
        return swift_code_for_key(k, helper)
    if k % 11 == 2:
        return go_code_for_key(k, helper)
    if k % 11 == 4:
        return ruby_code_for_key(k, helper)
    if k % 11 == 8:
        return csharp_code_for_key(k, helper)
    if k % 11 == 10:
        return asm_code_for_key(k, helper)
    return code_for_key(k, helper)


def synth_docs(documents: DataFrame, partitions: int | None = None) -> DataFrame:
    """documents(doc_id, ...) → docs(doc_id, spans) per the input hint.

    ``partitions`` defaults to 2× the session's default parallelism — the
    driver table often arrives as a single small parquet split, which would
    otherwise serialize the generation (and everything cached from it).
    """
    if partitions is None:
        partitions = 2 * documents.sparkSession.sparkContext.defaultParallelism
    documents = documents.repartition(partitions, "doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].astype(str):
                k = synth_key(doc_id)
                helper = f"helper_{k % 1000000:06d}"
                code = synth_code_for_key(k, helper)
                spans = split_code_spans(code, 3)
                if k % 5 == 0:
                    spans = with_media(spans, [f"bin://artifact-{doc_id}"], [1])
                rows.append(
                    {
                        "doc_id": f"synth/{doc_id}",
                        "spans": [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in spans
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return documents.select("doc_id").mapInPandas(gen, schema=DOCS_SCHEMA)
