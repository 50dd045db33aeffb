"""Lower a parsed document (AstNode trees) to CPG node/edge row dicts.

One call == the reference's per-file ``AstCreationPass.runOnPart`` +
``Ast.storeInDiffGraph`` (``x2cpg/.../Ast.scala:25-52``: AST, ARGUMENT,
CONDITION, RECEIVER edges) + ``ContainsEdgePass`` (``x2cpg/.../passes/base/
ContainsEdgePass.scala:14-47`` — the tree is document-local, so transitive
CONTAINS is derivable in the same pass) + ``FileCreationPass`` SOURCE_FILE
edges for this document's FILE node.

Runs inside the vectorized parse UDF; pure function of (doc_id, spans) with
deterministic ids, so any partition can be recomputed independently.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any

from ..ids import node_id, stub_id
from .ast_model import AstNode
from .c_parser import parse_c

_JAVA_HINT = re.compile(r"\bclass\s+\w+|\bpublic\s+class\b|\binterface\s+\w+")
_JS_HINT = re.compile(
    r"\bfunction\s+\w+\s*\(|\b(?:let|const|var)\s+\w+\s*=|\brequire\s*\(")
# fork-specific macro model (NodeTypeStarters.scala:180-190): the tokenizer
# drops preprocessor lines, so #define declarations are lifted here
_DEFINE_RE = re.compile(
    r"^[ \t]*#[ \t]*define[ \t]+([A-Za-z_]\w*)(\([^)\n]*\))?[ \t]*([^\n]*)$",
    re.M,
)
_INCLUDE_RE = re.compile(
    r"^[ \t]*#[ \t]*include[ \t]+[<\"]([^>\"\n]+)[>\"]", re.M,
)
# XConfigFileCreationPass filters (x2cpg/.../frontend/
# XConfigFileCreationPass.scala:64-71 extension/pathEnd filters): config docs
# become a CONFIG_FILE node (name + content) instead of a parse tree.
# gradle/kts per kotlin2cpg's config picker (SourceFilesPicker.scala:50-60,
# ConfigPass.scala:16-20) — the android querydb pack scans build.gradle
_CONFIG_RE = re.compile(
    r"\.(json|xml|ya?ml|properties|toml|tfvars|tf|conf|cfg|ini|vm|jsp"
    r"|gradle|kts)$"
    r"|(^|/)(MANIFEST\.MF|routes|Dockerfile)$"
)

# node kinds that own CONTAINS scopes (reference ContainsEdgePass.scala:20-28)
_CONTAINS_ROOTS = {"METHOD", "TYPE_DECL", "FILE"}
# node kinds skipped as CONTAINS targets (reference: only CFG-relevant +
# declarations get CONTAINS; we include all AST nodes except roots, matching
# ContainsEdgePass which links every AST descendant to its nearest root)


_PY_HINT = re.compile(r"^\s*def\s+\w+\s*\(.*\)\s*:", re.M)


_JIMPLE_HINT = re.compile(r":=\s*@(this|parameter\d+|caughtexception)\b|\b(virtual|special|static|interface)invoke\b")


_KT_HINT = re.compile(r"\bfun\s+\w+\s*\(")

# `func f(...) ->` is Swift's FunctionSignatureSyntax; Go's `func` never
# carries `->`. Java's `package` lines must NOT trip the Go sniff, so the
# sniff keys on `func` alone (every Go doc in the subset declares one).
_SWIFT_HINT = re.compile(r"\bfunc\s+\w+\s*\([^)]*\)\s*->")
_GO_HINT = re.compile(r"\bfunc\s+(\(|\w+\s*\()")
# `def f(args)` WITHOUT a trailing colon + an `end` keyword is Ruby; the
# Python sniff (colon-terminated def) runs first and wins for Python
_RB_HINT = re.compile(r"\bdef\s+\w+[^\n:]*\n.*\bend\b", re.S)
# a line-leading `using X;` directive is C# (Java spells it `import`)
_CS_HINT = re.compile(r"^using\s+\w[\w.]*\s*;", re.M)
# ghidra-mini disassembly listing: `fn name @ 0xADDR [params ...]`
_ASM_HINT = re.compile(r"^fn\s+\w+\s+@\s+0x[0-9a-fA-F]+", re.M)


def detect_language(doc_id: str, text: str) -> str:
    # disassembly listings (ghidra-mini): `fn name @ 0xADDR` headers exist in
    # no source language — check first, it can't misfire
    if doc_id.endswith(".asm") or "/asm/" in doc_id or _ASM_HINT.search(text):
        return "asm"
    if doc_id.endswith(".php") or "/php/" in doc_id or "<?php" in text:
        return "php"
    if doc_id.endswith(".kt") or "/kotlin/" in doc_id or _KT_HINT.search(text):
        return "kotlin"
    if doc_id.endswith(".swift") or "/swift/" in doc_id \
            or _SWIFT_HINT.search(text):
        return "swift"
    if doc_id.endswith(".go") or "/go/" in doc_id or _GO_HINT.search(text):
        return "go"
    if doc_id.endswith(".rb") or "/ruby/" in doc_id:
        return "ruby"
    if doc_id.endswith(".cs") or "/csharp/" in doc_id \
            or _CS_HINT.search(text):
        return "csharp"
    if doc_id.endswith(".js") or "/js" in doc_id:
        return "js"
    if doc_id.endswith(".jimple") or "/jimple/" in doc_id:
        return "jimple"
    if doc_id.endswith(".java") or "/java" in doc_id:
        return "java"
    if doc_id.endswith(".py") or "/py/" in doc_id:
        return "py"
    # bytecode sniff: identity statements / typed invokes exist only in Jimple
    if _JIMPLE_HINT.search(text):
        return "jimple"
    # content sniff: the JS markers (function/let/const/require) never appear
    # in the C/Java fixture subset, while `class X` appears in both Java and
    # JS — so JS wins only on its own markers; `def f(...):` only in Python
    if _PY_HINT.search(text):
        return "py"
    if _RB_HINT.search(text):
        return "ruby"
    if _JS_HINT.search(text):
        return "js"
    # `template <typename T>` / `template <class U>` headers are C++
    # (c2cpg territory) — must win over the Java `class` sniff, since
    # `template <class U>` contains that keyword. The parameter keyword is
    # required so a variable named `template` compared with `<` can't
    # reroute a Java doc here.
    if re.search(r"\btemplate\s*<\s*(typename|class)\b", text):
        return "c"
    if _JAVA_HINT.search(text):
        return "java"
    return "c"


def _empty_node_row() -> dict[str, Any]:
    return {
        "node_id": None, "doc_id": None, "kind": None, "name": None,
        "full_name": None, "code": None, "signature": None,
        "dispatch_type": None, "order": None, "argument_index": None,
        "line": None, "span_offset": None, "type_full_name": None,
        "is_external": None, "media_ref": None, "parent_id": None,
        "method_id": None, "ctrl_type": None, "filename": None,
    }


def lower_doc(doc_id: str, spans: list[dict[str, Any]]) -> tuple[list[dict], list[dict], list[dict]]:
    """Returns (node_rows, edge_rows, span_provenance_rows)."""
    spans = sorted(spans, key=lambda s: s["offset"])
    code_parts: list[str] = []
    boundaries: list[tuple[int, int]] = []  # (start_char, span_offset)
    cursor = 0
    span_rows: list[dict] = []
    for s in spans:
        span_rows.append(
            {"doc_id": doc_id, "span_offset": int(s["offset"]), "kind": s["kind"],
             "text": s["text"] or "", "media_ref": s["media_ref"] or ""}
        )
        if s["kind"] == "code":
            boundaries.append((cursor, int(s["offset"])))
            code_parts.append(s["text"] or "")
            cursor += len(s["text"] or "") + 1  # +1 for the joining newline
    text = "\n".join(code_parts)

    def span_of(pos: int) -> int:
        off = boundaries[0][1] if boundaries else 0
        for start, soff in boundaries:
            if pos >= start:
                off = soff
            else:
                break
        return off

    nodes: list[dict] = []
    edges: list[dict] = []
    counter = [0]

    # per-offset blake2b prefix hashers: node_id(doc, off, ctr) hashes
    # "n\x1fdoc\x1foff\x1fctr"; the prefix up to the counter is constant per
    # span offset, so hash it once and .copy() per node (bit-identical to
    # ids.node_id — locked by test_ids_prefix_equivalence)
    _id_pref: dict[int, "hashlib._Hash"] = {}

    def next_id(pos: int) -> int:
        counter[0] += 1
        off = span_of(pos)
        h = _id_pref.get(off)
        if h is None:
            h = hashlib.blake2b(
                f"n\x1f{doc_id}\x1f{off}\x1f".encode("utf-8"), digest_size=8)
            _id_pref[off] = h
        h = h.copy()
        h.update(str(counter[0]).encode("utf-8"))
        return int.from_bytes(h.digest(), "big") >> 1

    # FILE node
    file_id = node_id(doc_id, -1, 0)
    file_row = _empty_node_row()
    file_row.update(
        node_id=file_id, doc_id=doc_id, kind="FILE", name=doc_id,
        full_name=doc_id, code="", order=0, argument_index=0, line=0,
        span_offset=-1, filename=doc_id,
    )
    nodes.append(file_row)

    is_key = doc_id.endswith(".key") and re.search(r"RSA\sPRIVATE\sKEY", text)
    if _CONFIG_RE.search(doc_id) or is_key:
        # XConfigFileCreationPass.runOnPart: NewConfigFile().name(..).content(..);
        # .key files holding private keys get their content REDACTED
        # (jssrc2cpg PrivateKeyFilePass.fileContent)
        cfg = _empty_node_row()
        cfg.update(
            node_id=node_id(doc_id, -1, 1), doc_id=doc_id, kind="CONFIG_FILE",
            name=doc_id, full_name=doc_id,
            code="Content omitted for security reasons." if is_key else text,
            order=1,
            argument_index=0, line=1, span_offset=boundaries[0][1] if boundaries else 0,
            is_external=False, media_ref="", parent_id=file_id, filename=doc_id,
        )
        nodes.append(cfg)
        edges.append(_edge(file_id, cfg["node_id"], "AST", doc_id, None))
        return nodes, edges, span_rows

    lang = detect_language(doc_id, text)
    if lang == "java":
        from .java_parser import parse_java
        tops = parse_java(text)
    elif lang == "js":
        from .js_parser import parse_js
        tops = parse_js(text)
    elif lang == "py":
        from .py_parser import parse_py
        tops = parse_py(text)
    elif lang == "jimple":
        from .jimple_parser import parse_jimple
        tops = parse_jimple(text)
    elif lang == "php":
        from .php_parser import parse_php
        tops = parse_php(text)
    elif lang == "kotlin":
        from .kotlin_parser import parse_kotlin
        tops = parse_kotlin(text)
    elif lang == "swift":
        from .swift_parser import parse_swift
        tops = parse_swift(text)
    elif lang == "go":
        from .go_parser import parse_go
        tops = parse_go(text)
    elif lang == "ruby":
        from .ruby_parser import parse_ruby
        tops = parse_ruby(text)
    elif lang == "csharp":
        from .csharp_parser import parse_csharp
        tops = parse_csharp(text)
    elif lang == "asm":
        from .ghidra_parser import parse_ghidra
        tops = parse_ghidra(text)
    else:
        tops = parse_c(text)

    # MACRO_DECL emission + MACRO_REF conversion: object-like macro uses are
    # parsed as identifiers — retag them MACRO_REF; function-like macro call
    # sites stay CALLs and are REF-linked by macro_ref_linker on (doc, name)
    # #include lines → IMPORT nodes (the XImportsPass analog the Java parser
    # already has for `import` statements; DependenciesPass derives the
    # DEPENDENCY universe from these downstream)
    macro_tops: list[AstNode] = []
    for m in _INCLUDE_RE.finditer(text):
        macro_tops.append(AstNode(
            kind="IMPORT", name=m.group(1), full_name=m.group(1),
            code=m.group(0).strip(), pos=m.start(),
            line=text.count("\n", 0, m.start()) + 1,
        ))
    macro_names: set[str] = set()
    for m in _DEFINE_RE.finditer(text):
        macro_names.add(m.group(1))
        macro_tops.append(AstNode(
            kind="MACRO_DECL", name=m.group(1), full_name=m.group(1),
            code=m.group(0).strip(), pos=m.start(),
            line=text.count("\n", 0, m.start()) + 1,
            signature=(m.group(2) or ""),
        ))
    if macro_names:
        for top in tops:
            for n in top.walk():
                if n.kind == "IDENTIFIER" and n.name in macro_names:
                    n.kind = "MACRO_REF"
                    n.full_name = n.name
    tops = macro_tops + tops

    # METHOD_REF emission: an identifier in non-call position whose name is a
    # method defined in this translation unit is a function reference
    # (function pointers / callbacks). Call positions are already CALL nodes,
    # so every surviving IDENTIFIER with a method's name qualifies.
    # (reference: c2cpg AstCreator function-pointer handling feeding
    # MethodRefLinker.scala:12-29)
    method_full: dict[str, str] = {}
    for top in tops:
        for n in top.walk():
            if n.kind == "METHOD" and n.name:
                method_full.setdefault(n.name, n.full_name or n.name)
    if method_full:
        # scope-aware: a local/parameter that SHADOWS a function name keeps
        # its IDENTIFIER kind (else it silently drops out of REACHING_DEF
        # generation, type recovery, and usage slices — round-2 ADVICE)
        def _retag(n: AstNode, shadowed: frozenset) -> None:
            if n.kind == "METHOD":
                shadowed = frozenset(
                    c.name for c in n.walk()
                    if c.kind in ("LOCAL", "METHOD_PARAMETER_IN"))
            elif (n.kind == "IDENTIFIER" and n.name in method_full
                    and n.name not in shadowed):
                n.kind = "METHOD_REF"
                n.full_name = method_full[n.name]
            for c in n.children:
                _retag(c, shadowed)

        for top in tops:
            _retag(top, frozenset())

    def emit(n: AstNode, parent_id: int | None, method_id: int | None,
             scope_root_id: int | None) -> int:
        nid = next_id(n.pos)
        this_method = nid if n.kind == "METHOD" else method_id
        # one dict literal (hot path: one per CPG node) — same keys as
        # _empty_node_row, built in a single pass instead of copy+update
        row = {
            "node_id": nid, "doc_id": doc_id, "kind": n.kind, "name": n.name,
            "full_name": n.full_name, "code": n.code,
            "signature": n.signature, "dispatch_type": n.dispatch_type,
            "order": int(n.order), "argument_index": int(n.argument_index),
            "line": int(n.line), "span_offset": span_of(n.pos),
            "type_full_name": n.type_full_name,
            "is_external": bool(n.is_external), "media_ref": "",
            "parent_id": parent_id, "method_id": this_method,
            "ctrl_type": n.ctrl_type, "filename": doc_id,
        }
        nodes.append(row)
        this_scope = nid if n.kind in _CONTAINS_ROOTS else scope_root_id
        if parent_id is not None:
            edges.append(_edge(parent_id, nid, "AST", doc_id, this_method))
        if scope_root_id is not None and n.kind not in _CONTAINS_ROOTS:
            edges.append(_edge(scope_root_id, nid, "CONTAINS", doc_id, this_method))
        elif scope_root_id is not None and n.kind in _CONTAINS_ROOTS:
            edges.append(_edge(scope_root_id, nid, "CONTAINS", doc_id, method_id))
        if n.kind in ("METHOD", "TYPE_DECL"):
            edges.append(_edge(nid, file_id, "SOURCE_FILE", doc_id, this_method))
        if n.kind == "TYPE_DECL" and n.type_full_name:
            # INHERITS_FROM targets are global TYPE stubs whose ids are content
            # hashes of the full name — linkable without a join (reference
            # TypeHierarchyPass.scala:11-30 does explode+join; determinism of
            # stub ids lets the hot path skip it, TYPE rows are created later).
            for sup in n.type_full_name.split(","):
                if sup:
                    edges.append(_edge(nid, stub_id("TYPE", sup), "INHERITS_FROM",
                                       doc_id, this_method))
        for c in n.children:
            cid = emit(c, nid, this_method, this_scope)
            if c.argument_index and n.kind in ("CALL", "RETURN"):
                edges.append(_edge(nid, cid, "ARGUMENT", doc_id, this_method))
            if c.is_condition:
                edges.append(_edge(nid, cid, "CONDITION", doc_id, this_method))
            if c.is_receiver:
                edges.append(_edge(nid, cid, "RECEIVER", doc_id, this_method))
        return nid

    for top in tops:
        emit(top, file_id, None, file_id)

    return nodes, edges, span_rows


def _edge(src: int, dst: int, kind: str, doc_id: str, method_id: int | None) -> dict:
    return {"src": src, "dst": dst, "kind": kind, "variable": "",
            "doc_id": doc_id, "method_id": method_id}
