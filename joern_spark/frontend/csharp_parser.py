"""Mini C# frontend (csharpsrc2cpg analog) for the fixture subset.

Substitutes the reference's ``csharpsrc2cpg`` (Roslyn-JSON based,
``astcreation/AstCreator.scala`` + the ``AstFor*Creator`` traits) for:
``using`` directives, ``namespace`` blocks, classes with typed methods
and auto-properties, C# primitive type keywords, ``new X()`` allocation,
and static calls through class names (``Console.WriteLine``).

The grammar is a thin layer on the Java mini-frontend (C# and Java share
the fixture subset's declaration shapes):

- ``using System.Net;`` → IMPORT (``AstForStatementsCreator`` using
  directives feed the imports/dependency machinery);
- ``namespace App { ... }`` → NAMESPACE_BLOCK wrapping the contained
  types (``AstForDeclarationsCreator.astForNamespaceDeclaration``), the
  same shape the Java frontend emits for ``package``;
- ``public int Tag { get; set; }`` auto-property → MEMBER
  (``AstForDeclarationsCreator.astForPropertyDeclaration`` lowers
  properties to member + accessor methods; the fixture subset keeps the
  member — the accessors are compiler-generated stubs);
- lower-case C# primitive types (``string``/``bool``/``object``/
  ``decimal``/``uint``) extend the type sniff the Java grammar drives.
"""

from __future__ import annotations

from .ast_model import AstNode
from .java_parser import _MODIFIERS, JavaParser, _modifier_node
from .tokenizer import Token

_CS_TYPES = {"string", "bool", "object", "decimal", "uint", "ulong", "sbyte"}


class CSharpParser(JavaParser):
    # C# lambdas use `=>` (`x => x + 1`), not Java's `->`
    ARROW = "=>"

    # --- types ---------------------------------------------------------------
    def at_type(self, k: int = 0) -> bool:
        if super().at_type(k):
            return True
        t = self.peek(k)
        nxt = self.peek(k + 1)
        return (t is not None and t.text in _CS_TYPES
                and nxt is not None and nxt.kind == "ident")

    def parse_type(self) -> str:
        t = self.peek()
        if t is not None and t.text in _CS_TYPES:
            self.eat()
            suffix = ""
            while self.at("["):
                self.eat()
                self.accept("]")
                suffix += "[]"
            return t.text + suffix
        return super().parse_type()

    # --- entry ---------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        while self.peek() is not None:
            start = self.i
            t = self.peek()
            if t.text == "using":
                self.eat()
                parts: list[str] = []
                while self.peek() is not None and not self.at(";"):
                    tok = self.eat()
                    if tok.kind == "ident" or tok.text == "*":
                        parts.append(tok.text)
                self.accept(";")
                imported = ".".join(parts)
                out.append(AstNode(
                    kind="IMPORT", name=parts[-1] if parts else "",
                    full_name=imported, code=f"using {imported}",
                    pos=t.pos, line=t.line))
            elif t.text == "namespace":
                self.eat()
                parts = []
                while self.at_kind("ident"):
                    parts.append(self.eat().text)
                    if not self.accept("."):
                        break
                ns = ".".join(parts)
                block = AstNode(kind="NAMESPACE_BLOCK", name=ns,
                                full_name=ns, code=f"namespace {ns}",
                                pos=t.pos, line=t.line)
                self.expect("{")
                order = 0
                while self.peek() is not None and not self.at("}"):
                    before = self.i
                    node = self.parse_class()
                    if node is not None:
                        order += 1
                        block.add(node, order=order)
                    if self.i == before:
                        self.eat()
                self.expect("}")
                out.append(block)
            elif t.text in _MODIFIERS or t.text in ("class", "interface") \
                    or t.text == "@":
                node = self.parse_class()
                if node is not None:
                    out.append(node)
            else:
                self.eat()
            if self.i == start:
                self.eat()
        out.extend(self._hoisted)  # `=>` lambda METHODs from expressions
        return out

    # --- members -------------------------------------------------------------
    def parse_class_member(self) -> AstNode | None:
        # auto-property probe: [mods] Type Name { get/set } → MEMBER;
        # anything else rewinds and delegates to the Java member grammar
        save = self.i
        start = self.peek()
        mod_toks: list[Token] = []
        while self.peek() is not None and self.peek().text in _MODIFIERS:
            mod_toks.append(self.eat())
        prop_type = self.parse_type()
        if prop_type and self.at_kind("ident") and self.at("{", 1):
            name_tok = self.eat()
            self.eat()  # '{'
            accessors: list[str] = []
            while self.peek() is not None and not self.at("}"):
                tok = self.eat()
                if tok.text in ("get", "set"):
                    accessors.append(tok.text)
            self.expect("}")
            member = AstNode(
                kind="MEMBER", name=name_tok.text,
                code=f"{prop_type} {name_tok.text} "
                     f"{{ {'; '.join(accessors)}; }}".replace("; ;", ";"),
                type_full_name=prop_type,
                pos=(start.pos if start else name_tok.pos),
                line=(start.line if start else name_tok.line))
            for mt in mod_toks:
                member.add(_modifier_node(mt))
            return member
        self.i = save
        return super().parse_class_member()


def parse_csharp(text: str) -> list[AstNode]:
    p = CSharpParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
