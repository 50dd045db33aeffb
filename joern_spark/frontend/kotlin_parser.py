"""Mini Kotlin frontend (kotlin2cpg analog) for the fixture subset.

Substitutes the reference's ``kotlin2cpg`` (kotlin-compiler PSI based,
``Kotlin2Cpg.scala`` pipeline, ``ast/AstCreator.scala`` + the
``AstFor*Creator`` traits) for: ``fun`` declarations with ``name: Type``
parameters and ``: Ret`` return-type suffixes, classes with ``fun`` methods
and ``val/var`` properties, ``val``/``var`` locals, dotted ``import``
statements, and Kotlin's new-less constructor invocations.

Lowering conventions follow kotlin2cpg:

- file-level statements live in a synthetic ``:program`` METHOD — shared
  with the JS frontend (kotlin2cpg wraps scripts the same way its
  ``AstCreator`` wraps lambdas; the fixture subset only uses script-style
  top level);
- ``fun f(x: Int): Int`` → METHOD with typed parameters and typed
  METHOD_RETURN (``AstForFunctionsCreator.astForMethod``); the ``fun``
  keyword is token-rewritten to ``function`` (positions preserved, so every
  ``code`` slice keeps the original Kotlin text) and the shared JS/Java
  declaration machinery applies unchanged;
- constructor invocation has no ``new``: a bare call whose callee is a
  class declared in the same file becomes ``<operator>.alloc`` typed by the
  class (``AstForFunctionsCreator.astForObjectLiteralExpr`` /
  ``astForConstructorCall`` alloc+init lowering), seeding the declared-type
  lattice for CHA exactly like the JS ``new`` path; a bare call to an
  unknown capitalized name is an external constructor —
  ``full_name = X.<init>`` (kotlin2cpg emits ``<init>`` full names for
  resolved constructor calls, ``AstForFunctionsCreator.scala``), the anchor
  the kotlin querydb pack matches on (NetworkProtocols.scala:13-29);
- ``val x = W()`` declares a LOCAL (``AstForDeclarationsCreator
  .astsForProperty``) whose type comes from the constructor-typed RHS;
- ``import a.b.c`` → IMPORT ``c`` / full name ``a.b.c`` feeding
  DependenciesPass (kotlin2cpg ``DependenciesFromMavenCoordinatesPass`` is
  build-file based; source imports are what the fixture subset carries).

The fixture subset uses explicit ``;`` statement terminators (valid
Kotlin); newline-terminated statements are outside the subset, like the
other mini-frontends' documented syntax envelopes.
"""

from __future__ import annotations

from .ast_model import OP_ALLOC, AstNode, STATIC_DISPATCH
from .java_parser import _MODIFIERS, _modifier_node
from .js_parser import JsParser
from .tokenizer import Token

_KT_DECL = ("val", "var")


class KotlinParser(JsParser):
    # subclass points (swift-mini reuses the whole grammar with these three
    # dials turned: `func` keyword, `let` declarations, `->` return marker)
    FUNC_KW = "fun"
    DECL_KWS = _KT_DECL

    def __init__(self, text: str):
        super().__init__(text)
        # `fun` drives the shared `function` machinery; positions are
        # preserved so code slices keep the original Kotlin spelling
        self.toks = [Token(t.kind, "function", t.pos, t.line)
                     if t.text == self.FUNC_KW else t for t in self.toks]
        # constructor-call type lattice: classes declared in this file
        # (prescan, mirroring the Python frontend's known_classes)
        self.known_classes: set[str] = {
            self.toks[j + 1].text
            for j, tok in enumerate(self.toks[:-1])
            if tok.text == "class" and self.toks[j + 1].kind == "ident"
        }

    # --- declarations ----------------------------------------------------------
    def parse_function(self, ret_type: str, name_tok: Token,
                       start_tok: Token) -> AstNode:
        """Kotlin parameter grammar: ``name: Type`` per parameter, optional
        ``: Ret`` after the parameter list (AstForFunctionsCreator)."""
        method = AstNode(kind="METHOD", name=name_tok.text,
                         full_name=name_tok.text,
                         pos=start_tok.pos, line=start_tok.line)
        self.expect("(")
        params: list[AstNode] = []
        param_types: list[str] = []
        while self.peek() is not None and not self.at(")"):
            p_start = self.peek()
            p_name = self.eat().text if self.at_kind("ident") \
                else f"p{len(params) + 1}"
            p_name = self._param_name(p_name)
            p_type = "ANY"
            if self.accept(":") and self.at_kind("ident"):
                p_type = self.eat().text
            params.append(AstNode(
                kind="METHOD_PARAMETER_IN", name=p_name,
                code=self.slice(p_start.pos), pos=p_start.pos,
                line=p_start.line, type_full_name=p_type))
            param_types.append(p_type)
            if not self.accept(","):
                break
        self.expect(")")
        ret = ret_type or "ANY"
        if self._accept_ret_marker() and self.at_kind("ident"):
            ret = self.eat().text
        method.signature = f"{ret}({','.join(param_types)})"
        method.code = self.slice(start_tok.pos).strip()
        for idx, p in enumerate(params, start=1):
            p.argument_index = idx
            method.add(p, order=idx)
        self._on_params(params)
        if self.at("{"):
            method.add(self.parse_compound(), order=len(params) + 1)
        else:
            self.accept(";")
            method.is_external = True
            method.add(AstNode(kind="BLOCK", code="<empty>"),
                       order=len(params) + 1)
        method.add(
            AstNode(kind="METHOD_RETURN", code="RET", type_full_name=ret,
                    line=name_tok.line, pos=name_tok.pos),
            order=len(params) + 2)
        return method

    def _param_name(self, first: str) -> str:
        """Kotlin parameters are single-named; Swift overrides this to
        resolve ``external internal: Type`` label pairs."""
        return first

    def _accept_ret_marker(self) -> bool:
        """``: Ret`` in Kotlin; Swift overrides with ``-> Ret``."""
        return self.accept(":")

    def parse_class_member(self) -> AstNode | None:
        mods: list[Token] = []
        while self.peek() is not None and self.peek().text in _MODIFIERS:
            mods.append(self.eat())
        t = self.peek()
        if t is not None and t.text == "function":
            m = self.parse_js_function()
            for mt in mods:
                m.add(_modifier_node(mt))
            return m
        if t is not None and t.text in self.DECL_KWS \
                and self.at_kind("ident", 1):
            # property: `val x = init;` → MEMBER (astsForProperty)
            self.eat()
            name_tok = self.eat()
            member_type = "ANY"
            if self.accept(":") and self.at_kind("ident"):
                member_type = self.eat().text
            while self.peek() is not None and not self.at(";"):
                self.eat()
            self.accept(";")
            member = AstNode(kind="MEMBER", name=name_tok.text,
                             code=f"{t.text} {name_tok.text}",
                             type_full_name=member_type,
                             pos=name_tok.pos, line=name_tok.line)
            for mt in mods:
                member.add(_modifier_node(mt))
            return member
        return super().parse_class_member()

    # --- statements ----------------------------------------------------------
    def parse_statement(self) -> list[AstNode]:
        t = self.peek()
        if t is not None and t.text in self.DECL_KWS \
                and self.at_kind("ident", 1):
            return self.parse_js_declaration()
        return super().parse_statement()

    def parse_js_import(self) -> AstNode | None:
        # `import a.b.c;` — dotted idents, not a string module
        t = self.eat()  # 'import'
        parts: list[str] = []
        while self.peek() is not None and not self.at(";"):
            tok = self.eat()
            if tok.kind == "ident" or tok.text == "*":
                parts.append(tok.text)
        self.accept(";")
        if not parts:
            return None
        full = ".".join(parts)
        return AstNode(kind="IMPORT", name=parts[-1], full_name=full,
                       code=f"import {full}", pos=t.pos, line=t.line)

    # --- expressions ----------------------------------------------------------
    def parse_postfix(self) -> AstNode | None:
        node = super().parse_postfix()
        # new-less constructor invocation: a bare capitalized call is a
        # constructor — alloc for same-file classes (CHA type seed), an
        # external `X.<init>` otherwise (the kotlin querydb anchor)
        if (node is not None and node.kind == "CALL"
                and node.dispatch_type == STATIC_DISPATCH
                and node.name and node.name[0].isupper()
                and not node.name.startswith("<")
                and node.full_name in (
                    node.name,
                    f"{self.current_class}.{node.name}")):
            if node.name in self.known_classes:
                node.type_full_name = node.name
                node.name = OP_ALLOC
                node.full_name = OP_ALLOC
            else:
                cls = node.name
                node.name = "<init>"
                node.full_name = f"{cls}.<init>"
                node.type_full_name = cls
        return node


def parse_kotlin(text: str) -> list[AstNode]:
    p = KotlinParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
