"""Mini PHP frontend (php2cpg analog) for the fixture subset.

Substitutes the reference's ``php2cpg`` (php-parser JSON based,
``Php2Cpg.scala`` pipeline) for: ``<?php … ?>`` scripts, ``function``
declarations with ``$``-sigil parameters, classes with ``public/private``
method modifiers, ``$obj->m(x)`` dynamic dispatch, ``new X()`` allocation,
``echo``/``require``/``include`` statements, and superglobal reads
(``$_REQUEST['k']`` → indexAccess whose code keeps the sigil, the shape the
querydb php pack sources on).

Lowering conventions follow php2cpg:

- identifiers and locals are named WITHOUT the ``$`` sigil while their code
  keeps it (``LocalCreationPass.scala:52-60``: ``code = s"$$$name"``); the
  implicit receiver parameter is plain ``this``
  (``AstCreator.thisParamAstForMethod``, ``AstCreator.scala:151-166``);
- ``echo a, b`` → a CALL named ``echo`` with one argument per expression
  (``astForEchoStmt``, ``AstCreator.scala:143-148``);
- ``require 'm'`` / ``include_once 'm'`` → a CALL named after the include
  type (``astForIncludeExpr``, ``AstCreator.scala:1658-1664``); string-literal
  includes are additionally lifted to IMPORT tops so DependenciesPass sees
  them (this fork's analog of ``PhpDependencyPass`` composer scanning);
- every method body is prepended with one LOCAL per assigned/read variable,
  sorted by name (``MethodLocalPass`` / ``NamespaceLocalPass``,
  ``LocalCreationPass.scala:23-129``; the file-level ``:program`` method is
  the NamespaceBlock scope analog);
- ``$x->f(y)`` is a DYNAMIC_DISPATCH call with the receiver as argument 0;
  ``$x->f`` → ``<operator>.fieldAccess`` (``AstCreator.scala:852,1019,1653``)
  — ``->`` is token-rewritten to ``.`` so the shared Java/JS postfix
  machinery applies unchanged (PHP's only other dot, string concat, is
  outside the fixture subset and documented as such);
- ``new X()`` → ``<operator>.alloc`` typed ``X`` (inherited from the JS
  parser; php2cpg ``astForNewExpr``, ``AstCreator.scala:1344``) and a plain
  ``$x = new X()`` assignment seeds the declared-type lattice used for CHA
  receiver typing, mirroring ``PhpTypeRecoveryPass`` constructor inference.
"""

from __future__ import annotations

import re

from .ast_model import AstNode, STATIC_DISPATCH
from .java_parser import _MODIFIERS, _modifier_node
from .js_parser import JsParser
from .tokenizer import Token

# tags vanish (offset-preserving) before tokenization: the reference's
# php-parser only ever sees code between them
_PHP_TAGS = re.compile(r"<\?php|<\?=|\?>")

_INCLUDE_KINDS = ("require", "require_once", "include", "include_once")


class PhpParser(JsParser):
    # PHP's `=>` is the array key-value separator (`[$k => $v]`), never a
    # bare arrow function (those use the `fn(...) =>` keyword form) — the
    # inherited ident-then-ARROW lookahead must not misfire on array keys
    def _at_arrow(self) -> bool:
        return False

    def __init__(self, text: str):
        clean = _PHP_TAGS.sub(lambda m: " " * len(m.group()), text)
        super().__init__(clean)
        # `->` == member access; rewrite the token so the shared postfix
        # machinery (dynamic call / fieldAccess) applies verbatim
        self.toks = [Token("op", ".", t.pos, t.line) if t.text == "->" else t
                     for t in self.toks]

    # --- identifiers ---------------------------------------------------------
    def parse_primary(self) -> AstNode | None:
        t = self.peek()
        if t is not None and t.kind == "ident" and t.text.startswith("$"):
            self.eat()
            name = t.text[1:]
            return AstNode(kind="IDENTIFIER", name="this" if name == "this" else name,
                           code=t.text, pos=t.pos, line=t.line)
        return super().parse_primary()

    def _on_params(self, params: list[AstNode]) -> None:
        # `function f($a)` → parameter named `a` (php-parser strips the sigil)
        for p in params:
            if p.name.startswith("$"):
                p.name = p.name[1:]
        super()._on_params(params)

    # --- statements ----------------------------------------------------------
    def parse_statement(self) -> list[AstNode]:
        t = self.peek()
        if t is not None and t.kind == "ident" and t.text == "echo":
            self.eat()
            call = AstNode(kind="CALL", name="echo", full_name="echo",
                           dispatch_type=STATIC_DISPATCH, pos=t.pos, line=t.line)
            idx = 0
            while self.peek() is not None and not self.at(";"):
                arg = self.parse_assignment_expr()
                if arg is None:
                    break
                idx += 1
                call.add(arg, order=idx, argument_index=idx)
                if not self.accept(","):
                    break
            self.accept(";")
            call.code = self.text[t.pos:self._prev_end()].strip()
            return [call]
        if t is not None and t.kind == "ident" and t.text in _INCLUDE_KINDS:
            kind_tok = self.eat()
            arg = self.parse_assignment_expr()
            self.accept(";")
            call = AstNode(kind="CALL", name=kind_tok.text,
                           full_name=kind_tok.text,
                           dispatch_type=STATIC_DISPATCH,
                           pos=kind_tok.pos, line=kind_tok.line)
            if arg is not None:
                call.add(arg, order=1, argument_index=1)
            call.code = self.text[kind_tok.pos:self._prev_end()].strip()
            return [call]
        return super().parse_statement()

    # --- declarations ----------------------------------------------------------
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
        if t is not None and t.kind == "ident" and t.text.startswith("$"):
            # property: `public $x;` / `public $x = init;` → MEMBER
            name_tok = self.eat()
            while self.peek() is not None and not self.at(";"):
                self.eat()
            self.accept(";")
            member = AstNode(kind="MEMBER", name=name_tok.text[1:],
                             code=name_tok.text, type_full_name="ANY",
                             pos=name_tok.pos, line=name_tok.line)
            for mt in mods:
                member.add(_modifier_node(mt))
            return member
        return super().parse_class_member()

    def parse_js_function(self) -> AstNode:
        m = super().parse_js_function()
        self._prepend_locals(m)
        return m

    def parse_translation_unit(self) -> list[AstNode]:
        tops = super().parse_translation_unit()
        # NamespaceLocalPass analog: the synthetic :program method gets
        # file-level locals too (LocalCreationPass.scala:114-120)
        for top in tops:
            if top.kind == "METHOD" and top.name == ":program":
                self._prepend_locals(top)
        return tops

    def _prepend_locals(self, method: AstNode) -> None:
        """MethodLocalPass analog (LocalCreationPass.scala:23-129): one LOCAL
        per sigil variable used in the body that is not a parameter, sorted by
        name, prepended to the body block (order 0 keeps CFG ordering of the
        existing children untouched — locals are not CFG nodes)."""
        taken = {c.name for c in method.children
                 if c.kind == "METHOD_PARAMETER_IN"}
        taken.add("this")
        body = next((c for c in method.children if c.kind == "BLOCK"), None)
        if body is None:
            return
        first_use: dict[str, AstNode] = {}
        for n in body.walk():
            if (n.kind == "IDENTIFIER" and n.code.startswith("$")
                    and n.name not in taken and n.name not in first_use):
                first_use[n.name] = n
        locs = [AstNode(kind="LOCAL", name=nm, code=f"${nm}",
                        type_full_name="ANY", pos=use.pos, line=use.line,
                        order=0)
                for nm, use in sorted(first_use.items())]
        body.children[:0] = locs

    # --- expressions ----------------------------------------------------------
    def parse_assignment_expr(self) -> AstNode | None:
        node = super().parse_assignment_expr()
        # `$x = new X()` seeds the declared-type lattice for CHA receiver
        # typing (php2cpg PhpTypeRecoveryPass constructor inference)
        if (node is not None and node.kind == "CALL"
                and node.name == "<operator>.assignment"
                and len(node.children) == 2
                and node.children[0].kind == "IDENTIFIER"):
            tfn = node.children[1].type_full_name
            if tfn and tfn != "ANY":
                self.var_types[node.children[0].name] = tfn
                node.children[0].type_full_name = tfn
        return node


def parse_php(text: str) -> list[AstNode]:
    p = PhpParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
