"""Mini Ruby frontend (rubysrc2cpg analog) for the fixture subset.

Substitutes the reference's ``rubysrc2cpg`` (ANTLR RubyParser based,
``astcreation/AstCreator.scala`` + the ``AstFor*`` traits) for: ``def``
methods with untyped parameters, ``class``/``<`` inheritance with ``def``
members, ``end``-delimited blocks, ``if``/``elsif``/``else``/``while``
statements, ``require 'mod'`` dependencies, ``X.new`` allocation, and
``@ivar`` instance variables.

Lowering conventions follow rubysrc2cpg:

- file-level statements live in a synthetic ``:program`` METHOD
  (``AstCreator`` wraps the script body in ``:program``);
- a name's first assignment in a scope declares a LOCAL in that scope
  (shared with the Python mini-frontend — Ruby scoping works the same
  way for the fixture subset);
- ``X.new(...)`` is constructor invocation: ``<operator>.alloc`` typed
  ``X`` for a same-file class (seeding the declared-type lattice for
  CHA), ``X.<init>`` for an external class
  (``AstForExpressionsCreator`` objectInstantiation lowering);
- a capitalized bare identifier is a constant — receiver calls through
  it dispatch statically on the class name, like Java;
- ``@ivar`` parses as an IDENTIFIER named ``@ivar`` (the mini analog of
  rubysrc2cpg's self-fieldAccess lowering; the reaching-def and linker
  passes see a stable name either way);
- ``require 'm'`` → IMPORT nodes feeding DependenciesPass
  (``RubyImportsPass`` analog).

Blocks are recovered from the ``end`` keyword: a block is the statement
run up to the matching ``end``/``else``/``elsif`` token — nested
``def``/``class``/``if``/``while`` constructs consume their own ``end``
first, so the sentinel scan needs no counting. Statements terminate at
token boundaries (newlines need no ``;`` — the expression grammar stops
at the next non-operator token, which is how Ruby's own parser behaves
for this subset).
"""

from __future__ import annotations

from .ast_model import OP_ALLOC, AstNode, operator_call
from .py_parser import PyParser
from .tokenizer import Token

_RB_BLOCK_KWS = ("if", "while", "def", "class")
_RB_STOPS = ("end", "else", "elsif")


class RubyParser(PyParser):
    def __init__(self, text: str):
        super().__init__(text)
        # `new` must be an identifier so `X.new(...)` parses as a method
        # call (the kw token would fall into the fieldAccess branch)
        self.toks = [Token("ident", "new", t.pos, t.line)
                     if t.text == "new" else t for t in self.toks]

    # --- entry ---------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        prog = AstNode(kind="METHOD", name=":program", full_name=":program",
                       code=":program", signature="void()", pos=0, line=1)
        body = AstNode(kind="BLOCK", pos=0, line=1)
        while self.peek() is not None:
            start_i = self.i
            t = self.peek()
            if t.text == "def":
                out.append(self.parse_ruby_def())
            elif t.text == "class":
                out.append(self.parse_ruby_class())
            elif t.text == "require":
                imp = self.parse_ruby_require()
                if imp is not None:
                    out.append(imp)
            else:
                for st in self.parse_ruby_statement():
                    body.add(st)
            if self.i == start_i:
                self.eat()
        if body.children:
            prog.add(body, order=1)
            prog.add(AstNode(kind="METHOD_RETURN", code="RET",
                             type_full_name="ANY", pos=0, line=1), order=2)
            out.append(prog)
        out.extend(self._hoisted)  # lambda METHODs from expression position
        return out

    def parse_ruby_require(self) -> AstNode | None:
        t = self.eat()  # 'require'
        tok = self.peek()
        if tok is None or tok.kind not in ("str", "char"):
            return None
        self.eat()
        mod = tok.text.strip("\"'")
        return AstNode(kind="IMPORT", name=mod, full_name=mod,
                       code=f"require '{mod}'", pos=t.pos, line=t.line)

    # --- defs / classes -------------------------------------------------------
    def parse_ruby_def(self) -> AstNode:
        start = self.eat()  # 'def'
        name_tok = self.eat() if self.at_kind("ident") else Token(
            "ident", "<lambda>", start.pos, start.line)
        method = AstNode(
            kind="METHOD", name=name_tok.text,
            full_name=(f"{self.current_class}.{name_tok.text}"
                       if self.current_class else name_tok.text),
            pos=start.pos, line=start.line)
        prev_vars = self.var_types
        self.var_types = {}
        params: list[AstNode] = []
        if self.accept("("):
            while self.peek() is not None and not self.at(")"):
                if not self.at_kind("ident"):
                    self.eat()
                    continue
                p_tok = self.eat()
                self.var_types[p_tok.text] = "ANY"
                params.append(AstNode(
                    kind="METHOD_PARAMETER_IN", name=p_tok.text,
                    code=p_tok.text, pos=p_tok.pos, line=p_tok.line,
                    type_full_name="ANY"))
                self.accept(",")
            self.expect(")")
        method.signature = f"ANY({','.join('ANY' for _ in params)})"
        method.code = f"def {name_tok.text}"
        for idx, p in enumerate(params, start=1):
            p.argument_index = idx
            method.add(p, order=idx)
        body = self.parse_ruby_block()
        self.accept("end")
        method.add(body, order=len(params) + 1)
        method.add(AstNode(kind="METHOD_RETURN", code="RET",
                           type_full_name="ANY", line=name_tok.line,
                           pos=name_tok.pos), order=len(params) + 2)
        self.var_types = prev_vars
        return method

    def parse_ruby_class(self) -> AstNode:
        start = self.eat()  # 'class'
        name = self.eat().text if self.at_kind("ident") else "<anonymous>"
        node = AstNode(kind="TYPE_DECL", name=name, full_name=name,
                       pos=start.pos, line=start.line, code=f"class {name}")
        inherits: list[str] = []
        if self.accept("<") and self.at_kind("ident"):
            inherits.append(self.eat().text)
        node.type_full_name = ",".join(inherits)  # INHERITS_FROM payload
        prev_class = self.current_class
        self.current_class = name
        order = 0
        while self.peek() is not None and not self.at("end"):
            before = self.i
            t = self.peek()
            if t.text == "def":
                order += 1
                node.add(self.parse_ruby_def(), order=order)
            else:
                self.eat()
            if self.i == before:
                self.eat()
        self.accept("end")
        self.current_class = prev_class
        return node

    # --- statements ----------------------------------------------------------
    def parse_ruby_block(self) -> AstNode:
        t = self.peek()
        block = AstNode(kind="BLOCK", pos=t.pos if t else 0,
                        line=t.line if t else 0)
        while self.peek() is not None and self.peek().text not in _RB_STOPS:
            before = self.i
            for st in self.parse_ruby_statement():
                block.add(st)
            if self.i == before:
                self.eat()
        block.code = block.children[0].code if block.children else ""
        return block

    def parse_ruby_statement(self) -> list[AstNode]:
        t = self.peek()
        if t is None:
            return []
        txt = t.text
        if txt in ("break", "next"):
            self.eat()
            ctrl = "BREAK" if txt == "break" else "CONTINUE"
            return [AstNode(kind="CONTROL_STRUCTURE", ctrl_type=ctrl,
                            code=txt, pos=t.pos, line=t.line)]
        if txt == "return":
            self.eat()
            node = AstNode(kind="RETURN", code="return", pos=t.pos,
                           line=t.line)
            if self.peek() is not None and self.peek().line == t.line:
                expr = self.parse_expr()
                if expr is not None:
                    node.add(expr, order=1, argument_index=1)
                    node.code = f"return {expr.code}".strip()
            self.accept(";")
            return [node]
        if txt in ("if", "while"):
            return [self.parse_ruby_if_while()]
        if txt == "def":
            return [self.parse_ruby_def()]
        if txt == "require":
            imp = self.parse_ruby_require()
            return [imp] if imp is not None else []
        # `@ivar = expr` — instance-variable assignment
        if txt == "@" and self.at_kind("ident", 1):
            at_tok = self.eat()
            name_tok = self.eat()
            iname = f"@{name_tok.text}"
            if self.accept("="):
                rhs = self.parse_assignment_expr()
                lhs = AstNode(kind="IDENTIFIER", name=iname, code=iname,
                              pos=at_tok.pos, line=at_tok.line,
                              type_full_name="ANY")
                call = operator_call(
                    "<operator>.assignment",
                    self.text[at_tok.pos:self._prev_end()].strip(),
                    at_tok.pos, at_tok.line)
                call.add(lhs, order=1, argument_index=1)
                if rhs is not None:
                    call.add(rhs, order=2, argument_index=2)
                self.accept(";")
                return [call]
            return [AstNode(kind="IDENTIFIER", name=iname, code=iname,
                            pos=at_tok.pos, line=at_tok.line,
                            type_full_name="ANY")]
        out = self.parse_py_expr_statement()
        self.accept(";")
        return out

    def parse_ruby_if_while(self) -> AstNode:
        t = self.eat()  # if | while | elsif
        kw = "IF" if t.text in ("if", "elsif") else "WHILE"
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type=kw,
                       pos=t.pos, line=t.line)
        cond = self.parse_expr()
        self.accept("then")
        node.code = f"{t.text} {cond.code if cond is not None else ''}".strip()
        if cond is not None:
            node.add(cond, order=1, argument_index=1, condition=True)
        node.add(self.parse_ruby_block(), order=2)
        nxt = self.peek()
        if kw == "IF" and nxt is not None and nxt.text in ("else", "elsif"):
            e = self.eat() if nxt.text == "else" else nxt
            els = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="ELSE",
                          code="else", pos=e.pos, line=e.line)
            if nxt.text == "elsif":
                inner = AstNode(kind="BLOCK", pos=nxt.pos, line=nxt.line)
                inner.add(self.parse_ruby_if_while())
                els.add(inner, order=1)
                node.add(els, order=3)
                return node  # the elsif consumed the shared `end`
            els.add(self.parse_ruby_block(), order=1)
            node.add(els, order=3)
        self.accept("end")
        return node

    # --- expressions ----------------------------------------------------------
    def _receiver_type(self, node: AstNode) -> str:
        # Ruby constants: a capitalized identifier is a class reference,
        # dispatching statically like Java (unlike JS, where it is a var)
        if (node.kind == "IDENTIFIER" and node.name
                and node.name[0].isupper()
                and node.name not in self.var_types):
            return node.name
        return super()._receiver_type(node)

    def parse_postfix(self) -> AstNode | None:
        node = super().parse_postfix()
        # `X.new(...)` → constructor invocation (objectInstantiation):
        # alloc for same-file classes, `X.<init>` for external ones
        if (node is not None and node.kind == "CALL" and node.name == "new"
                and "." in (node.full_name or "")):
            cls = node.full_name.rsplit(".", 1)[0]
            node.children = [c for c in node.children
                             if not (c.kind == "IDENTIFIER"
                                     and c.name == cls)]
            if cls in self.known_classes:
                node.name = OP_ALLOC
                node.full_name = OP_ALLOC
            else:
                node.name = "<init>"
                node.full_name = f"{cls}.<init>"
            node.type_full_name = cls
            from .ast_model import STATIC_DISPATCH
            node.dispatch_type = STATIC_DISPATCH
        return node

    def parse_primary(self) -> AstNode | None:
        t = self.peek()
        # `@ivar` in expression position
        if t is not None and t.text == "@" and self.at_kind("ident", 1):
            self.eat()
            name_tok = self.eat()
            iname = f"@{name_tok.text}"
            return AstNode(kind="IDENTIFIER", name=iname, code=iname,
                           pos=t.pos, line=t.line, type_full_name="ANY")
        return super().parse_primary()


def parse_ruby(text: str) -> list[AstNode]:
    p = RubyParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
