"""Mini Python frontend (pysrc2cpg analog) for the fixture subset.

Substitutes the reference's ``pysrc2cpg`` (pythonparser-based,
``Py2Cpg.scala`` / ``PythonAstVisitor.scala``) for: ``def`` functions,
``class``/bases with untyped methods, ``import``/``from … import``
dependencies, if/elif/else/while/for statements, and attribute/receiver
calls on untyped objects.

Lowering conventions follow pysrc2cpg:

- module-level statements live in a synthetic ``<module>`` METHOD
  (``PythonAstVisitor.scala:95-110`` module-method convention);
- a name's first assignment in a scope declares a LOCAL in that scope
  (``ContextStack.scala:170-179`` module/function variable creation);
- ``obj.m(x)`` is a DYNAMIC_DISPATCH call with the receiver as argument 0;
  the method full name stays a bare name unless the declared-type lattice
  knows the receiver — unresolved calls are NaiveCallLinker / type-hint
  workload, exactly like the JS frontend;
- ``x = ClassName()`` seeds the declared-type lattice with ``ClassName``
  (constructor-call inference, the pysrc2cpg type-hint analog), so
  ``x.m()`` dispatches as ``ClassName.m``;
- ``a.b`` → ``<operator>.fieldAccess``, ``a[b]`` → ``<operator>.indexAccess``
  (pysrc2cpg uses the plain spellings, not the C pointer forms);
- ``for x in it:`` lowers to a WHILE whose condition is the per-iteration
  binding ``x = it`` (the mini analog of pysrc2cpg's iterator-protocol
  lowering: condition evaluated each round, loop variable re-defined each
  round — CFG and reaching-def see the same shape);
- ``import m`` / ``from m import n`` → IMPORT nodes feeding
  DependenciesPass.

Blocks are recovered from indentation: each statement's indent is the
column of its first token (the tokenizer keeps absolute offsets, so the
column is derived from the raw text); a block is the run of statements
whose indent equals the first statement's indent, ending at the first
dedent below it. Tokens inside parentheses continue the statement, so
multi-line call argument lists parse naturally.
"""

from __future__ import annotations

from .ast_model import (
    OP_DICT_LITERAL,
    OP_LIST_LITERAL,
    AstNode,
    operator_call,
)
from .js_parser import JsParser
from .tokenizer import Token

_PY_COMPOUND = ("if", "while", "for", "elif")


class PyParser(JsParser):
    def __init__(self, text: str):
        super().__init__(text)
        # constructor-call type lattice: class names defined anywhere in the
        # module (prescan, so forward references work like in Python)
        self.known_classes: set[str] = {
            self.toks[j + 1].text
            for j, tok in enumerate(self.toks[:-1])
            if tok.text == "class" and self.toks[j + 1].kind == "ident"
        }

    # --- indentation helpers ------------------------------------------------
    def _col(self, tok: Token) -> int:
        nl = self.text.rfind("\n", 0, tok.pos)
        return tok.pos - nl - 1

    def _skip_line(self, line: int) -> None:
        while self.peek() is not None and self.peek().line == line:
            self.eat()

    # --- entry ---------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        prog = AstNode(kind="METHOD", name="<module>", full_name="<module>",
                       code="<module>", signature="void()", pos=0, line=1)
        body = AstNode(kind="BLOCK", pos=0, line=1)
        while self.peek() is not None:
            start_i = self.i
            t = self.peek()
            if t.text == "def":
                out.append(self.parse_py_def())
            elif t.text == "@":
                # decorated def: METHOD to the top level, the lowered
                # `f = dec(f)` rebinding into the module body
                for st in self.parse_py_decorated():
                    if st.kind in ("METHOD", "TYPE_DECL"):
                        out.append(st)
                    else:
                        body.add(st)
            elif t.text == "class":
                out.append(self.parse_py_class())
            elif t.text in ("import", "from"):
                imp = self.parse_py_import()
                if imp is not None:
                    out.append(imp)
            else:
                for st in self.parse_py_statement():
                    body.add(st)
            if self.i == start_i:
                self.eat()
        out.extend(self._hoisted)
        if body.children:
            prog.add(body, order=1)
            prog.add(AstNode(kind="METHOD_RETURN", code="RET",
                             type_full_name="ANY", pos=0, line=1), order=2)
            out.append(prog)
        return out

    # --- imports --------------------------------------------------------------
    def parse_py_import(self) -> AstNode | None:
        t = self.eat()  # import | from
        mod = ""
        if self.at_kind("ident"):
            mod = self.eat().text
            while self.at("."):  # dotted module path
                self.eat()
                if self.at_kind("ident"):
                    mod += "." + self.eat().text
        self._skip_line(t.line)  # `import x as y`, `from m import a, b`
        if not mod:
            return None
        return AstNode(kind="IMPORT", name=mod, full_name=mod,
                       code=self.text[t.pos:t.pos + 40].splitlines()[0].strip(),
                       pos=t.pos, line=t.line)

    # --- decorators --------------------------------------------------------
    def parse_py_decorated(self) -> list[AstNode]:
        """``@dec`` lines before a def → pysrc2cpg's lowering: the METHOD
        plus one ``f = dec(f)`` rebinding call per decorator, innermost
        first (PythonAstVisitor's ``createTransformedImport``-style
        decorator-to-call conversion); the METHOD_REF argument feeds
        MethodRefLinker."""
        decs: list[Token] = []
        while self.at("@"):
            a = self.eat()
            if self.at_kind("ident") and self.peek().line == a.line:
                decs.append(self.eat())
            self._skip_line(a.line)  # dotted paths / decorator args: skimmed
        t = self.peek()
        if t is None:
            return []
        if t.text == "class":
            return [self.parse_py_class()]
        if t.text != "def":
            return self.parse_py_statement()
        m = self.parse_py_def()
        out: list[AstNode] = [m]
        for d in reversed(decs):
            call = AstNode(kind="CALL", name=d.text, full_name=d.text,
                           dispatch_type="STATIC_DISPATCH",
                           code=f"{d.text}({m.name})", pos=d.pos, line=d.line)
            call.add(AstNode(kind="METHOD_REF", name=m.name,
                             full_name=m.full_name, code=m.name,
                             pos=d.pos, line=d.line), order=1,
                     argument_index=1)
            asg = operator_call("<operator>.assignment",
                                f"{m.name} = {d.text}({m.name})",
                                d.pos, d.line)
            asg.add(AstNode(kind="IDENTIFIER", name=m.name, code=m.name,
                            pos=d.pos, line=d.line, type_full_name="ANY"),
                    order=1, argument_index=1)
            asg.add(call, order=2, argument_index=2)
            out.append(asg)
        return out

    # --- defs / classes ---------------------------------------------------
    def parse_py_def(self) -> AstNode:
        start = self.eat()  # 'def'
        name_tok = self.eat() if self.at_kind("ident") else Token(
            "ident", "<lambda>", start.pos, start.line)
        method = AstNode(
            kind="METHOD", name=name_tok.text,
            full_name=(f"{self.current_class}.{name_tok.text}"
                       if self.current_class else name_tok.text),
            pos=start.pos, line=start.line,
        )
        prev_vars = self.var_types
        self.var_types = {}
        self.expect("(")
        params: list[AstNode] = []
        while self.peek() is not None and not self.at(")"):
            if not self.at_kind("ident"):
                self.eat()  # `*` / `**` variadic markers skim to the name
                continue
            p_tok = self.eat()
            # `: type` annotation: skip depth-aware to ',' ')' or '='
            if self.at(":"):
                self.eat()
                depth = 0
                while self.peek() is not None:
                    if depth == 0 and (self.at(",") or self.at(")")
                                       or self.at("=")):
                        break
                    tok = self.eat()
                    if tok.text in "([":
                        depth += 1
                    elif tok.text in ")]":
                        depth -= 1
            # default value: skip depth-aware to ',' or ')'
            if self.at("="):
                self.eat()
                depth = 0
                while self.peek() is not None:
                    if depth == 0 and (self.at(",") or self.at(")")):
                        break
                    tok = self.eat()
                    if tok.text in "([":
                        depth += 1
                    elif tok.text in ")]":
                        depth -= 1
            p_type = "ANY"
            if p_tok.text == "self" and self.current_class:
                p_type = self.current_class
                self.var_types["self"] = self.current_class
            else:
                self.var_types[p_tok.text] = "ANY"
            params.append(AstNode(
                kind="METHOD_PARAMETER_IN", name=p_tok.text, code=p_tok.text,
                pos=p_tok.pos, line=p_tok.line, type_full_name=p_type))
            self.accept(",")
        self.expect(")")
        if self.at("->"):  # return annotation: skim to the ':'
            a = self.eat()
            while (self.peek() is not None and not self.at(":")
                   and self.peek().line == a.line):
                self.eat()
        self.accept(":")
        method.signature = f"ANY({','.join('ANY' for _ in params)})"
        method.code = f"def {name_tok.text}"
        for idx, p in enumerate(params, start=1):
            p.argument_index = idx
            method.add(p, order=idx)
        body = self.parse_py_block(self._col(start))
        method.add(body, order=len(params) + 1)
        method.add(AstNode(kind="METHOD_RETURN", code="RET",
                           type_full_name="ANY", line=name_tok.line,
                           pos=name_tok.pos), order=len(params) + 2)
        self.var_types = prev_vars
        return method

    def parse_py_class(self) -> AstNode:
        start = self.eat()  # 'class'
        name = self.eat().text if self.at_kind("ident") else "<anonymous>"
        node = AstNode(kind="TYPE_DECL", name=name, full_name=name,
                       pos=start.pos, line=start.line, code=f"class {name}")
        inherits: list[str] = []
        if self.accept("("):
            while self.peek() is not None and not self.at(")"):
                if self.at_kind("ident"):
                    inherits.append(self.eat().text)
                else:
                    self.eat()
                self.accept(",")
            self.expect(")")
        node.type_full_name = ",".join(inherits)  # INHERITS_FROM payload
        self.accept(":")
        prev_class = self.current_class
        self.current_class = name
        order = 0
        class_col = self._col(start)
        while self.peek() is not None and self._col(self.peek()) > class_col:
            before = self.i
            t = self.peek()
            if t.text == "def":
                order += 1
                node.add(self.parse_py_def(), order=order)
            elif t.text == "@":
                self._skip_line(t.line)
            elif t.text == "pass":
                self.eat()
            else:
                # class-level member: `name = expr` → MEMBER
                if t.kind == "ident" and self.at("=", 1):
                    m_tok = self.eat()
                    self.eat()
                    self.parse_assignment_expr()
                    order += 1
                    node.add(AstNode(kind="MEMBER", name=m_tok.text,
                                     code=m_tok.text, type_full_name="ANY",
                                     pos=m_tok.pos, line=m_tok.line),
                             order=order)
                else:
                    self._skip_line(t.line)
            if self.i == before:
                self.eat()
        self.current_class = prev_class
        return node

    # --- statements ----------------------------------------------------------
    def parse_py_block(self, parent_col: int) -> AstNode:
        t = self.peek()
        block = AstNode(kind="BLOCK", pos=t.pos if t else 0,
                        line=t.line if t else 0)
        if t is None or self._col(t) <= parent_col:
            return block  # empty suite (e.g. body on the header line — rare)
        block_col = self._col(t)
        while self.peek() is not None and self._col(self.peek()) == block_col:
            before = self.i
            for st in self.parse_py_statement():
                block.add(st)
            if self.i == before:
                self.eat()
        block.code = block.children[0].code if block.children else ""
        return block

    def parse_py_statement(self) -> list[AstNode]:
        t = self.peek()
        if t is None:
            return []
        txt = t.text
        if txt == "@":
            return self.parse_py_decorated()
        if txt == "try":
            return [self.parse_py_try()]
        if txt == "with":
            return [self.parse_py_with()]
        if txt == "raise":
            # javasrc2cpg convention the C parser also uses: THROW control
            # structure, CFG-empty (CfgCreator default case)
            self.eat()
            node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="THROW",
                           pos=t.pos, line=t.line)
            if self.peek() is not None and self.peek().line == t.line:
                ex = self.parse_expr()
                if ex is not None:
                    node.add(ex, order=1, argument_index=1)
            node.code = self.text[t.pos:self._prev_end()].strip() or "raise"
            return [node]
        if txt == "pass":
            self.eat()
            return []
        if txt in ("break", "continue"):
            self.eat()
            return [AstNode(kind="CONTROL_STRUCTURE", ctrl_type=txt.upper(),
                            code=txt, pos=t.pos, line=t.line)]
        if txt == "return":
            self.eat()
            node = AstNode(kind="RETURN", code="return", pos=t.pos, line=t.line)
            if self.peek() is not None and self.peek().line == t.line:
                expr = self.parse_expr()
                if expr is not None:
                    node.add(expr, order=1, argument_index=1)
                    node.code = f"return {expr.code}".strip()
            return [node]
        if txt in ("if", "while"):
            return [self.parse_py_if_while()]
        if txt == "for":
            return [self.parse_py_for()]
        if txt == "def":
            return [self.parse_py_def()]
        if txt in ("import", "from"):
            imp = self.parse_py_import()
            return [imp] if imp is not None else []
        return self.parse_py_expr_statement()

    def parse_py_if_while(self) -> AstNode:
        t = self.eat()  # if | while | elif
        kw = "IF" if t.text in ("if", "elif") else "WHILE"
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type=kw,
                       pos=t.pos, line=t.line)
        cond = self.parse_expr()
        self.accept(":")
        node.code = f"{t.text} {cond.code if cond is not None else ''}:".strip()
        if cond is not None:
            node.add(cond, order=1, argument_index=1, condition=True)
        node.add(self.parse_py_block(self._col(t)), order=2)
        nxt = self.peek()
        if (kw == "IF" and nxt is not None and self._col(nxt) == self._col(t)
                and nxt.text in ("else", "elif")):
            e = self.eat() if nxt.text == "else" else nxt
            els = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="ELSE",
                          code="else", pos=e.pos, line=e.line)
            if nxt.text == "elif":
                inner = AstNode(kind="BLOCK", pos=nxt.pos, line=nxt.line)
                inner.add(self.parse_py_if_while())
                els.add(inner, order=1)
            else:
                self.accept(":")
                els.add(self.parse_py_block(self._col(t)), order=1)
            node.add(els, order=3)
        return node

    def parse_py_for(self) -> AstNode:
        t = self.eat()  # 'for'
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="WHILE",
                       pos=t.pos, line=t.line)
        var_tok = self.eat() if self.at_kind("ident") else None
        if self.at("in"):
            self.eat()
        iterable = self.parse_expr()
        self.accept(":")
        node.code = self.text[t.pos:self._prev_end()].strip() + ":"
        # per-iteration binding as the loop condition: x = <iterable>
        if var_tok is not None:
            if var_tok.text not in self.var_types:
                self.var_types[var_tok.text] = "ANY"
            bind = operator_call("<operator>.assignment",
                                 node.code.removeprefix("for ").rstrip(":"),
                                 var_tok.pos, var_tok.line)
            bind.add(AstNode(kind="IDENTIFIER", name=var_tok.text,
                             code=var_tok.text, pos=var_tok.pos,
                             line=var_tok.line, type_full_name="ANY"),
                     order=1, argument_index=1)
            if iterable is not None:
                bind.add(iterable, order=2, argument_index=2)
            node.add(bind, order=1, argument_index=1, condition=True)
        elif iterable is not None:
            node.add(iterable, order=1, argument_index=1, condition=True)
        node.add(self.parse_py_block(self._col(t)), order=2)
        return node

    def parse_py_try(self) -> AstNode:
        """``try: / except E as e: / finally:`` → the same CONTROL_STRUCTURE
        TRY/CATCH/FINALLY shape the C/Java parser emits (CfgCreator's
        tryStatement handling applies unchanged; pysrc2cpg
        PythonAstVisitor tryStatement)."""
        t = self.eat()  # 'try'
        self.accept(":")
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="TRY", code="try",
                       pos=t.pos, line=t.line)
        node.add(self.parse_py_block(self._col(t)), order=1)
        col = self._col(t)
        while (self.peek() is not None and self._col(self.peek()) == col
               and self.peek().text == "except"):
            c = self.eat()
            cs = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="CATCH",
                         code="except", pos=c.pos, line=c.line)
            ty = ""
            if self.at("("):  # `except (A, B) as e:` — tuple of types
                self.eat()
                parts = []
                while self.peek() is not None and not self.at(")"):
                    tok = self.eat()
                    if tok.kind == "ident":
                        parts.append(tok.text)
                self.expect(")")
                ty = ",".join(parts)
            elif self.at_kind("ident") and self.peek().line == c.line:
                ty = self.eat().text
            if self.at("as"):
                self.eat()
                if self.at_kind("ident"):
                    v = self.eat()
                    self.var_types[v.text] = ty or "ANY"
                    cs.add(AstNode(kind="LOCAL", name=v.text,
                                   code=f"{ty} {v.text}".strip(),
                                   type_full_name=ty or "ANY",
                                   pos=v.pos, line=v.line))
            self.accept(":")
            cs.add(self.parse_py_block(col))
            node.add(cs)
        if (self.peek() is not None and self._col(self.peek()) == col
                and self.peek().text == "finally"):
            f = self.eat()
            self.accept(":")
            fs = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="FINALLY",
                         code="finally", pos=f.pos, line=f.line)
            fs.add(self.parse_py_block(col), order=1)
            node.add(fs)
        return node

    def parse_py_with(self) -> AstNode:
        """``with ctx() as v:`` → BLOCK{ v = ctx(); <suite> } — the dataflow
        core of pysrc2cpg's with-lowering (enter/exit calls elided in the
        mini frontend; the binding and the suite CFG order are preserved)."""
        t = self.eat()  # 'with'
        expr = self.parse_expr()
        blk = AstNode(kind="BLOCK", pos=t.pos, line=t.line)
        var = None
        if self.at("as"):
            self.eat()
            if self.at_kind("ident"):
                var = self.eat()
        self.accept(":")
        blk.code = self.text[t.pos:self._prev_end()].strip()
        if var is not None:
            if var.text not in self.var_types:
                self.var_types[var.text] = "ANY"
                blk.add(AstNode(kind="LOCAL", name=var.text, code=var.text,
                                pos=var.pos, line=var.line,
                                type_full_name="ANY"))
            bind = operator_call("<operator>.assignment",
                                 f"{var.text} = {expr.code if expr else ''}",
                                 var.pos, var.line)
            bind.add(AstNode(kind="IDENTIFIER", name=var.text, code=var.text,
                             pos=var.pos, line=var.line,
                             type_full_name="ANY"), order=1, argument_index=1)
            if expr is not None:
                bind.add(expr, order=2, argument_index=2)
            blk.add(bind)
        elif expr is not None:
            blk.add(expr)
        blk.add(self.parse_py_block(self._col(t)))
        return blk

    # --- collection displays / comprehensions ------------------------------
    def parse_primary(self) -> AstNode | None:
        t = self.peek()
        if t is not None and t.text == "[":
            return self.parse_py_list_display(t)
        if t is not None and t.text == "{":
            return self.parse_py_dict_display(t)
        if t is not None and t.text == "lambda":
            return self.parse_py_lambda(t)
        return super().parse_primary()

    def parse_py_lambda(self, t: Token) -> AstNode:
        """``lambda x: expr`` → hoisted `<lambda>N` METHOD + METHOD_REF,
        the same shape as JS arrows (pysrc2cpg lambda-method convention);
        a named binding adopts the variable's name at the assignment."""
        self.eat()  # 'lambda'
        params: list[Token] = []
        prev_vars = self.var_types
        self.var_types = dict(prev_vars)
        while self.peek() is not None and not self.at(":"):
            if self.at_kind("ident"):
                p = self.eat()
                params.append(p)
                self.var_types[p.text] = "ANY"
            else:
                self.eat()
            self.accept(",")
        self.accept(":")
        body = self._lambda_expr_body(t, self.parse_expr())
        ref = self._make_lambda(t, params, body)
        self.var_types = prev_vars
        return ref

    def parse_py_list_display(self, t: Token) -> AstNode:
        """``[a, b]`` → listLiteral; ``[expr for x in it if cond]`` →
        listLiteral whose child 1 is the per-iteration binding ``x = it``
        (the same binding shape the for-statement lowers to, so
        reaching-defs see def-of-x-from-it before the body expression —
        pysrc2cpg lowers comprehensions to a loop block with the same
        dataflow)."""
        self.eat()  # '['
        call = operator_call(OP_LIST_LITERAL, "", t.pos, t.line)
        if self.accept("]"):
            call.code = "[]"
            return call
        first = self.parse_expr()
        if self.at("for"):
            self._parse_comprehension_tail(call, t, [first], "]")
            return call
        idx = 0
        if first is not None:
            idx += 1
            call.add(first, order=idx, argument_index=idx)
        while self.accept(","):
            item = self.parse_expr()
            if item is None:
                break
            idx += 1
            call.add(item, order=idx, argument_index=idx)
        self.expect("]")
        call.code = self.text[t.pos:self._prev_end()].strip()
        return call

    def _parse_comprehension_tail(self, call: AstNode, t: Token,
                                  body: list, close: str) -> None:
        """Shared ``for x in it [for y in …] [if cond]`` tail for list/dict/
        set comprehensions: every clause's per-iteration binding precedes
        the body expression(s) in AST order so reaching-defs see
        def-of-var-from-iterable before its uses; filter conditions follow."""
        binds: list[AstNode] = []
        conds: list[AstNode] = []
        while self.at("for") or self.at("if"):
            if self.accept("if"):
                cond = self.parse_expr()
                if cond is not None:
                    conds.append(cond)
                continue
            self.eat()  # 'for'
            var = self.eat() if self.at_kind("ident") else None
            if self.at("in"):
                self.eat()
            iterable = self.parse_expr()
            if var is not None:
                if var.text not in self.var_types:
                    self.var_types[var.text] = "ANY"
                bind = operator_call("<operator>.assignment",
                                     f"{var.text} = "
                                     f"{iterable.code if iterable else ''}",
                                     var.pos, var.line)
                bind.add(AstNode(kind="IDENTIFIER", name=var.text,
                                 code=var.text, pos=var.pos, line=var.line,
                                 type_full_name="ANY"),
                         order=1, argument_index=1)
                if iterable is not None:
                    bind.add(iterable, order=2, argument_index=2)
                binds.append(bind)
            elif iterable is not None:
                binds.append(iterable)
        self.expect(close)
        call.code = self.text[t.pos:self._prev_end()].strip()
        order = 0
        for node in binds + [b for b in body if b is not None] + conds:
            order += 1
            call.add(node, order=order, argument_index=order)

    def parse_py_dict_display(self, t: Token) -> AstNode:
        """``{k: v, …}`` / ``{a, b}`` → dictLiteral over the element
        expressions; ``{k: v for k in it}`` / ``{e for e in it}`` →
        dictLiteral comprehension with the same binding-first lowering as
        list comprehensions (pysrc2cpg dict/setLiteral — PASSTHROUGH)."""
        self.eat()  # '{'
        call = operator_call(OP_DICT_LITERAL, "", t.pos, t.line)
        first = None
        first_val = None
        if self.peek() is not None and not self.at("}"):
            first = self.parse_expr()
            if self.accept(":"):
                first_val = self.parse_expr()
        if self.at("for"):
            self._parse_comprehension_tail(call, t, [first, first_val], "}")
            return call
        idx = 0
        for node in (first, first_val):
            if node is not None:
                idx += 1
                call.add(node, order=idx, argument_index=idx)
        while self.accept(","):
            if self.peek() is None or self.at("}"):
                break
            item = self.parse_expr()
            if item is not None:
                idx += 1
                call.add(item, order=idx, argument_index=idx)
            if self.accept(":"):
                val = self.parse_expr()
                if val is not None:
                    idx += 1
                    call.add(val, order=idx, argument_index=idx)
        self.expect("}")
        call.code = self.text[t.pos:self._prev_end()].strip()
        return call

    # --- keyword arguments --------------------------------------------------
    def _parse_args(self, call: AstNode) -> None:
        """Python call arguments: ``f(a, key=val)`` — a keyword argument is
        the VALUE expression (code keeps the ``key=val`` spelling), never an
        assignment, so no phantom def of ``key`` reaches the dataflow
        (pysrc2cpg keeps named args as ordinary arguments with argumentName)."""
        idx = len([c for c in call.children if c.argument_index >= 1])
        while self.peek() is not None and not self.at(")"):
            k = self.peek()
            if (k is not None and k.kind == "ident" and self.at("=", 1)
                    and not self.at("==", 1)):
                self.eat()  # key
                self.eat()  # '='
                val = self.parse_assignment_expr()
                if val is not None:
                    val.code = self.text[k.pos:self._prev_end()].strip()
                    idx += 1
                    call.add(val, order=len(call.children) + 1,
                             argument_index=idx)
            else:
                arg = self.parse_assignment_expr()
                if arg is None:
                    break
                idx += 1
                call.add(arg, order=len(call.children) + 1, argument_index=idx)
            if not self.accept(","):
                break
        self.expect(")")

    def parse_py_expr_statement(self) -> list[AstNode]:
        t = self.peek()
        # `name = expr` — first assignment in scope declares a LOCAL
        # (ContextStack.scala:170-179)
        if (t is not None and t.kind == "ident" and self.at("=", 1)
                and not self.at("==", 1)):
            name_tok = self.eat()
            self.eat()  # '='
            rhs = self.parse_assignment_expr()
            # `f = lambda x: …`: adopt the declared name (statically
            # linkable, like JS named-arrow bindings)
            self._adopt_lambda_name(rhs, name_tok.text)
            out: list[AstNode] = []
            rtype = ""
            if rhs is not None:
                if rhs.kind == "CALL" and rhs.name in self.known_classes:
                    rtype = rhs.name  # constructor-call inference
                elif rhs.type_full_name and rhs.type_full_name != "ANY":
                    rtype = rhs.type_full_name
            if name_tok.text not in self.var_types:
                local = AstNode(kind="LOCAL", name=name_tok.text,
                                code=name_tok.text, pos=name_tok.pos,
                                line=name_tok.line,
                                type_full_name=rtype or "ANY")
                out.append(local)
            self.var_types[name_tok.text] = rtype or \
                self.var_types.get(name_tok.text, "ANY")
            lhs = AstNode(kind="IDENTIFIER", name=name_tok.text,
                          code=name_tok.text, pos=name_tok.pos,
                          line=name_tok.line, type_full_name=rtype or "ANY")
            call = operator_call(
                "<operator>.assignment",
                self.text[name_tok.pos:self._prev_end()].strip(),
                name_tok.pos, name_tok.line)
            call.add(lhs, order=1, argument_index=1)
            if rhs is not None:
                call.add(rhs, order=2, argument_index=2)
            out.append(call)
            return out
        expr = self.parse_expr()
        return [expr] if expr is not None else []


def parse_py(text: str) -> list[AstNode]:
    p = PyParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
