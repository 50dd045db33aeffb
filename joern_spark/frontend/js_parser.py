"""Mini JavaScript frontend (jssrc2cpg analog) for the fixture subset.

Substitutes the reference's ``jssrc2cpg`` (Babel-based,
``JsSrc2Cpg.scala:29-65`` pass pipeline) for: ``function`` declarations,
``class``/``extends`` with untyped methods, ``var``/``let``/``const``
locals, ``new X()`` allocation, ``require('mod')`` / ``import … from 'mod'``
dependencies, and untyped receiver calls.

Lowering conventions follow jssrc2cpg:

- file-level statements live in a synthetic ``:program`` METHOD
  (``AstCreator.scala:108-126`` ``:program`` convention);
- ``obj.f(x)`` is a DYNAMIC_DISPATCH call whose receiver is argument 0; the
  method full name is unknown at parse time unless the declared-type lattice
  knows the receiver (``new`` assignment), mirroring
  ``AstForExpressionsCreator.handleCallNodeArgs``. Unresolved calls are the
  NaiveCallLinker / XTypeRecovery-hint workload by design;
- ``a.b`` → ``<operator>.fieldAccess``, ``a[b]`` → ``<operator>.indexAccess``
  (``createFieldAccessCallAst`` / ``createIndexAccessCallAst``);
- ``new X()`` → ``<operator>.alloc`` typed ``X``
  (``astForNewExpression``, ``AstForExpressionsCreator.scala:113-130``);
- ``require('m')``/``import … from 'm'`` → IMPORT nodes feeding
  DependenciesPass (``DependenciesPass.scala:14-35``).
"""

from __future__ import annotations

from .ast_model import (
    OP_ALLOC,
    OP_FORMAT_STRING,
    AstNode,
    STATIC_DISPATCH,
    operator_call,
)
from .java_parser import JavaParser
from .tokenizer import Token, tokenize

_JS_DECL = ("var", "let", "const")


def _str_arg(call: AstNode) -> str:
    for c in call.children:
        if c.kind == "LITERAL" and c.code[:1] in "\"'":
            return c.code.strip("\"'")
    return ""


class JsParser(JavaParser):
    # `??=` logical assignment lowers to notNullAssert, matching jssrc2cpg
    # (AstForExpressionsCreator.scala:187)
    from .ast_model import OP_NOT_NULL_ASSERT as _NNA
    ASSIGN_NAMES = {**JavaParser.ASSIGN_NAMES, "??=": _NNA}

    # arrow functions use `=>` (jssrc2cpg nextClosureName convention); the
    # parse machinery lives in JavaParser.parse_arrow/_at_arrow
    ARROW = "=>"

    def __init__(self, text: str):
        super().__init__(text)
        self._tmp_n = 0  # destructuring temp counter

    # JS has no type syntax: every typed-declaration heuristic is off; locals
    # arrive via var/let/const keywords instead.
    def at_type(self, k: int = 0) -> bool:
        return False

    def parse_type(self) -> str:
        return ""

    # --- entry ---------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        prog = AstNode(kind="METHOD", name=":program", full_name=":program",
                       code=":program", signature="void()", pos=0, line=1)
        body = AstNode(kind="BLOCK", pos=0, line=1)
        while self.peek() is not None:
            start_i = self.i
            t = self.peek()
            if t.text == "function":
                out.append(self.parse_js_function())
            elif t.text == "class":
                node = self.parse_class()
                if node is not None:
                    out.append(node)
            elif t.text == "import":
                imp = self.parse_js_import()
                if imp is not None:
                    out.append(imp)
            else:
                for st in self.parse_statement():
                    body.add(st)
            if self.i == start_i:
                self.eat()
        if body.children:
            prog.add(body, order=1)
            prog.add(AstNode(kind="METHOD_RETURN", code="RET",
                             type_full_name="ANY", pos=0, line=1), order=2)
            out.append(prog)
        out.extend(self._hoisted)
        # CommonJS requires anywhere in the tree → IMPORT tops
        imports: list[AstNode] = []
        seen: set[str] = set()
        for top in out:
            for n in top.walk():
                if n.kind == "CALL" and n.name == "require":
                    mod = _str_arg(n)
                    if mod and mod not in seen:
                        seen.add(mod)
                        imports.append(AstNode(
                            kind="IMPORT", name=mod, full_name=mod,
                            code=f"require('{mod}')", pos=n.pos, line=n.line))
        return imports + out

    def parse_js_import(self) -> AstNode | None:
        t = self.eat()  # 'import'
        mod = ""
        while self.peek() is not None and not self.at(";"):
            tok = self.eat()
            if tok.kind in ("str", "char"):
                mod = tok.text.strip("\"'")
        self.accept(";")
        if not mod:
            return None
        return AstNode(kind="IMPORT", name=mod, full_name=mod,
                       code=f"import '{mod}'", pos=t.pos, line=t.line)

    def parse_js_function(self) -> AstNode:
        start = self.eat()  # 'function'
        name_tok = self.eat() if self.at_kind("ident") else Token(
            "ident", "<lambda>", start.pos, start.line)
        prev_vars = self.var_types
        self.var_types = {}
        m = self.parse_function("", name_tok, start)
        if self.current_class:
            m.full_name = f"{self.current_class}.{name_tok.text}"
        self.var_types = prev_vars
        return m

    # class methods have no return type: `f(a) { … }` — JavaParser's member
    # loop already handles that once parse_type yields "" (name, then "(")

    # --- statements ----------------------------------------------------------
    def parse_statement(self) -> list[AstNode]:
        t = self.peek()
        if t is not None and t.text in _JS_DECL and (
                self.at_kind("ident", 1) or self.at("{", 1) or self.at("[", 1)):
            return self.parse_js_declaration()
        if t is not None and t.text == "function":
            return [self.parse_js_function()]
        return super().parse_statement()

    # --- destructuring --------------------------------------------------------
    def _parse_destructuring(self, start: Token) -> list[AstNode]:
        """`let {a, b} = e` / `let [a, b] = e` → one temp binding plus one
        field/index-access assignment per name (jssrc2cpg
        astForDeconstruction's lowering: `_tmp = e; a = _tmp.a; …`)."""
        from .ast_model import OP_FIELD_ACCESS, OP_INDEX_ACCESS

        open_tok = self.eat()  # '{' | '['
        is_obj = open_tok.text == "{"
        close = "}" if is_obj else "]"
        # (source prop | element index, bound target); array holes
        # (`[a, , b]`) advance the element index without binding
        names: list[tuple] = []
        elem = 0
        while self.peek() is not None and not self.at(close):
            if self.at_kind("ident"):
                prop = self.eat()
                if is_obj and self.accept(":") and self.at_kind("ident"):
                    # `{field: target}` rename — bind target from .field
                    names.append((prop, self.eat(), elem))
                else:
                    names.append((prop, prop, elem))
            elif not self.at(","):
                self.eat()
            if not self.accept(","):
                break
            elem += 1
        self.expect(close)
        self.expect("=")
        rhs = self.parse_assignment_expr()
        tmp = f"_tmp{self._tmp_n}"
        self._tmp_n += 1
        out: list[AstNode] = [AstNode(
            kind="LOCAL", name=tmp, code=tmp, pos=open_tok.pos,
            line=open_tok.line, type_full_name="ANY")]
        bind = operator_call("<operator>.assignment",
                             self.text[start.pos:self._prev_end()].strip(),
                             open_tok.pos, open_tok.line)
        bind.add(AstNode(kind="IDENTIFIER", name=tmp, code=tmp,
                         pos=open_tok.pos, line=open_tok.line,
                         type_full_name="ANY"), order=1, argument_index=1)
        if rhs is not None:
            bind.add(rhs, order=2, argument_index=2)
        out.append(bind)
        for prop, target, k in names:
            self.var_types[target.text] = "ANY"
            out.append(AstNode(kind="LOCAL", name=target.text,
                               code=f"{start.text} {target.text}",
                               pos=target.pos, line=target.line,
                               type_full_name="ANY"))
            access = operator_call(
                OP_FIELD_ACCESS if is_obj else OP_INDEX_ACCESS,
                f"{tmp}.{prop.text}" if is_obj else f"{tmp}[{k}]",
                target.pos, target.line)
            access.add(AstNode(kind="IDENTIFIER", name=tmp, code=tmp,
                               pos=target.pos, line=target.line,
                               type_full_name="ANY"), order=1, argument_index=1)
            if is_obj:
                access.add(AstNode(kind="FIELD_IDENTIFIER", name=prop.text,
                                   code=prop.text, pos=prop.pos,
                                   line=prop.line), order=2, argument_index=2)
            else:
                access.add(AstNode(kind="LITERAL", code=str(k), pos=target.pos,
                                   line=target.line, type_full_name="int"),
                           order=2, argument_index=2)
            asg = operator_call("<operator>.assignment",
                                f"{target.text} = {access.code}",
                                target.pos, target.line)
            asg.add(AstNode(kind="IDENTIFIER", name=target.text,
                            code=target.text, pos=target.pos,
                            line=target.line, type_full_name="ANY"),
                    order=1, argument_index=1)
            asg.add(access, order=2, argument_index=2)
            out.append(asg)
        self.accept(";")
        return out

    def parse_js_declaration(self) -> list[AstNode]:
        start = self.eat()  # var | let | const
        if self.at("{") or self.at("["):
            return self._parse_destructuring(start)
        out: list[AstNode] = []
        while self.at_kind("ident"):
            name_tok = self.eat()
            local = AstNode(kind="LOCAL", name=name_tok.text,
                            code=f"{start.text} {name_tok.text}",
                            pos=start.pos, line=name_tok.line,
                            type_full_name="ANY")
            out.append(local)
            if self.accept("="):
                rhs = self.parse_assignment_expr()
                # `const f = (a) => …`: adopt the declared name — the
                # lambda becomes a named method (statically linkable,
                # matching jssrc2cpg's variable-named closure binding)
                self._adopt_lambda_name(rhs, name_tok.text)
                lhs = AstNode(kind="IDENTIFIER", name=name_tok.text,
                              code=name_tok.text, pos=name_tok.pos,
                              line=name_tok.line, type_full_name="ANY")
                if rhs is not None and rhs.type_full_name:
                    # declared-type seed for the hint linker: `x = new A()`
                    local.type_full_name = rhs.type_full_name
                    lhs.type_full_name = rhs.type_full_name
                    self.var_types[name_tok.text] = rhs.type_full_name
                call = operator_call(
                    "<operator>.assignment",
                    self.text[name_tok.pos:self._prev_end()].strip(),
                    name_tok.pos, name_tok.line)
                call.add(lhs, order=1, argument_index=1)
                if rhs is not None:
                    call.add(rhs, order=2, argument_index=2)
                out.append(call)
            if not self.accept(","):
                break
        self.accept(";")
        return out

    # --- expressions ----------------------------------------------------------
    def parse_unary(self) -> AstNode | None:
        t = self.peek()
        if t is not None and t.text == "new":
            # astForNewExpression: Operators.alloc typed by the constructed
            # class (AstForExpressionsCreator.scala:113-130)
            self.eat()
            cls = self.eat().text if self.at_kind("ident") else "ANY"
            call = AstNode(kind="CALL", name=OP_ALLOC, full_name=OP_ALLOC,
                           dispatch_type=STATIC_DISPATCH, type_full_name=cls,
                           pos=t.pos, line=t.line)
            if self.at("("):
                self.eat()
                self._parse_args(call)
            call.code = self.text[t.pos:self._prev_end()].strip()
            return call
        return super().parse_unary()

    def _dyn_full(self, recv_type: str, meth: str) -> str:
        # unknown receiver → bare-name call: no dot, so CHA skips it and no
        # `<unknown>.x` stub materializes — the call is NaiveCallLinker /
        # type-hint workload (jssrc2cpg leaves methodFullName a placeholder,
        # AstForExpressionsCreator.handleCallNodeArgs)
        return f"{recv_type}.{meth}" if recv_type and recv_type != "ANY" else meth

    def _receiver_type(self, node: AstNode) -> str:
        # no static class-name dispatch in JS: an uppercase identifier is just
        # a variable unless the declared-type lattice knows it
        if node.kind == "IDENTIFIER":
            if node.name == "this":
                return self.current_class
            recv = self.var_types.get(node.name, "")
            return "" if recv == "ANY" else recv
        if node.kind == "CALL" and node.type_full_name:
            return node.type_full_name
        return ""

    def parse_postfix(self) -> AstNode | None:
        # JavaParser's postfix handles bare calls / method calls / field
        # access; JS adds computed access `a[b]` back (Java drops it because
        # its array types eat the brackets)
        start = self.peek()
        node = super().parse_postfix()
        while node is not None and self.peek() is not None and self.at("["):
            from .ast_model import OP_INDEX_ACCESS

            self.eat()
            idx_expr = self.parse_expr()
            self.expect("]")
            call = operator_call(OP_INDEX_ACCESS, "", start.pos, start.line)
            call.add(node, order=1, argument_index=1)
            if idx_expr is not None:
                call.add(idx_expr, order=2, argument_index=2)
            call.code = self.text[start.pos:self._prev_end()].strip()
            node = call
        return node

    # --- template literals ----------------------------------------------------
    def _subparse_expr(self, start: int, end: int) -> AstNode | None:
        """Parse ``self.text[start:end]`` as an expression with correct
        absolute positions (used for `${…}` interpolations whose tokens sit
        inside one template-literal token)."""
        line0 = self.text.count("\n", 0, start)
        shifted = [Token(t.kind, t.text, t.pos + start, t.line + line0)
                   for t in tokenize(self.text[start:end])]
        save_toks, save_i = self.toks, self.i
        self.toks, self.i = shifted, 0
        try:
            return self.parse_expr()
        finally:
            self.toks, self.i = save_toks, save_i

    def parse_template_literal(self, tok: Token) -> AstNode:
        """`` `a${b}c` `` → ``<operator>.formatString`` over the string parts
        and the parsed interpolation expressions (jssrc2cpg
        astForTemplateExpression)."""
        call = operator_call(OP_FORMAT_STRING, tok.text, tok.pos, tok.line)
        inner = tok.text[1:-1]
        base = tok.pos + 1
        i = 0
        idx = 0
        while True:
            j = inner.find("${", i)
            while j > 0 and inner[j - 1] == "\\":  # escaped \${…} stays text
                j = inner.find("${", j + 2)
            if j < 0:
                if inner[i:]:
                    idx += 1
                    call.add(AstNode(kind="LITERAL", code=inner[i:],
                                     pos=base + i, line=tok.line,
                                     type_full_name="string"),
                             order=idx, argument_index=idx)
                break
            if j > i:
                idx += 1
                call.add(AstNode(kind="LITERAL", code=inner[i:j],
                                 pos=base + i, line=tok.line,
                                 type_full_name="string"),
                         order=idx, argument_index=idx)
            depth = 1
            k = j + 2
            while k < len(inner) and depth > 0:
                if inner[k] == "{":
                    depth += 1
                elif inner[k] == "}":
                    depth -= 1
                k += 1
            expr = self._subparse_expr(base + j + 2, base + k - 1)
            if expr is not None:
                idx += 1
                call.add(expr, order=idx, argument_index=idx)
            i = k
        return call

    def parse_primary(self) -> AstNode | None:
        t = self.peek()
        if t is not None and t.kind == "tmpl":
            self.eat()
            return self.parse_template_literal(t)
        if t is not None and t.kind in ("str", "char"):
            self.eat()
            return AstNode(kind="LITERAL", code=t.text, pos=t.pos, line=t.line,
                           type_full_name="string")
        # `<` can never START an expression in JS except as JSX — comparison
        # operators only appear infix, so primary position disambiguates
        if t is not None and t.text == "<" and self.at_kind("ident", 1):
            return self.parse_jsx_element()
        return super().parse_primary()

    # --- JSX → TEMPLATE_DOM ---------------------------------------------------
    # AstForTemplateDomCreator.scala:10-97: every JSX construct becomes a
    # TEMPLATE_DOM node named after its Babel AST class (JSXElement /
    # JSXOpeningElement / JSXClosingElement / JSXAttribute / JSXText /
    # JSXExpressionContainer) with code = source slice; embedded expressions
    # parse as ordinary expression ASTs under their container.

    def _dom(self, name: str, code: str, tok: Token) -> AstNode:
        return AstNode(kind="TEMPLATE_DOM", name=name, full_name=name,
                       code=code, pos=tok.pos, line=tok.line)

    def _jsx_expr_container(self) -> AstNode:
        c_start = self.expect("{")
        inner = self.parse_expr()
        self.expect("}")
        cont = self._dom("JSXExpressionContainer",
                         self.text[c_start.pos:self._prev_end()].strip(), c_start)
        if inner is not None:
            cont.add(inner, order=1, argument_index=1)
        return cont

    def parse_jsx_element(self) -> AstNode:
        start = self.expect("<")
        self.eat()  # tag identifier
        attrs: list[AstNode] = []
        while self.peek() is not None and not self.at(">") and not self.at("/"):
            if not self.at_kind("ident"):
                self.eat()
                continue
            a_name = self.eat()
            val = None
            if self.accept("="):
                vt = self.peek()
                if vt is not None and vt.kind in ("str", "char"):
                    self.eat()
                    val = AstNode(kind="LITERAL", code=vt.text, pos=vt.pos,
                                  line=vt.line, type_full_name="string")
                elif vt is not None and vt.text == "{":
                    val = self._jsx_expr_container()
            attr = self._dom("JSXAttribute",
                             self.text[a_name.pos:self._prev_end()].strip(),
                             a_name)
            if val is not None:
                attr.add(val, order=1, argument_index=1)
            attrs.append(attr)
        self_closing = self.accept("/")
        self.expect(">")
        opening = self._dom("JSXOpeningElement",
                            self.text[start.pos:self._prev_end()].strip(), start)
        for i, a in enumerate(attrs, 1):
            opening.add(a, order=i, argument_index=i)
        elem = self._dom("JSXElement", "", start)
        kids: list[AstNode] = [opening]
        if not self_closing:
            while self.peek() is not None:
                t = self.peek()
                if t.text == "<" and self.peek(1) is not None \
                        and self.peek(1).text == "/":
                    break
                if t.text == "<":
                    kids.append(self.parse_jsx_element())
                elif t.text == "{":
                    kids.append(self._jsx_expr_container())
                else:
                    # raw text run: consume tokens up to the next tag/brace,
                    # recover the exact text from the source slice
                    while self.peek() is not None \
                            and self.peek().text not in ("<", "{"):
                        self.eat()
                    end = self.peek().pos if self.peek() is not None \
                        else len(self.text)
                    code = self.text[t.pos:end].strip()
                    if code:
                        kids.append(self._dom("JSXText", code, t))
            c_start = self.expect("<")
            if c_start is not None:  # tolerate a truncated span like the
                self.expect("/")     # base parser's lenient expect()
                if self.at_kind("ident"):
                    self.eat()
                self.expect(">")
                kids.append(self._dom(
                    "JSXClosingElement",
                    self.text[c_start.pos:self._prev_end()].strip(), c_start))
        elem.code = self.text[start.pos:self._prev_end()].strip()
        for i, k in enumerate(kids, 1):
            elem.add(k, order=i, argument_index=i)
        return elem


def parse_js(text: str) -> list[AstNode]:
    p = JsParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
