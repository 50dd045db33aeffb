"""Mini Go frontend (gosrc2cpg analog) for the fixture subset.

Substitutes the reference's ``gosrc2cpg`` (go.parser-JSON based,
``astcreation/AstForFunctionsCreator.scala`` function/method lowering,
``AstForGenDeclarationCreator.scala`` var/short-var declarations,
``AstForTypeDeclCreator.scala`` struct types) for: ``func`` declarations
with ``name Type`` parameters and a trailing result type, method
declarations with a ``(recv Type)`` receiver, ``:=`` short variable
declarations, ``new(T)`` allocation, ``type X struct``, ``package``
clauses, and single/grouped string imports.

Lowering conventions follow gosrc2cpg:

- file-level statements live in a synthetic ``:program`` METHOD (shared
  mini-frontend convention; gosrc2cpg's package-level init analog);
- ``func (w Worker) run(v int) int`` → METHOD ``Worker.run`` — the
  receiver binds into the local type lattice so body calls through it
  CHA-resolve (``AstForFunctionsCreator.astForMethodDecl`` receiver
  handling);
- ``x := expr`` declares a LOCAL at first use whose type comes from the
  RHS when known (``AstForGenDeclarationCreator`` short-var lowering);
- ``new(T)`` → ``<operator>.alloc`` typed ``T``
  (``AstForMethodCallExpressionCreator`` builtin-new lowering), seeding
  the declared-type lattice exactly like the JS ``new`` path;
- ``import "net/http"`` (single or grouped) → IMPORT nodes feeding
  DependenciesPass; ``package main`` is consumed (namespace grouping
  happens in NamespaceCreator over FILE nodes, as for the C frontend).

The fixture subset uses explicit ``;`` statement terminators (valid Go —
the spec's automatic semicolons made explicit), matching the other
mini-frontends' documented syntax envelopes.
"""

from __future__ import annotations

from .ast_model import OP_ALLOC, AstNode, STATIC_DISPATCH
from .js_parser import JsParser
from .tokenizer import Token


class GoParser(JsParser):
    def __init__(self, text: str):
        super().__init__(text)
        # `func` drives the shared `function` machinery; positions are
        # preserved so code slices keep the original Go spelling
        self.toks = [Token(t.kind, "function", t.pos, t.line)
                     if t.text == "func" else t for t in self.toks]
        self.known_classes: set[str] = {
            self.toks[j + 1].text
            for j, tok in enumerate(self.toks[:-1])
            if tok.text == "type" and self.toks[j + 1].kind == "ident"
        }

    # --- entry ---------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        prog = AstNode(kind="METHOD", name=":program", full_name=":program",
                       code=":program", signature="void()", pos=0, line=1)
        body = AstNode(kind="BLOCK", pos=0, line=1)
        while self.peek() is not None:
            start_i = self.i
            t = self.peek()
            if t.text == "package":
                self.eat()
                if self.at_kind("ident"):
                    self.eat()
                self.accept(";")
            elif t.text == "import":
                out.extend(self.parse_go_imports())
            elif t.text == "type":
                node = self.parse_go_struct()
                if node is not None:
                    out.append(node)
            elif t.text == "function":
                out.append(self.parse_go_func())
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
        out.extend(self._hoisted)  # lambda METHODs from expression position
        return out

    # --- imports -------------------------------------------------------------
    def parse_go_imports(self) -> list[AstNode]:
        t = self.eat()  # 'import'
        mods: list[Token] = []
        if self.accept("("):
            while self.peek() is not None and not self.at(")"):
                tok = self.eat()
                if tok.kind in ("str", "char"):
                    mods.append(tok)
            self.expect(")")
        else:
            while self.peek() is not None and not self.at(";"):
                tok = self.eat()
                if tok.kind in ("str", "char"):
                    mods.append(tok)
        self.accept(";")
        out: list[AstNode] = []
        for m in mods:
            path = m.text.strip("\"'")
            out.append(AstNode(
                kind="IMPORT", name=path.rsplit("/", 1)[-1], full_name=path,
                code=f'import "{path}"', pos=t.pos, line=m.line))
        return out

    # --- types ---------------------------------------------------------------
    def parse_go_struct(self) -> AstNode | None:
        start = self.eat()  # 'type'
        if not self.at_kind("ident"):
            return None
        name = self.eat().text
        node = AstNode(kind="TYPE_DECL", name=name, full_name=name,
                       pos=start.pos, line=start.line, code=f"type {name}")
        if not self.accept("struct"):
            # non-struct type alias: consume to ';'
            while self.peek() is not None and not self.at(";"):
                self.eat()
            self.accept(";")
            return node
        self.expect("{")
        order = 0
        while self.peek() is not None and not self.at("}"):
            if self.at_kind("ident"):
                f_tok = self.eat()
                f_type = self._parse_go_type()
                order += 1
                node.add(AstNode(kind="MEMBER", name=f_tok.text,
                                 code=f"{f_tok.text} {f_type}".strip(),
                                 type_full_name=f_type or "ANY",
                                 pos=f_tok.pos, line=f_tok.line), order=order)
            else:
                self.eat()
            self.accept(";")
        self.expect("}")
        self.accept(";")
        return node

    def _parse_go_type(self) -> str:
        parts: list[str] = []
        while self.peek() is not None and (
                self.at("*") or self.at("[") or self.at("]")
                or self.at_kind("ident") or self.at_kind("kw")):
            tok = self.peek()
            if tok.text in (",", ")", ";", "{", "}"):
                break
            parts.append(self.eat().text)
            if parts[-1] not in ("*", "[", "]"):
                break  # the base type name ends the type
        return "".join(parts)

    # --- functions -----------------------------------------------------------
    def parse_go_func(self) -> AstNode:
        start = self.eat()  # 'function'
        recv_name = recv_type = ""
        if self.at("("):
            # method declaration: `func (w Worker) run(...)`
            self.eat()
            if self.at_kind("ident"):
                recv_name = self.eat().text
            if self.at("*"):
                self.eat()
            if self.at_kind("ident"):
                recv_type = self.eat().text
            self.expect(")")
        name_tok = self.eat() if self.at_kind("ident") else Token(
            "ident", "<lambda>", start.pos, start.line)
        prev_class = self.current_class
        if recv_type:
            self.current_class = recv_type
        prev_vars = self.var_types
        self.var_types = {}
        if recv_name and recv_type:
            self.var_types[recv_name] = recv_type
        method = AstNode(
            kind="METHOD", name=name_tok.text,
            full_name=(f"{recv_type}.{name_tok.text}" if recv_type
                       else name_tok.text),
            pos=start.pos, line=start.line)
        self.expect("(")
        params: list[AstNode] = []
        param_types: list[str] = []
        while self.peek() is not None and not self.at(")"):
            p_start = self.peek()
            p_name = self.eat().text if self.at_kind("ident") \
                else f"p{len(params) + 1}"
            p_type = self._parse_go_type() or "ANY"
            params.append(AstNode(
                kind="METHOD_PARAMETER_IN", name=p_name,
                code=self.slice(p_start.pos), pos=p_start.pos,
                line=p_start.line, type_full_name=p_type))
            param_types.append(p_type)
            if not self.accept(","):
                break
        self.expect(")")
        ret = "void"
        if not self.at("{") and (self.at_kind("ident") or self.at_kind("kw")):
            ret = self._parse_go_type() or "void"
        method.signature = f"{ret}({','.join(param_types)})"
        method.code = self.slice(start.pos).strip()
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
        self.var_types = prev_vars
        self.current_class = prev_class
        return method

    # --- statements ----------------------------------------------------------
    def parse_statement(self) -> list[AstNode]:
        t = self.peek()
        # `x := expr` short variable declaration
        if (t is not None and t.kind == "ident" and self.at(":", 1)
                and self.at("=", 2)):
            return self.parse_go_short_decl()
        if t is not None and t.text == "function":
            return [self.parse_go_func()]
        return super().parse_statement()

    def parse_go_short_decl(self) -> list[AstNode]:
        from .ast_model import operator_call

        name_tok = self.eat()
        self.eat()  # ':'
        self.eat()  # '='
        rhs = self.parse_assignment_expr()
        rtype = "ANY"
        if rhs is not None and rhs.type_full_name:
            rtype = rhs.type_full_name
        local = AstNode(kind="LOCAL", name=name_tok.text,
                        code=name_tok.text, pos=name_tok.pos,
                        line=name_tok.line, type_full_name=rtype)
        self.var_types[name_tok.text] = rtype
        lhs = AstNode(kind="IDENTIFIER", name=name_tok.text,
                      code=name_tok.text, pos=name_tok.pos,
                      line=name_tok.line, type_full_name=rtype)
        call = operator_call(
            "<operator>.assignment",
            self.text[name_tok.pos:self._prev_end()].strip(),
            name_tok.pos, name_tok.line)
        call.add(lhs, order=1, argument_index=1)
        if rhs is not None:
            call.add(rhs, order=2, argument_index=2)
        self.accept(";")
        return [local, call]

    # --- expressions ----------------------------------------------------------
    def parse_unary(self) -> AstNode | None:
        t = self.peek()
        # builtin `new(T)` → Operators.alloc typed T
        if (t is not None and t.text == "new" and self.at("(", 1)
                and self.peek(2) is not None
                and self.peek(2).kind in ("ident", "kw")
                and self.at(")", 3)):
            self.eat()
            self.eat()
            cls = self.eat().text
            self.expect(")")
            call = AstNode(kind="CALL", name=OP_ALLOC, full_name=OP_ALLOC,
                           dispatch_type=STATIC_DISPATCH, type_full_name=cls,
                           pos=t.pos, line=t.line)
            call.code = self.text[t.pos:self._prev_end()].strip()
            return call
        return super().parse_unary()


def parse_go(text: str) -> list[AstNode]:
    p = GoParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
