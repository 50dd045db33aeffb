"""Mini Java frontend for the fixture subset (FIXTURES.md F5/F6).

Substitutes the reference's ``javasrc2cpg`` for: class declarations with
``extends``/``implements``, fields (MEMBER), methods with modifiers, instance
vs static dispatch, ``super.x()`` external calls, ``new X()`` allocation.

Reuses the C expression/statement machinery (the joern lowering is language
independent — everything is a call); overrides type detection and method-call
postfix handling to produce DYNAMIC_DISPATCH calls with RECEIVER children and
``Class.method`` full-names resolvable by the call-graph linkers
(reference: ``javasrc2cpg/.../JavaSrc2Cpg.scala:27-40`` pipeline,
``DynamicCallLinker.scala:59-66`` validM keying).
"""

from __future__ import annotations

from .ast_model import AstNode, DYNAMIC_DISPATCH, STATIC_DISPATCH
from .c_parser import CParser
from .tokenizer import Token

_MODIFIERS = {"public", "private", "protected", "static", "final", "abstract"}


def _modifier_node(t: Token) -> AstNode:
    """MODIFIER node for an explicit modifier keyword (reference
    javasrc2cpg AstForDeclarationsCreator modifier emission;
    NodeTypeStarters.modifier starter). name carries the reference's
    ModifierTypes constant (upper-case)."""
    return AstNode(kind="MODIFIER", name=t.text.upper(), code=t.text,
                   pos=t.pos, line=t.line)


class _AnnotationMixin:
    """``@Marker`` / ``@Single("v")`` / ``@Normal(k = v, ...)`` →
    ANNOTATION with ANNOTATION_PARAMETER_ASSIGN / ANNOTATION_PARAMETER
    children (javasrc2cpg AstForTypeDeclsCreator.scala:456-484
    astForAnnotationExpr; marker → no children, single-member → implicit
    ``value`` parameter)."""

    def parse_annotations(self) -> "list[AstNode]":
        out: list[AstNode] = []
        while self.at("@") and self.peek(1) is not None \
                and self.peek(1).kind == "ident":
            at_tok = self.eat()
            name = self.eat().text
            anno = AstNode(kind="ANNOTATION", name=name, full_name=name,
                           pos=at_tok.pos, line=at_tok.line)
            if self.at("("):
                self.eat()
                order = 0
                while self.peek() is not None and not self.at(")"):
                    p_start = self.peek()
                    if self.at_kind("ident") and self.at("=", 1):
                        pname = self.eat().text
                        self.eat()
                    else:
                        pname = "value"  # SingleMemberAnnotationExpr
                    val = self.parse_assignment_expr()
                    order += 1
                    assign = AstNode(
                        kind="ANNOTATION_PARAMETER_ASSIGN", name=pname,
                        code=self.text[p_start.pos:self._prev_end()].strip(),
                        pos=p_start.pos, line=p_start.line)
                    assign.add(AstNode(kind="ANNOTATION_PARAMETER",
                                       name=pname, code=pname,
                                       pos=p_start.pos, line=p_start.line),
                               order=1, argument_index=1)
                    if val is not None:
                        assign.add(val, order=2, argument_index=2)
                    anno.add(assign, order=order)
                    if not self.accept(","):
                        break
                self.expect(")")
            anno.code = self.text[at_tok.pos:self._prev_end()].strip()
            out.append(anno)
        return out


class JavaParser(_AnnotationMixin, CParser):
    # lambda arrow token: `->` in Java (javasrc2cpg astForLambdaExpr);
    # dialect subclasses override (`=>` in JS arrows and C# lambdas)
    ARROW = "->"

    def __init__(self, text: str):
        super().__init__(text)
        self.current_class = ""
        self.class_methods: dict[str, set[str]] = {}
        self.var_types: dict[str, str] = {}
        self.current_is_static = False
        # hoisted `<lambda>N` METHODs met in expression position, appended
        # to the translation unit (javasrc2cpg's lambda-method convention)
        self._hoisted: list[AstNode] = []
        self._lambda_n = 0

    # --- lambdas / arrow functions -----------------------------------------
    def _at_arrow(self) -> bool:
        """Lookahead: `ident ARROW` or `( … ) ARROW` starts a lambda."""
        if self.at_kind("ident") and self.at(self.ARROW, 1):
            return True
        if self.at("("):
            depth = 0
            j = self.i
            while j < len(self.toks):
                txt = self.toks[j].text
                if txt == "(":
                    depth += 1
                elif txt == ")":
                    depth -= 1
                    if depth == 0:
                        return (j + 1 < len(self.toks)
                                and self.toks[j + 1].text == self.ARROW)
                j += 1
        return False

    def parse_arrow(self) -> AstNode:
        """Lambda → hoisted `<lambda>N` METHOD + a METHOD_REF in expression
        position; expression bodies lower to `return <expr>`. A named
        binding (`f = (a) -> …`) adopts the variable's name at the
        declaration site, making the call target statically linkable."""
        start = self.peek()
        params = []
        prev_vars = self.var_types
        self.var_types = dict(prev_vars)  # closure: outer vars stay visible
        if self.at("("):
            self.eat()
            while self.peek() is not None and not self.at(")"):
                if self.at_kind("ident"):
                    # typed params (`(int a) -> …`, `(Map<K,V> m) -> …`):
                    # the LAST ident before ',' / ')' is the name; generic
                    # argument groups in the type are swallowed
                    p = self.eat()
                    while self.at_kind("ident") or self.at("<"):
                        if self.at("<"):
                            depth = 0
                            while self.peek() is not None:
                                tok = self.eat()
                                if tok.text == "<":
                                    depth += 1
                                elif tok.text == ">":
                                    depth -= 1
                                    if depth == 0:
                                        break
                        else:
                            p = self.eat()
                    params.append(p)
                else:
                    self.eat()
                self.accept(",")
            self.expect(")")
        else:
            params.append(self.eat())
        self.expect(self.ARROW)
        for p in params:
            self.var_types[p.text] = "ANY"
        if self.at("{"):
            body = self.parse_compound()
        else:
            body = self._lambda_expr_body(start, self.parse_assignment_expr())
        ref = self._make_lambda(start, params, body)
        self.var_types = prev_vars
        return ref

    def _lambda_expr_body(self, start, expr) -> AstNode:
        """Expression-bodied lambda → ``BLOCK { return <expr> }``."""
        body = AstNode(kind="BLOCK", pos=start.pos, line=start.line)
        ret = AstNode(kind="RETURN", pos=start.pos, line=start.line)
        if expr is not None:
            ret.add(expr, order=1, argument_index=1)
            ret.code = expr.code
        body.add(ret, order=1)
        return body

    def _make_lambda(self, start, params, body: AstNode) -> AstNode:
        """Hoist a `<lambda>N` METHOD (params + body + METHOD_RETURN) and
        return its METHOD_REF with the named-binding rename hook attached —
        the one builder shared by every dialect's lambda spelling."""
        name = f"<lambda>{self._lambda_n}"
        self._lambda_n += 1
        method = AstNode(kind="METHOD", name=name, full_name=name,
                         signature=f"ANY({','.join('ANY' for _ in params)})",
                         pos=start.pos, line=start.line)
        for idx, p in enumerate(params, start=1):
            method.add(AstNode(kind="METHOD_PARAMETER_IN", name=p.text,
                               code=p.text, pos=p.pos, line=p.line,
                               type_full_name="ANY"),
                       order=idx, argument_index=idx)
        method.add(body, order=len(params) + 1)
        method.add(AstNode(kind="METHOD_RETURN", code="RET",
                           type_full_name="ANY", pos=start.pos,
                           line=start.line), order=len(params) + 2)
        method.code = self.text[start.pos:self._prev_end()].strip()
        self._hoisted.append(method)
        ref = AstNode(kind="METHOD_REF", name=name, full_name=name,
                      code=method.code, pos=start.pos, line=start.line)
        ref.arrow_method = method  # named-binding rename hook (declaration)
        return ref

    def _adopt_lambda_name(self, rhs: AstNode | None, name: str) -> None:
        """`f = <lambda>` binding: the lambda adopts the variable's name
        (statically linkable), used by the JS declaration and Python
        assignment paths."""
        if rhs is None or getattr(rhs, "arrow_method", None) is None:
            return
        m = rhs.arrow_method
        m.name = name
        m.full_name = (f"{self.current_class}.{name}"
                       if self.current_class else name)
        rhs.name, rhs.full_name = m.name, m.full_name

    def parse_assignment_expr(self) -> AstNode | None:
        if self._at_arrow():
            return self.parse_arrow()
        return super().parse_assignment_expr()

    # Java: class types are plain identifiers; a decl is `Type name ...`
    def at_type(self, k: int = 0) -> bool:
        if super().at_type(k):
            return True
        t = self.peek(k)
        nxt = self.peek(k + 1)
        return (
            t is not None and t.kind == "ident" and t.text[0].isupper()
            and nxt is not None and (nxt.kind == "ident" or nxt.text in ("[", "<"))
        )

    def parse_type(self) -> str:
        parts: list[str] = []
        while True:
            t = self.peek()
            if t is None:
                break
            if (t.kind == "kw" and t.text in ("void", "int", "char", "short",
                                              "long", "float", "double",
                                              "boolean", "byte", "String")) or (
                t.kind == "ident" and t.text[0].isupper() and not parts
            ):
                parts.append(self.eat().text)
                # generic args: skip <...>
                if self.at("<"):
                    depth = 0
                    while self.peek() is not None:
                        tok = self.eat()
                        if tok.text == "<":
                            depth += 1
                        elif tok.text == ">":
                            depth -= 1
                            if depth == 0:
                                break
            else:
                break
        suffix = ""
        while self.at("["):
            self.eat()
            self.accept("]")
            suffix += "[]"
        return ("".join(parts) + suffix) if parts else ""

    # --- entry ---------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        package = ""
        pkg_pos, pkg_line = 0, 1
        while self.peek() is not None:
            start = self.i
            t = self.peek()
            if t.text == "package":
                pkg_pos, pkg_line = t.pos, t.line
                self.eat()
                parts = []
                while self.peek() is not None and not self.at(";"):
                    tok = self.eat()
                    if tok.kind == "ident":
                        parts.append(tok.text)
                self.accept(";")
                package = ".".join(parts)
            elif t.text == "import":
                self.eat()
                parts = []
                while self.peek() is not None and not self.at(";"):
                    tok = self.eat()
                    if tok.kind == "ident" or tok.text == "*":
                        parts.append(tok.text)
                self.accept(";")
                imported = ".".join(parts)
                # XImportsPass analog: IMPORT node per import statement
                out.append(AstNode(
                    kind="IMPORT", name=parts[-1] if parts else "",
                    full_name=imported, code=f"import {imported}",
                    pos=t.pos, line=t.line,
                ))
            elif t.text in _MODIFIERS or t.text in ("class", "interface") \
                    or t.text == "@":
                node = self.parse_class()
                if node is not None:
                    out.append(node)
            else:
                self.eat()
            if self.i == start:
                self.eat()
        out.extend(self._hoisted)  # lambda METHODs met in expression position
        if package and out:
            # reference: types sit under a NAMESPACE_BLOCK per file
            # (NamespaceCreator.scala groups the blocks by name later)
            block = AstNode(kind="NAMESPACE_BLOCK", name=package,
                            full_name=package, code=f"package {package}",
                            pos=pkg_pos, line=pkg_line)
            for k, n in enumerate(out):
                block.add(n, order=k + 1)
            return [block]
        return out

    def parse_class(self) -> AstNode | None:
        start = self.peek()
        mod_toks: list[Token] = []
        annos: list[AstNode] = []
        while self.peek() is not None and (
                self.peek().text in _MODIFIERS or self.at("@")):
            if self.at("@"):
                annos.extend(self.parse_annotations())
            else:
                mod_toks.append(self.eat())
        if not (self.at("class") or self.at("interface")):
            return None
        self.eat()
        name = self.eat().text if self.at_kind("ident") else "<anonymous>"
        node = AstNode(kind="TYPE_DECL", name=name, full_name=name,
                       pos=start.pos, line=start.line)
        for mt in mod_toks:
            node.add(_modifier_node(mt))
        for a in annos:
            node.add(a)
        inherits: list[str] = []
        while self.peek() is not None and not self.at("{"):
            if self.at("extends") or self.at("implements"):
                self.eat()
                while self.at_kind("ident"):
                    inherits.append(self.eat().text)
                    if not self.accept(","):
                        break
            else:
                self.eat()
        node.type_full_name = ",".join(inherits)  # INHERITS_FROM payload
        self.expect("{")
        prev_class = self.current_class
        self.current_class = name
        order = 0
        while self.peek() is not None and not self.at("}"):
            before = self.i
            member = self.parse_class_member()
            if member is not None:
                order += 1
                node.add(member, order=order)
            if self.i == before:
                self.eat()
        self.expect("}")
        self.current_class = prev_class
        node.code = f"class {name}"
        return node

    def parse_class_member(self) -> AstNode | None:
        start = self.peek()
        is_static = False
        mod_toks: list[Token] = []
        annos: list[AstNode] = []
        while self.peek() is not None and (
                self.peek().text in _MODIFIERS or self.at("@")):
            if self.at("@"):
                annos.extend(self.parse_annotations())
                continue
            if self.peek().text == "static":
                is_static = True
            mod_toks.append(self.eat())
        if self.at("class") or self.at("interface"):
            self.i = self._rewind_modifiers(start)
            return self.parse_class()
        ret_type = self.parse_type()
        if not self.at_kind("ident"):
            return self.skip_statement_as_unknown()
        name_tok = self.eat()
        if self.at("("):
            prev_static = self.current_is_static
            self.current_is_static = is_static
            prev_vars = self.var_types
            self.var_types = {}
            m = self.parse_function(ret_type, name_tok, start)
            m.full_name = f"{self.current_class}.{name_tok.text}"
            m.signature = f"{ret_type or 'void'}({','.join(p.type_full_name for p in m.children if p.kind == 'METHOD_PARAMETER_IN')})"
            self.var_types = prev_vars
            self.current_is_static = prev_static
            for mt in mod_toks:
                m.add(_modifier_node(mt))
            for a in annos:
                m.add(a)
            return m
        # field
        while self.peek() is not None and not self.at(";"):
            self.eat()
        self.accept(";")
        member = AstNode(kind="MEMBER", name=name_tok.text,
                         code=f"{ret_type} {name_tok.text}".strip(),
                         type_full_name=ret_type or "ANY",
                         pos=start.pos, line=start.line)
        for mt in mod_toks:
            member.add(_modifier_node(mt))
        for a in annos:
            member.add(a)
        return member

    def _rewind_modifiers(self, start: Token) -> int:
        for j, t in enumerate(self.toks):
            if t.pos == start.pos:
                return j
        return self.i

    def _on_params(self, params: list[AstNode]) -> None:
        for p in params:
            self.var_types[p.name] = p.type_full_name

    def parse_declaration(self) -> list[AstNode]:
        out = super().parse_declaration()
        for n in out:
            if n.kind == "LOCAL":
                self.var_types[n.name] = n.type_full_name
        return out

    # --- expressions ----------------------------------------------------------
    def parse_unary(self) -> AstNode | None:
        t = self.peek()
        if t is not None and t.text == "new":
            self.eat()
            if (self.peek() is not None and self.peek().kind in ("kw", "ident")
                    and self.at("[", 1)):
                # `new T[n]` → Operators.arrayNew (allAllocTypes member);
                # bypass parse_type (it would greedily eat the [n] suffix)
                from .ast_model import OP_ARRAY_NEW

                cls = self.eat().text
                self.eat()
                size = None if self.at("]") else self.parse_expr()
                self.accept("]")
                call = AstNode(kind="CALL", name=OP_ARRAY_NEW,
                               full_name=OP_ARRAY_NEW, dispatch_type=STATIC_DISPATCH,
                               type_full_name=f"{cls}[]", pos=t.pos, line=t.line)
                if size is not None:
                    call.add(size, order=1, argument_index=1)
                call.code = self.text[t.pos:self._prev_end()].strip()
                return call
            cls = self.parse_type() or (self.eat().text if self.at_kind("ident") else "ANY")
            call = AstNode(kind="CALL", name="<init>",
                           full_name=f"{cls}.<init>", code="",
                           dispatch_type=STATIC_DISPATCH,
                           type_full_name=cls, pos=t.pos, line=t.line)
            if self.at("("):
                self.eat()
                idx = 0
                while self.peek() is not None and not self.at(")"):
                    arg = self.parse_assignment_expr()
                    if arg is None:
                        break
                    idx += 1
                    call.add(arg, order=idx, argument_index=idx)
                    if not self.accept(","):
                        break
                self.expect(")")
            call.code = self.text[t.pos:self._prev_end()].strip()
            return call
        return super().parse_unary()

    def parse_postfix(self) -> AstNode | None:
        start = self.peek()
        node = self.parse_primary()
        while node is not None and self.peek() is not None:
            t = self.peek()
            if t.text == "(" and node.kind == "IDENTIFIER":
                # bare call inside a class: dispatch to this class
                self.eat()
                full = f"{self.current_class}.{node.name}" if self.current_class else node.name
                call = AstNode(kind="CALL", name=node.name, full_name=full,
                               dispatch_type=STATIC_DISPATCH,
                               pos=node.pos, line=node.line)
                self._parse_args(call)
                call.code = self.text[start.pos:self._prev_end()].strip()
                node = call
            elif t.text == "." and self.peek(1) is not None and self.peek(2) is not None \
                    and self.peek(1).kind == "ident" and self.peek(2).text == "(":
                self.eat()
                meth = self.eat()
                self.eat()  # (
                recv_type = self._receiver_type(node)
                dispatch = DYNAMIC_DISPATCH
                full = self._dyn_full(recv_type, meth.text)
                call = AstNode(kind="CALL", name=meth.text, full_name=full,
                               dispatch_type=dispatch, pos=meth.pos, line=meth.line)
                node.argument_index = 0
                call.add(node, order=1, argument_index=0, receiver=True)
                self._parse_args(call)
                call.code = self.text[start.pos:self._prev_end()].strip()
                node = call
            elif t.text in (".",):
                self.eat()
                field = self.eat() if self.at_kind("ident") else None
                call = AstNode(kind="CALL", name="<operator>.fieldAccess",
                               full_name="<operator>.fieldAccess",
                               dispatch_type=STATIC_DISPATCH,
                               pos=start.pos, line=start.line)
                call.add(node, order=1, argument_index=1)
                if field is not None:
                    call.add(AstNode(kind="FIELD_IDENTIFIER", name=field.text,
                                     code=field.text, pos=field.pos, line=field.line),
                             order=2, argument_index=2)
                call.code = self.text[start.pos:self._prev_end()].strip()
                node = call
            elif t.text in ("++", "--"):
                return super()._postfix_incdec(node, start) if hasattr(super(), "_postfix_incdec") else self._simple_postfix(node, start)
            else:
                break
        return node

    def _simple_postfix(self, node: AstNode, start: Token) -> AstNode:
        from .ast_model import OP_POST_DECREMENT, OP_POST_INCREMENT, operator_call
        t = self.eat()
        name = OP_POST_INCREMENT if t.text == "++" else OP_POST_DECREMENT
        call = operator_call(name, "", start.pos, start.line)
        call.add(node, order=1, argument_index=1)
        call.code = self.text[start.pos:self._prev_end()].strip()
        return call

    def _parse_args(self, call: AstNode) -> None:
        idx = len([c for c in call.children if c.argument_index >= 1])
        while self.peek() is not None and not self.at(")"):
            arg = self.parse_assignment_expr()
            if arg is None:
                break
            idx += 1
            call.add(arg, order=len(call.children) + 1, argument_index=idx)
            if not self.accept(","):
                break
        self.expect(")")

    def _dyn_full(self, recv_type: str, meth: str) -> str:
        return f"{recv_type}.{meth}" if recv_type else f"<unknown>.{meth}"

    def _receiver_type(self, node: AstNode) -> str:
        if node.kind == "IDENTIFIER":
            if node.name == "this":
                return self.current_class
            if node.name == "super":
                return "<super>"
            if node.name in self.var_types:
                return self.var_types[node.name]
            if node.name[0].isupper():
                return node.name  # static call on class name
        if node.kind == "CALL" and node.type_full_name:
            return node.type_full_name
        return ""

    def parse_primary(self) -> AstNode | None:
        t = self.peek()
        if t is not None and t.kind == "kw" and t.text in ("this", "super"):
            self.eat()
            return AstNode(kind="IDENTIFIER", name=t.text, code=t.text,
                           pos=t.pos, line=t.line)
        return super().parse_primary()


def parse_java(text: str) -> list[AstNode]:
    p = JavaParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
