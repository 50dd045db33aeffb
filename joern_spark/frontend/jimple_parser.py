"""Mini Jimple frontend — the bytecode-shaped twin of the source frontends.

Substitutes the reference's ``jimple2cpg`` (Soot-based; the reference's own
benchmark tables run every suite twice, source AND bytecode —
``benchmarks/README.md:28-45``) for a textual-Jimple subset:

- class declarations with modifiers / ``extends`` / ``implements``
  (``AstForTypeDeclsCreator.scala``), fields as MEMBER rows;
- 3-address method bodies: local declarations, identity statements
  (``r0 := @this: T`` / ``i0 := @parameterN: T``) which — exactly like the
  reference — emit NO AST and instead make those locals the METHOD_PARAMETER_IN
  nodes (``AstForStatementsCreator.scala:161-165`` "identity statements
  redefine parameters as locals"; ``AstForMethodsCreator.scala:63-67``
  parameters from ``getParameterLocals``);
- assignments lowered through the ``<operator>.*`` vocabulary
  (``AstForStatementsCreator.scala:59-85`` astsForDefinition), binops per
  ``AstForExpressionsCreator.scala:37-56`` (cmp/cmpg/cmpl → compare);
- typed invokes carrying exact ``<Class: ret name(args)>`` signatures:
  constructors and staticinvoke → STATIC_DISPATCH, instance invokes →
  DYNAMIC_DISPATCH (``AstForExpressionsCreator.scala:71-75``) — bytecode is
  where static call linking is exact by construction;
- unstructured control flow: ``if cond goto L`` / ``goto L`` / ``L:`` reuse
  the C frontend's CONTROL_STRUCTURE GOTO + JUMP_TARGET shapes (the CFG pass
  already resolves label jumps), lookup/table switch lowered to SWITCH whose
  cases are JUMP_TARGET + GOTO pairs;
- ``new`` / ``newarray`` → ``<operator>.alloc``
  (``AstForExpressionsCreator.scala:140-160``), casts, instanceof, lengthof,
  neg, field refs (static and instance), array refs.
"""

from __future__ import annotations

from .ast_model import (
    BINARY_OPERATOR_NAMES,
    DYNAMIC_DISPATCH,
    OP_ALLOC,
    OP_CAST,
    OP_FIELD_ACCESS,
    OP_INDEX_ACCESS,
    STATIC_DISPATCH,
    AstNode,
    operator_call,
)
from .c_parser import CParser
from .tokenizer import Token

OP_INSTANCE_OF = "<operator>.instanceOf"
OP_LENGTH_OF = "<operator>.lengthOf"
OP_COMPARE = "<operator>.compare"
OP_MINUS = "<operator>.minus"
OP_ASSIGNMENT = "<operator>.assignment"

_MODIFIERS = {"public", "private", "protected", "static", "final", "abstract",
              "synchronized", "native", "transient", "volatile"}

_PRIMITIVES = {"void", "int", "char", "short", "long", "float", "double",
               "boolean", "byte"}

# jimple binop spellings the shared map doesn't carry
_EXTRA_BINOPS = {"cmp": OP_COMPARE, "cmpg": OP_COMPARE, "cmpl": OP_COMPARE}


def _modifier_node(t: Token) -> AstNode:
    return AstNode(kind="MODIFIER", name=t.text.upper(), code=t.text,
                   pos=t.pos, line=t.line)


class JimpleParser(CParser):
    """Token-helpers come from CParser; the statement grammar is Jimple's own
    (linear 3-address code — no nested statements outside switch braces)."""

    def __init__(self, text: str):
        super().__init__(text)
        self.current_class = ""

    # --- types ---------------------------------------------------------------
    def at_jimple_type(self) -> bool:
        t = self.peek()
        return t is not None and (
            (t.kind == "kw" and t.text in _PRIMITIVES) or t.kind == "ident"
        )

    def parse_jimple_type(self) -> str:
        """``java.lang.String[]`` / ``int`` — dotted name + array suffixes."""
        parts = [self.eat().text]
        while self.at(".") and self.peek(1) is not None \
                and self.peek(1).kind in ("ident", "kw"):
            self.eat()
            parts.append(self.eat().text)
        name = ".".join(parts)
        while self.at("[") and self.peek(1) is not None and self.peek(1).text == "]":
            self.eat()
            self.eat()
            name += "[]"
        return name

    def _simple(self, qualified: str) -> str:
        """Linker keying uses simple class names (matching the source
        frontends' ``Class.method`` full names)."""
        return qualified.split(".")[-1]

    # --- entry ---------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        while self.peek() is not None:
            start = self.i
            node = self.parse_class()
            if node is not None:
                out.append(node)
            if self.i == start:
                self.eat()
        return out

    def parse_class(self) -> AstNode | None:
        start = self.peek()
        mod_toks: list[Token] = []
        while self.peek() is not None and self.peek().text in _MODIFIERS:
            mod_toks.append(self.eat())
        if not (self.at("class") or self.at("interface")):
            return None
        self.eat()
        qual = self.parse_jimple_type() if self.at_jimple_type() else "<anonymous>"
        name = self._simple(qual)
        node = AstNode(kind="TYPE_DECL", name=name, full_name=name,
                       code=f"class {name}", pos=start.pos, line=start.line)
        for mt in mod_toks:
            node.add(_modifier_node(mt))
        inherits: list[str] = []
        while self.peek() is not None and not self.at("{"):
            if self.at("extends") or self.at("implements"):
                self.eat()
                while self.at_jimple_type():
                    sup = self._simple(self.parse_jimple_type())
                    # the JDK root supertype is implicit in every source
                    # frontend — keep INHERITS_FROM to user classes
                    if sup != "Object":
                        inherits.append(sup)
                    if not self.accept(","):
                        break
            else:
                self.eat()
        node.type_full_name = ",".join(inherits)  # INHERITS_FROM payload
        self.expect("{")
        prev = self.current_class
        self.current_class = name
        order = len(node.children)
        while self.peek() is not None and not self.at("}"):
            before = self.i
            member = self.parse_member()
            if member is not None:
                order += 1
                node.add(member, order=order)
            if self.i == before:
                self.eat()
        self.expect("}")
        self.current_class = prev
        return node

    # --- members -------------------------------------------------------------
    def _method_name(self) -> str | None:
        """Method names include ``<init>`` / ``<clinit>``."""
        if self.at("<") and self.peek(1) is not None \
                and self.peek(1).kind == "ident" and self.at(">", 2):
            self.eat()
            name = self.eat().text
            self.eat()
            return f"<{name}>"
        if self.at_kind("ident"):
            return self.eat().text
        return None

    def parse_member(self) -> AstNode | None:
        start = self.peek()
        mod_toks: list[Token] = []
        while self.peek() is not None and self.peek().text in _MODIFIERS:
            mod_toks.append(self.eat())
        if not self.at_jimple_type():
            # stray token (e.g. semicolons) — skip
            return None
        ret_type = self.parse_jimple_type()
        name = self._method_name()
        if name is None:
            return None
        if self.at("("):
            m = self.parse_method(ret_type, name, start)
            for mt in mod_toks:
                m.add(_modifier_node(mt))
            return m
        # field
        self.accept(";")
        member = AstNode(kind="MEMBER", name=name,
                         code=f"{ret_type} {name}", type_full_name=ret_type,
                         pos=start.pos, line=start.line)
        for mt in mod_toks:
            member.add(_modifier_node(mt))
        return member

    def parse_method(self, ret_type: str, name: str, start: Token) -> AstNode:
        method = AstNode(
            kind="METHOD", name=name,
            full_name=f"{self.current_class}.{name}",
            pos=start.pos, line=start.line,
        )
        self.expect("(")
        param_types: list[str] = []
        while self.peek() is not None and not self.at(")"):
            if self.at_jimple_type():
                param_types.append(self.parse_jimple_type())
            else:
                self.eat()
            if not self.accept(","):
                break
        self.expect(")")
        method.signature = f"{ret_type}({','.join(param_types)})"
        method.code = self.text[start.pos:self._prev_end()].strip()

        if not self.at("{"):
            self.accept(";")
            method.is_external = True
            method.add(AstNode(kind="BLOCK", code="<empty>"), order=1)
            method.add(AstNode(kind="METHOD_RETURN", code="RET",
                               type_full_name=ret_type, pos=start.pos,
                               line=start.line), order=2)
            return method

        body_start = self.peek()
        self.expect("{")
        # collect linear statements; identity statements become parameters
        this_param: AstNode | None = None
        params: list[tuple[int, AstNode]] = []
        identity_locals: set[str] = set()
        stmts: list[AstNode] = []
        decls: list[AstNode] = []
        while self.peek() is not None and not self.at("}"):
            before = self.i
            kind, payload = self.parse_body_item()
            if kind == "identity":
                idx, p = payload
                identity_locals.add(p.name)
                if idx < 0:
                    this_param = p
                else:
                    params.append((idx, p))
            elif kind == "decl":
                decls.extend(payload)
            elif kind == "stmt":
                stmts.extend(payload)
            if self.i == before:
                self.eat()
        end_tok = self.i
        self.expect("}")

        # parameters: @this at argument_index 0 (AstForMethodsCreator
        # createThisNode), @parameterN at N+1; names are the identity-bound
        # locals, exactly the reference's getParameterLocals
        ordered: list[AstNode] = []
        if this_param is not None:
            ordered.append(this_param)
        ordered.extend(p for _, p in sorted(params, key=lambda x: x[0]))
        for k, p in enumerate(ordered, start=1):
            method.add(p, order=k, argument_index=p.argument_index)

        block = AstNode(kind="BLOCK", pos=body_start.pos, line=body_start.line)
        block.code = self.text[body_start.pos:
                               self.toks[min(end_tok, len(self.toks) - 1)].pos + 1].strip()
        # identity-bound locals are parameters, not LOCALs
        for d in decls:
            if d.name not in identity_locals:
                block.add(d)
        for s in stmts:
            block.add(s)
        method.add(block, order=len(ordered) + 1)
        method.add(AstNode(kind="METHOD_RETURN", code="RET",
                           type_full_name=ret_type, pos=body_start.pos,
                           line=body_start.line), order=len(ordered) + 2)
        return method

    # --- body items ------------------------------------------------------------
    def parse_body_item(self) -> tuple[str, object]:
        t = self.peek()
        if t is None:
            return "stmt", []
        # label:  `ident :` not followed by `=` (that would be `:=`)
        if t.kind == "ident" and self.at(":", 1) and not self.at("=", 2):
            self.eat()
            self.eat()
            return "stmt", [AstNode(kind="JUMP_TARGET", name=t.text,
                                    code=f"{t.text}:", pos=t.pos, line=t.line)]
        # identity statement: `local := @this|@parameterN|@caughtexception : T ;`
        if t.kind == "ident" and self.at(":", 1) and self.at("=", 2):
            return self.parse_identity(t)
        if t.text == "if":
            return "stmt", [self.parse_if_goto()]
        if t.text == "goto":
            return "stmt", [self.parse_goto()]
        if t.text == "return":
            self.eat()
            node = AstNode(kind="RETURN", code="return", pos=t.pos, line=t.line)
            if not self.at(";"):
                v = self.parse_imm()
                if v is not None:
                    node.add(v, order=1, argument_index=1)
                    node.code = f"return {v.code}"
            self.accept(";")
            return "stmt", [node]
        if t.text == "throw":
            self.eat()
            node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="THROW",
                           code="throw", pos=t.pos, line=t.line)
            v = self.parse_imm()
            if v is not None:
                node.add(v, order=1, argument_index=1)
                node.code = f"throw {v.code}"
            self.accept(";")
            return "stmt", [node]
        if t.text in ("entermonitor", "exitmonitor"):
            self.eat()
            v = self.parse_imm()
            self.accept(";")
            u = AstNode(kind="UNKNOWN", code=f"{t.text} {v.code if v else ''}".strip(),
                        pos=t.pos, line=t.line)
            if v is not None:
                u.add(v, order=1, argument_index=1)
            return "stmt", [u]
        if t.text in ("lookupswitch", "tableswitch"):
            return "stmt", [self.parse_switch_jimple()]
        if t.text in ("virtualinvoke", "specialinvoke", "interfaceinvoke",
                      "staticinvoke", "dynamicinvoke"):
            call = self.parse_invoke()
            self.accept(";")
            return "stmt", [call] if call is not None else []
        # declaration: `Type name (, name)* ;` — only if the NEXT token is an
        # ident and the line ends in `;` without `=` (3-address assignments
        # always have a bare local/field/array lhs)
        if self.at_jimple_decl():
            return "decl", self.parse_jimple_decl()
        # assignment / expression statement
        return "stmt", self.parse_assign_stmt()

    def at_jimple_decl(self) -> bool:
        """``Type name [, name]* ;`` — lookahead: after a type come only
        idents and commas until `;`."""
        if not self.at_jimple_type():
            return False
        j = self.i
        try:
            # walk a type
            k = j + 1
            while k + 1 < len(self.toks) and self.toks[k].text == "." \
                    and self.toks[k + 1].kind in ("ident", "kw"):
                k += 2
            while k + 1 < len(self.toks) and self.toks[k].text == "[" \
                    and self.toks[k + 1].text == "]":
                k += 2
            saw_name = False
            while k < len(self.toks):
                tk = self.toks[k]
                if tk.text == ";":
                    return saw_name
                if tk.kind == "ident":
                    saw_name = True
                elif tk.text != ",":
                    return False
                k += 1
            return False
        finally:
            self.i = j

    def parse_jimple_decl(self) -> list[AstNode]:
        start = self.peek()
        typ = self.parse_jimple_type()
        out: list[AstNode] = []
        while self.at_kind("ident"):
            n = self.eat()
            out.append(AstNode(kind="LOCAL", name=n.text,
                               code=f"{typ} {n.text}", type_full_name=typ,
                               pos=start.pos, line=start.line))
            if not self.accept(","):
                break
        self.accept(";")
        return out

    def parse_identity(self, local_tok: Token) -> tuple[str, object]:
        """``r0 := @this: T`` / ``i0 := @parameter0: T`` → METHOD_PARAMETER_IN
        (no AST row; reference AstForStatementsCreator.scala:161-165).
        ``r1 := @caughtexception`` → assignment from a CaughtException
        identifier (the one identity form the reference DOES lower)."""
        self.eat()  # local
        self.eat()  # :
        self.eat()  # =
        self.accept("@")
        nxt = self.peek()
        # `this` tokenizes as a keyword, `parameterN`/`caughtexception` as idents
        what = self.eat().text if nxt is not None and nxt.kind in ("ident", "kw") else ""
        if what == "caughtexception":
            self.accept(";")
            asg = operator_call(OP_ASSIGNMENT,
                                f"{local_tok.text} := @caughtexception",
                                local_tok.pos, local_tok.line)
            asg.add(AstNode(kind="IDENTIFIER", name=local_tok.text,
                            code=local_tok.text, pos=local_tok.pos,
                            line=local_tok.line), order=1, argument_index=1)
            asg.add(AstNode(kind="IDENTIFIER", name="@caughtexception",
                            code="@caughtexception", pos=local_tok.pos,
                            line=local_tok.line), order=2, argument_index=2)
            return "stmt", [asg]
        idx = -1
        if what.startswith("parameter"):
            try:
                idx = int(what[len("parameter"):])
            except ValueError:
                idx = 0
        self.accept(":")
        typ = self.parse_jimple_type() if self.at_jimple_type() else "ANY"
        self.accept(";")
        p = AstNode(kind="METHOD_PARAMETER_IN", name=local_tok.text,
                    code=f"{typ} {local_tok.text}",
                    type_full_name=self._simple(typ),
                    pos=local_tok.pos, line=local_tok.line,
                    argument_index=0 if idx < 0 else idx + 1)
        return "identity", (idx, p)

    # --- control flow ----------------------------------------------------------
    def _goto_node(self, t: Token) -> AstNode:
        label = self.eat().text if self.at_kind("ident") else "*"
        g = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="GOTO",
                    code=f"goto {label};", pos=t.pos, line=t.line)
        g.add(AstNode(kind="JUMP_LABEL", name=label, code=label,
                      pos=t.pos, line=t.line), order=1)
        return g

    def parse_goto(self) -> AstNode:
        t = self.eat()  # goto
        g = self._goto_node(t)
        self.accept(";")
        return g

    def parse_if_goto(self) -> AstNode:
        """``if i0 >= i1 goto l2;`` → CONTROL_STRUCTURE IF whose then-block is
        the goto (CfgCreationPass resolves the jump; fall-through is the
        implicit else)."""
        t = self.eat()  # if
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="IF",
                       pos=t.pos, line=t.line)
        cond = self.parse_expr_jimple()
        node.add(cond, order=1, argument_index=1, condition=True)
        node.code = f"if ({cond.code if cond is not None else ''})"
        then = AstNode(kind="BLOCK", pos=t.pos, line=t.line)
        if self.at("goto"):
            g = self.eat()
            then.add(self._goto_node(g))
        node.add(then, order=2)
        self.accept(";")
        return node

    def parse_switch_jimple(self) -> AstNode:
        """lookup/table switch: SWITCH whose body pairs JUMP_TARGET with the
        case's goto (AstForStatementsCreator.scala:88-124 switch shapes)."""
        t = self.eat()
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="SWITCH",
                       pos=t.pos, line=t.line)
        self.expect("(")
        cond = self.parse_imm()
        if cond is not None:
            node.add(cond, order=1, argument_index=1, condition=True)
        self.expect(")")
        node.code = f"{t.text}({cond.code if cond is not None else ''})"
        body = AstNode(kind="BLOCK", pos=t.pos, line=t.line)
        self.expect("{")
        while self.peek() is not None and not self.at("}"):
            c = self.peek()
            if c.text == "case":
                self.eat()
                val_parts = []
                while self.peek() is not None and not self.at(":"):
                    val_parts.append(self.eat().text)
                self.accept(":")
                label = f"case {' '.join(val_parts)}"
                body.add(AstNode(kind="JUMP_TARGET", name=label,
                                 code=f"{label}:", pos=c.pos, line=c.line))
            elif c.text == "default":
                self.eat()
                self.accept(":")
                body.add(AstNode(kind="JUMP_TARGET", name="default",
                                 code="default:", pos=c.pos, line=c.line))
            elif c.text == "goto":
                g = self.eat()
                body.add(self._goto_node(g))
                self.accept(";")
            else:
                self.eat()
        self.expect("}")
        self.accept(";")
        node.add(body, order=2)
        return node

    # --- assignments / expressions ----------------------------------------------
    def parse_assign_stmt(self) -> list[AstNode]:
        start = self.peek()
        lhs = self.parse_ref()
        if lhs is None:
            self.accept(";")
            return []
        if not self.at("="):
            self.accept(";")
            return [lhs]
        self.eat()
        rhs = self.parse_expr_jimple()
        self.accept(";")
        asg = operator_call(OP_ASSIGNMENT, "", start.pos, start.line)
        asg.add(lhs, order=1, argument_index=1)
        if rhs is not None:
            asg.add(rhs, order=2, argument_index=2)
        asg.code = f"{lhs.code} = {rhs.code if rhs is not None else ''}".strip()
        return [asg]

    def parse_ref(self) -> AstNode | None:
        """lhs/operand references: local, field ref, array ref, static field."""
        t = self.peek()
        if t is None:
            return None
        # static field ref `<C: T f>`
        if t.text == "<":
            return self.parse_field_sig(receiver=None, start=t)
        if t.kind in ("num", "str", "char") or t.text in ("null", "true", "false"):
            self.eat()
            return AstNode(kind="LITERAL", code=t.text, name=t.text,
                           pos=t.pos, line=t.line)
        if t.kind not in ("ident", "kw"):
            return None
        self.eat()
        node: AstNode = AstNode(kind="IDENTIFIER", name=t.text, code=t.text,
                                pos=t.pos, line=t.line)
        if self.at("[") and not self.at("]", 1):
            self.eat()
            idx = self.parse_imm()
            self.accept("]")
            call = operator_call(OP_INDEX_ACCESS, "", t.pos, t.line)
            call.add(node, order=1, argument_index=1)
            if idx is not None:
                call.add(idx, order=2, argument_index=2)
            call.code = f"{t.text}[{idx.code if idx is not None else ''}]"
            return call
        if self.at(".") and self.at("<", 1):
            self.eat()
            return self.parse_field_sig(receiver=node, start=t)
        return node

    def parse_field_sig(self, receiver: AstNode | None, start: Token) -> AstNode:
        """``<C: T f>`` → fieldAccess; instance form gets the receiver as
        argument 1 (c2cpg/javasrc member-access lowering)."""
        self.expect("<")
        cls = self._simple(self.parse_jimple_type())
        self.accept(":")
        self.parse_jimple_type()  # field type (declared; not an AST child)
        fname = self.eat().text if self.at_kind("ident") else ""
        self.expect(">")
        call = operator_call(OP_FIELD_ACCESS, "", start.pos, start.line)
        base = receiver if receiver is not None else AstNode(
            kind="IDENTIFIER", name=cls, code=cls, pos=start.pos, line=start.line)
        call.add(base, order=1, argument_index=1)
        call.add(AstNode(kind="FIELD_IDENTIFIER", name=fname, code=fname,
                         pos=start.pos, line=start.line),
                 order=2, argument_index=2)
        call.code = f"{base.code}.{fname}" if receiver is not None else f"{cls}.{fname}"
        return call

    def parse_imm(self) -> AstNode | None:
        """Immediate: local or constant (Jimple guarantees 3-address form)."""
        return self.parse_ref()

    def parse_expr_jimple(self) -> AstNode | None:
        t = self.peek()
        if t is None:
            return None
        if t.text in ("virtualinvoke", "specialinvoke", "interfaceinvoke",
                      "staticinvoke", "dynamicinvoke"):
            return self.parse_invoke()
        if t.text == "new":
            self.eat()
            typ = self._simple(self.parse_jimple_type())
            call = operator_call(OP_ALLOC, f"new {typ}", t.pos, t.line)
            call.type_full_name = typ
            return call
        if t.text in ("newarray", "newmultiarray"):
            self.eat()
            self.expect("(")
            typ = self.parse_jimple_type()
            self.expect(")")
            sizes: list[AstNode] = []
            while self.at("["):
                self.eat()
                if not self.at("]"):
                    s = self.parse_imm()
                    if s is not None:
                        sizes.append(s)
                self.accept("]")
            call = operator_call(OP_ALLOC, "", t.pos, t.line)
            call.type_full_name = f"{typ}[]"
            for k, s in enumerate(sizes, start=1):
                call.add(s, order=k, argument_index=k)
            call.code = f"newarray ({typ})" + "".join(f"[{s.code}]" for s in sizes)
            return call
        if t.text == "(":  # cast `(T) imm`
            self.eat()
            typ = self.parse_jimple_type() if self.at_jimple_type() else "ANY"
            self.expect(")")
            v = self.parse_imm()
            call = operator_call(OP_CAST, "", t.pos, t.line)
            call.type_full_name = self._simple(typ)
            if v is not None:
                call.add(v, order=1, argument_index=1)
            call.code = f"({typ}) {v.code if v is not None else ''}".strip()
            return call
        if t.text == "neg":
            self.eat()
            v = self.parse_imm()
            call = operator_call(OP_MINUS, "", t.pos, t.line)
            if v is not None:
                call.add(v, order=1, argument_index=1)
            call.code = f"neg {v.code if v is not None else ''}".strip()
            return call
        if t.text == "lengthof":
            self.eat()
            v = self.parse_imm()
            call = operator_call(OP_LENGTH_OF, "", t.pos, t.line)
            if v is not None:
                call.add(v, order=1, argument_index=1)
            call.code = f"lengthof {v.code if v is not None else ''}".strip()
            return call
        left = self.parse_ref()
        if left is None:
            return None
        nxt = self.peek()
        if nxt is not None and nxt.text == "instanceof":
            self.eat()
            typ = self.parse_jimple_type() if self.at_jimple_type() else "ANY"
            call = operator_call(OP_INSTANCE_OF, "", t.pos, t.line)
            call.add(left, order=1, argument_index=1)
            call.add(AstNode(kind="TYPE_REF", name=self._simple(typ), code=typ,
                             pos=t.pos, line=t.line), order=2, argument_index=2)
            call.code = f"{left.code} instanceof {typ}"
            return call
        op = None
        if nxt is not None and nxt.kind == "ident" and nxt.text in _EXTRA_BINOPS:
            op = _EXTRA_BINOPS[self.eat().text]
            sym = "cmp"
        elif nxt is not None and nxt.text in BINARY_OPERATOR_NAMES:
            sym = self.eat().text
            op = BINARY_OPERATOR_NAMES[sym]
        if op is None:
            return left
        right = self.parse_imm()
        call = operator_call(op, "", t.pos, t.line)
        call.add(left, order=1, argument_index=1)
        if right is not None:
            call.add(right, order=2, argument_index=2)
        call.code = f"{left.code} {sym} {right.code if right is not None else ''}".strip()
        return call

    def parse_invoke(self) -> AstNode | None:
        """``virtualinvoke r0.<C: ret m(argTs)>(args)`` →
        CALL full_name ``C.m`` signature ``ret(argTs)``; dispatch per
        AstForExpressionsCreator.scala:71-75 (constructor → STATIC,
        instance → DYNAMIC, static → STATIC)."""
        kw = self.eat()
        receiver: AstNode | None = None
        if kw.text in ("virtualinvoke", "specialinvoke", "interfaceinvoke"):
            r = self.eat() if self.at_kind("ident") else None
            if r is not None:
                receiver = AstNode(kind="IDENTIFIER", name=r.text, code=r.text,
                                   pos=r.pos, line=r.line)
            self.accept(".")
        self.expect("<")
        cls = self._simple(self.parse_jimple_type())
        self.accept(":")
        ret = self.parse_jimple_type() if self.at_jimple_type() else "void"
        mname = self._method_name() or ""
        self.expect("(")
        arg_types: list[str] = []
        while self.peek() is not None and not self.at(")"):
            if self.at_jimple_type():
                arg_types.append(self.parse_jimple_type())
            else:
                self.eat()
            if not self.accept(","):
                break
        self.expect(")")
        self.expect(">")
        is_ctor = mname in ("<init>", "<clinit>")
        dispatch = STATIC_DISPATCH if (
            kw.text == "staticinvoke" or is_ctor
        ) else DYNAMIC_DISPATCH
        call = AstNode(kind="CALL", name=mname, full_name=f"{cls}.{mname}",
                       signature=f"{ret}({','.join(arg_types)})",
                       dispatch_type=dispatch, pos=kw.pos, line=kw.line)
        if receiver is not None:
            call.add(receiver, order=1, argument_index=0, receiver=True)
        self.expect("(")
        idx = 0
        while self.peek() is not None and not self.at(")"):
            a = self.parse_imm()
            if a is None:
                break
            idx += 1
            call.add(a, order=len(call.children) + 1, argument_index=idx)
            if not self.accept(","):
                break
        self.expect(")")
        call.code = self.text[kw.pos:self._prev_end()].strip()
        return call


def parse_jimple(text: str) -> list[AstNode]:
    p = JimpleParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
