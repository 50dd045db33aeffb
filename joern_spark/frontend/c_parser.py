"""Recursive-descent parser for the C fixture subset → AstNode tree.

Replaces the reference's Eclipse CDT frontend (``c2cpg/.../astcreation/
AstCreator.scala:49-56``) for the language subset exercised by the fixture
programs (FIXTURES.md F1-F4, F7): function definitions, declarations,
if/else / while / do-while / for / switch / break / continue / goto / labels,
full expression precedence with joern's everything-is-a-call lowering
(``AstForExpressionsCreator.scala:13-58``).

Deterministic and total: unparseable regions become UNKNOWN nodes instead of
raising, so a malformed document degrades to provenance-only output rather
than failing the partition.
"""

from __future__ import annotations

from .ast_model import (
    ASSIGNMENT_OPERATOR_NAMES,
    BINARY_OPERATOR_NAMES,
    OP_CONDITIONAL,
    OP_DELETE,
    OP_ELVIS,
    OP_FIELD_ACCESS,
    OP_INDIRECT_FIELD_ACCESS,
    OP_INDIRECT_INDEX_ACCESS,
    OP_POST_DECREMENT,
    OP_POST_INCREMENT,
    OP_PRE_DECREMENT,
    OP_PRE_INCREMENT,
    OP_SIZEOF,
    STATIC_DISPATCH,
    UNARY_OPERATOR_NAMES,
    AstNode,
    operator_call,
)
from .tokenizer import TYPE_KEYWORDS, Token, tokenize

# binary precedence, low to high (C)
_BIN_LEVELS = [
    ["||"],
    ["&&"],
    ["|"],
    ["^"],
    ["&"],
    ["==", "!=", "===", "!=="],
    ["<", ">", "<=", ">="],
    ["<<", ">>"],
    ["+", "-"],
    ["*", "/", "%"],
]
# operator text → precedence level (texts are disjoint across levels)
_BIN_LEVEL_OF = {op: lvl for lvl, ops in enumerate(_BIN_LEVELS) for op in ops}


class CParser:
    # assignment-operator lowering table; dialect subclasses extend it (the
    # JS parser adds `??=` → notNullAssert per jssrc2cpg)
    ASSIGN_NAMES = ASSIGNMENT_OPERATOR_NAMES

    def __init__(self, text: str):
        self.text = text
        self.comments: list[Token] = []
        self.toks: list[Token] = tokenize(text, comments=self.comments)
        self.i = 0
        # template-parameter names registered by `template <typename T>`
        # headers — treated as type keywords for the templated entity
        # (c2cpg models the full CDT template AST; the mini keeps the
        # function/struct parseable with T as an opaque type)
        self.type_names: set[str] = set()

    def comment_nodes(self) -> "list[AstNode]":
        """COMMENT nodes for the skipped // and /* */ runs — top-level, so
        lowering attaches them under the FILE node (reference
        NodeTypeStarters.comment starter; c2cpg emits them when comment
        parsing is enabled)."""
        return [
            AstNode(kind="COMMENT", code=t.text, pos=t.pos, line=t.line)
            for t in self.comments
        ]

    # --- token helpers -----------------------------------------------------
    def peek(self, k: int = 0) -> Token | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def at(self, text: str, k: int = 0) -> bool:
        t = self.peek(k)
        return t is not None and t.text == text

    def at_kind(self, kind: str, k: int = 0) -> bool:
        t = self.peek(k)
        return t is not None and t.kind == kind

    def eat(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, text: str) -> Token | None:
        if self.at(text):
            return self.eat()
        return None

    def expect(self, text: str) -> Token | None:
        return self.accept(text)  # lenient: missing punctuation is tolerated

    def slice(self, start_pos: int, end_tok_index: int | None = None) -> str:
        end = (
            self.toks[end_tok_index].pos + len(self.toks[end_tok_index].text)
            if end_tok_index is not None and end_tok_index < len(self.toks)
            else (self.toks[self.i - 1].pos + len(self.toks[self.i - 1].text)
                  if self.i > 0 else start_pos)
        )
        return self.text[start_pos:end].strip()

    # --- types -------------------------------------------------------------
    def at_type(self, k: int = 0) -> bool:
        t = self.peek(k)
        if t is None:
            return False
        return (t.kind == "kw" and t.text in TYPE_KEYWORDS) or (
            t.kind == "ident" and t.text in self.type_names)

    def parse_type(self) -> str:
        parts: list[str] = []
        while self.at_type():
            t = self.eat()
            parts.append(t.text)
            if t.text in ("struct", "union", "enum") and self.at_kind("ident"):
                parts.append(self.eat().text)
            if self.at("<"):  # template arguments on a known type: Box<int>
                parts.append(self._swallow_template_args())
        stars = ""
        while self.at("*"):
            self.eat()
            stars += "*"
        return (" ".join(parts) + stars) if parts else stars

    def _swallow_template_args(self) -> str:
        """Consume a balanced ``<…>`` group, returning its source text."""
        start = self.eat()  # '<'
        depth = 1
        while self.peek() is not None and depth > 0:
            t = self.eat()
            if t.text == "<":
                depth += 1
            elif t.text == ">":
                depth -= 1
        return self.text[start.pos:self._prev_end()].strip()

    # --- entry -------------------------------------------------------------
    def parse_translation_unit(self) -> list[AstNode]:
        out: list[AstNode] = []
        while self.peek() is not None:
            start = self.i
            node = self.parse_top_level()
            if node is not None:
                out.append(node)
            if self.i == start:  # no progress: skip one token
                self.eat()
        # lambda METHODs hoisted from expression position (Java/C# dialects;
        # the JS/Py translation units append their own)
        out.extend(getattr(self, "_hoisted", []))
        return out

    def parse_top_level(self) -> AstNode | None:
        t = self.peek()
        if t is None:
            return None
        if t.text == "template" and self.at("<", 1):
            # `template <typename T, class U>` header: register the
            # parameter names as types FOR THE TEMPLATED ENTITY ONLY (a
            # later unrelated `int T = 1;` must not see T as a type), then
            # parse the function/struct normally (c2cpg dispatches the CDT
            # template AST; the mini parses with opaque parameter types).
            # A templated struct's own name stays registered so later
            # `Box<int> v;` declarations parse as types.
            self.eat()  # 'template'
            self.eat()  # '<'
            depth = 1
            prev = None
            added: set[str] = set()
            while self.peek() is not None and depth > 0:
                tok = self.eat()
                if tok.text == "<":
                    depth += 1
                elif tok.text == ">":
                    depth -= 1
                elif tok.kind == "ident" and prev in ("typename", "class") \
                        and tok.text not in self.type_names:
                    self.type_names.add(tok.text)
                    added.add(tok.text)
                prev = tok.text
            entity = self.parse_top_level()
            self.type_names -= added
            if entity is not None and entity.kind == "TYPE_DECL":
                self.type_names.add(entity.name)
            return entity
        if t.text in ("struct", "union", "enum") and self.at("{", 2):
            return self.parse_struct_decl()
        if self.at_type() or (t.kind == "ident" and self.at_kind("ident", 1)):
            return self.parse_function_or_global()
        # stray token run: consume to ';' as UNKNOWN
        return self.skip_statement_as_unknown()

    def parse_struct_decl(self) -> AstNode:
        start = self.peek().pos
        line = self.peek().line
        keyword = self.eat().text  # struct/union/enum
        name = self.eat().text if self.at_kind("ident") else "<anonymous>"
        # full_name uses the declaration-site spelling ("struct node") so the
        # dereferenced type_full_name of variables keys straight into it
        # (FieldAccessLinker / TYPE linking)
        node = AstNode(kind="TYPE_DECL", name=name,
                       full_name=f"{keyword} {name}", line=line, pos=start)
        self.expect("{")
        order = 0
        if keyword == "enum":
            # enum constants: MEMBERs with int type; an `= expr` initializer
            # is skipped through the next ',' or '}' so identifier-valued
            # initializers (enum E { A = FOO }) can't become phantom members
            while self.peek() is not None and not self.at("}"):
                t = self.eat()
                if t.kind == "ident":
                    order += 1
                    node.add(AstNode(kind="MEMBER", name=t.text, code=t.text,
                                     type_full_name="int", pos=t.pos,
                                     line=t.line), order=order)
                    if self.at("="):
                        # paren-depth-aware skip: `A = MAX(X, Y)` must consume
                        # the ',' inside the call, stopping only at depth 0
                        depth = 0
                        while self.peek() is not None:
                            if depth == 0 and (self.at(",") or self.at("}")):
                                break
                            tok = self.eat()
                            if tok.text == "(":
                                depth += 1
                            elif tok.text == ")":
                                depth -= 1
        else:
            while self.peek() is not None and not self.at("}"):
                before = self.i
                mt = self.peek()
                mtype = self.parse_type()
                if not mtype and self.at_kind("ident"):
                    mtype = self.eat().text
                # stars bind per declarator (`int *a, b;` types b as int,
                # `int a, *b;` types b as int*) — count them per name.
                # parse_type greedily ate the first declarator's stars: peel
                # them off the base and hand them to the first name only.
                base = mtype.rstrip("*")
                lead_stars = mtype[len(base):]
                mtype = base
                while True:
                    stars, lead_stars = lead_stars, ""
                    while self.at("*"):
                        self.eat()
                        stars += "*"
                    if not self.at_kind("ident"):
                        break
                    mname = self.eat().text
                    suffix = ""
                    while self.at("["):
                        while self.peek() is not None and not self.at("]"):
                            self.eat()
                        self.accept("]")
                        suffix += "[]"
                    order += 1
                    node.add(AstNode(kind="MEMBER", name=mname,
                                     code=f"{mtype}{stars} {mname}".strip(),
                                     type_full_name=(mtype + stars + suffix) or "ANY",
                                     pos=mt.pos, line=mt.line), order=order)
                    if not self.accept(","):
                        break
                self.accept(";")
                if self.i == before:  # no progress: skip one token
                    self.eat()
        self.expect("}")
        self.accept(";")
        node.code = self.slice(start)
        return node

    def parse_function_or_global(self) -> AstNode | None:
        start_tok = self.peek()
        ret_type = self.parse_type() or (self.eat().text if self.at_kind("ident") else "")
        while self.at("*"):
            self.eat()
            ret_type += "*"
        if not self.at_kind("ident"):
            return self.skip_statement_as_unknown()
        name_tok = self.eat()
        if self.at("("):
            return self.parse_function(ret_type, name_tok, start_tok)
        # global declaration: treat as LOCAL in <global>
        node = AstNode(kind="LOCAL", name=name_tok.text, code="", pos=start_tok.pos,
                       line=start_tok.line, type_full_name=ret_type)
        while self.peek() is not None and not self.at(";"):
            self.eat()
        self.accept(";")
        node.code = self.slice(start_tok.pos)
        return node

    def parse_function(self, ret_type: str, name_tok: Token, start_tok: Token) -> AstNode:
        method = AstNode(
            kind="METHOD", name=name_tok.text, full_name=name_tok.text,
            pos=start_tok.pos, line=start_tok.line,
        )
        self.expect("(")
        params: list[AstNode] = []
        param_types: list[str] = []
        while self.peek() is not None and not self.at(")"):
            p_start = self.peek()
            p_type = self.parse_type()
            if self.at("..."):
                self.eat()
                continue
            p_name = self.eat().text if self.at_kind("ident") else f"p{len(params)+1}"
            while self.at("["):  # array suffix
                while self.peek() is not None and not self.at("]"):
                    self.eat()
                self.accept("]")
                p_type += "[]"
            code = self.slice(p_start.pos)
            params.append(
                AstNode(kind="METHOD_PARAMETER_IN", name=p_name, code=code,
                        pos=p_start.pos, line=p_start.line, type_full_name=p_type or "ANY")
            )
            param_types.append(p_type or "ANY")
            if not self.accept(","):
                break
        self.expect(")")
        method.signature = f"{ret_type or 'void'}({','.join(param_types)})"
        method.code = self.text[start_tok.pos:self.toks[self.i - 1].pos + 1].strip()
        for idx, p in enumerate(params, start=1):
            p.argument_index = idx
            method.add(p, order=idx)
        self._on_params(params)
        if self.at("{"):
            body = self.parse_compound()
            method.add(body, order=len(params) + 1)
        else:
            self.accept(";")
            method.is_external = True
            method.add(AstNode(kind="BLOCK", code="<empty>"), order=len(params) + 1)
        method.add(
            AstNode(kind="METHOD_RETURN", code="RET",
                    type_full_name=ret_type or "ANY", line=name_tok.line,
                    pos=name_tok.pos),
            order=len(params) + 2,
        )
        return method

    def _on_params(self, params: list[AstNode]) -> None:
        """Hook: called after parameter parsing, before body parsing."""

    # --- statements ----------------------------------------------------------
    def parse_compound(self) -> AstNode:
        start = self.peek()
        block = AstNode(kind="BLOCK", pos=start.pos, line=start.line)
        self.expect("{")
        while self.peek() is not None and not self.at("}"):
            before = self.i
            for st in self.parse_statement():
                block.add(st)
            if self.i == before:
                self.eat()
        end_tok = self.i
        self.expect("}")
        block.code = self.text[start.pos:self.toks[min(end_tok, len(self.toks) - 1)].pos + 1].strip()
        return block

    def parse_statement(self) -> list[AstNode]:
        """Returns a list because a declaration-with-init lowers to
        [LOCAL, <operator>.assignment] siblings (c2cpg AstCreationPassTests:
        local order 1, assignment order 2)."""
        t = self.peek()
        if t is None:
            return []
        if t.text == ";":
            self.eat()
            return []
        if t.text == "{":
            return [self.parse_compound()]
        if t.kind == "kw":
            kw = t.text
            if kw == "if":
                return [self.parse_if()]
            if kw == "while":
                return [self.parse_while()]
            if kw == "do":
                return [self.parse_do()]
            if kw == "for":
                return [self.parse_for()]
            if kw == "switch":
                return [self.parse_switch()]
            if kw == "break":
                self.eat()
                self.accept(";")
                return [AstNode(kind="CONTROL_STRUCTURE", ctrl_type="BREAK",
                                code="break;", pos=t.pos, line=t.line)]
            if kw == "continue":
                self.eat()
                self.accept(";")
                return [AstNode(kind="CONTROL_STRUCTURE", ctrl_type="CONTINUE",
                                code="continue;", pos=t.pos, line=t.line)]
            if kw == "goto":
                self.eat()
                label = self.eat().text if self.at_kind("ident") else "*"
                self.accept(";")
                g = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="GOTO",
                            code=f"goto {label};", pos=t.pos, line=t.line)
                g.add(AstNode(kind="JUMP_LABEL", name=label, code=label,
                              pos=t.pos, line=t.line), order=1)
                return [g]
            if kw == "return":
                return [self.parse_return()]
            if kw == "try":
                return [self.parse_try()]
            if kw == "delete":
                # C++ delete / delete[] → Operators.delete call statement
                self.eat()
                if self.at("["):
                    self.eat()
                    self.accept("]")
                expr = self.parse_expr()
                self.accept(";")
                call = operator_call(OP_DELETE, "", t.pos, t.line)
                if expr is not None:
                    call.add(expr, order=1, argument_index=1)
                call.code = self.slice(t.pos)
                return [call]
            if kw == "throw":
                # javasrc2cpg: ThrowStmt → CONTROL_STRUCTURE THROW (CFG-empty,
                # matching CfgCreator's default case)
                self.eat()
                node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="THROW",
                               code="throw", pos=t.pos, line=t.line)
                expr = self.parse_expr()
                self.accept(";")
                if expr is not None:
                    node.add(expr, order=1, argument_index=1)
                    node.code = f"throw {expr.code}"
                return [node]
            if kw in ("case", "default"):
                return [self.parse_case_label()]
            if self.at_type():
                return self.parse_declaration()
        # label?  ident ':'
        if t.kind == "ident" and self.at(":", 1):
            self.eat()
            self.eat()
            return [AstNode(kind="JUMP_TARGET", name=t.text, code=f"{t.text}:",
                            pos=t.pos, line=t.line)]
        # non-keyword type declarations (Java class types: `Point q = ...`) —
        # at_type is keyword-only for C, so this branch never fires there
        if self.at_type():
            return self.parse_declaration()
        # expression statement
        expr = self.parse_expr()
        self.accept(";")
        return [expr] if expr is not None else []

    def parse_case_label(self) -> AstNode:
        t = self.eat()  # case | default
        if t.text == "case":
            val_parts = []
            while self.peek() is not None and not self.at(":"):
                val_parts.append(self.eat().text)
            self.accept(":")
            label = f"case {' '.join(val_parts)}"
        else:
            self.accept(":")
            label = "default"
        return AstNode(kind="JUMP_TARGET", name=label, code=f"{label}:",
                       pos=t.pos, line=t.line)

    def parse_return(self) -> AstNode:
        t = self.eat()
        node = AstNode(kind="RETURN", pos=t.pos, line=t.line)
        if not self.at(";"):
            expr = self.parse_expr()
            if expr is not None:
                node.add(expr, order=1, argument_index=1)
        self.accept(";")
        node.code = self.slice(t.pos)
        if node.code.endswith(";"):
            node.code = node.code[:-1].strip()
        return node

    def parse_declaration(self) -> list[AstNode]:
        """``int a = p0;`` → LOCAL(a) + CALL <operator>.assignment(a, p0)."""
        start = self.peek()
        base_type = self.parse_type()
        out: list[AstNode] = []
        while True:
            stars = ""
            while self.at("*"):
                self.eat()
                stars += "*"
            if self.at("(") and self.at("*", 1):
                # function-pointer declarator: T (*name)(params) [= init] —
                # c2cpg (CDT) models this as a LOCAL typed "T (*)(params)"
                # whose initializer assignment carries the METHOD_REF rhs
                # (the shape XTypeRecovery's identifier-assigned-method-ref
                # rule and XTypeHintCallLinker consume)
                self.eat()
                ptr = ""
                while self.at("*"):
                    self.eat()
                    ptr += "*"
                if not self.at_kind("ident"):
                    break
                name_tok = self.eat()
                self.accept(")")
                param_src = ""
                if self.at("("):
                    p0 = self.peek().pos
                    depth = 0
                    while self.peek() is not None:
                        tk = self.eat()
                        if tk.text == "(":
                            depth += 1
                        elif tk.text == ")":
                            depth -= 1
                            if depth == 0:
                                break
                    param_src = self.text[p0:self._prev_end()]
                full_type = f"{base_type}{stars} ({ptr}){param_src}"
            elif not self.at_kind("ident"):
                break
            else:
                name_tok = self.eat()
                full_type = base_type + stars
                while self.at("["):
                    while self.peek() is not None and not self.at("]"):
                        self.eat()
                    self.accept("]")
                    full_type += "[]"
            local = AstNode(kind="LOCAL", name=name_tok.text,
                            code=f"{full_type} {name_tok.text}".strip(),
                            pos=start.pos, line=name_tok.line,
                            type_full_name=full_type or "ANY")
            out.append(local)
            if self.at("="):
                self.eat()
                rhs = self.parse_assignment_expr()
                lhs = AstNode(kind="IDENTIFIER", name=name_tok.text,
                              code=name_tok.text, pos=name_tok.pos,
                              line=name_tok.line, type_full_name=full_type or "ANY")
                # a fn-ptr declarator's name sits inside "(*name)(...)", so a
                # raw name_tok.pos slice would drag the ")(params)" junk into
                # the code — render the canonical "name = rhs" instead
                a_code = (f"{name_tok.text} = {rhs.code}" if "(" in full_type
                          and rhs is not None
                          else self.text[name_tok.pos:self._prev_end()].strip())
                call = operator_call("<operator>.assignment", a_code,
                                     name_tok.pos, name_tok.line)
                call.add(lhs, order=1, argument_index=1)
                if rhs is not None:
                    call.add(rhs, order=2, argument_index=2)
                out.append(call)
            if not self.accept(","):
                break
        self.accept(";")
        return out

    def _prev_end(self) -> int:
        if self.i == 0:
            return 0
        t = self.toks[self.i - 1]
        return t.pos + len(t.text)

    # --- control structures ---------------------------------------------------
    def parse_if(self) -> AstNode:
        t = self.eat()
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="IF", pos=t.pos, line=t.line)
        self.expect("(")
        cond = self.parse_expr()
        close = self._prev_end()
        self.expect(")")
        node.code = f"if ({self.text[t.pos:close].split('(', 1)[1].strip() if '(' in self.text[t.pos:close] else ''})"
        node.add(cond, order=1, argument_index=1, condition=True)
        then = self.parse_statement_as_block()
        node.add(then, order=2)
        if self.at("else"):
            e = self.eat()
            els = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="ELSE", code="else",
                          pos=e.pos, line=e.line)
            els.add(self.parse_statement_as_block(), order=1)
            node.add(els, order=3)
        return node

    def parse_statement_as_block(self) -> AstNode:
        if self.at("{"):
            return self.parse_compound()
        t = self.peek()
        block = AstNode(kind="BLOCK", pos=t.pos if t else 0, line=t.line if t else 0)
        for st in self.parse_statement():
            block.add(st)
        block.code = block.children[0].code if block.children else ""
        return block

    def parse_try(self) -> AstNode:
        """``try { } catch (T e) { } … finally { }`` → CONTROL_STRUCTURE
        TRY with the try BLOCK as child 1, one CATCH control structure per
        handler (exception declaration lowered to a LOCAL inside it), and an
        optional trailing FINALLY (reference: javasrc2cpg
        AstForStatementsCreator tryStatement shape, CfgCreator.scala:492)."""
        t = self.eat()
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="TRY", code="try",
                       pos=t.pos, line=t.line)
        node.add(self.parse_statement_as_block(), order=1)
        while self.at("catch"):
            c = self.eat()
            cs = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="CATCH",
                         code="catch", pos=c.pos, line=c.line)
            if self.at("("):
                self.expect("(")
                toks = []
                while self.peek() is not None and not self.at(")"):
                    toks.append(self.eat())
                self.expect(")")
                if toks:
                    ty = " ".join(x.text for x in toks[:-1]) or "ANY"
                    cs.add(AstNode(kind="LOCAL", name=toks[-1].text,
                                   code=f"{ty} {toks[-1].text}".strip(),
                                   type_full_name=ty, pos=toks[0].pos,
                                   line=toks[0].line))
            cs.add(self.parse_statement_as_block())
            node.add(cs)
        if self.at("finally"):
            f = self.eat()
            fs = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="FINALLY",
                         code="finally", pos=f.pos, line=f.line)
            fs.add(self.parse_statement_as_block(), order=1)
            node.add(fs)
        return node

    def parse_while(self) -> AstNode:
        t = self.eat()
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="WHILE", pos=t.pos, line=t.line)
        self.expect("(")
        cond = self.parse_expr()
        cond_end = self._prev_end()
        self.expect(")")
        node.code = f"while ({self.text[t.pos + 5:cond_end].strip().lstrip('(').strip()})"
        node.add(cond, order=1, argument_index=1, condition=True)
        node.add(self.parse_statement_as_block(), order=2)
        return node

    def parse_do(self) -> AstNode:
        t = self.eat()
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="DO", pos=t.pos,
                       line=t.line, code="do")
        node.add(self.parse_statement_as_block(), order=1)
        self.expect("while")
        self.expect("(")
        cond = self.parse_expr()
        self.expect(")")
        self.accept(";")
        node.add(cond, order=2, argument_index=2, condition=True)
        return node

    def parse_for(self) -> AstNode:
        t = self.eat()
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="FOR", pos=t.pos, line=t.line)
        self.expect("(")
        locals_: list[AstNode] = []
        init: AstNode | None = None
        if not self.at(";"):
            if self.at_type():
                decl = self.parse_declaration()  # consumes trailing ';'
                locals_ = [d for d in decl if d.kind == "LOCAL"]
                inits = [d for d in decl if d.kind != "LOCAL"]
                init = inits[0] if inits else None
            else:
                init = self.parse_expr()
                self.accept(";")
        else:
            self.accept(";")
        cond = None
        if not self.at(";"):
            cond = self.parse_expr()
        self.accept(";")
        upd = None
        if not self.at(")"):
            upd = self.parse_expr()
        close = self._prev_end()
        self.expect(")")
        node.code = self.text[t.pos:close + 1].strip()
        # order layout per reference cfgForForStatement
        # (CfgCreator.scala:364-370): locals first, then init/cond/upd/body at
        # nLocals+1..nLocals+4.
        n = 0
        for loc in locals_:
            n += 1
            node.add(loc, order=n)
        if init is not None:
            node.add(init, order=n + 1)
        if cond is not None:
            node.add(cond, order=n + 2, argument_index=n + 2, condition=True)
        if upd is not None:
            node.add(upd, order=n + 3)
        node.add(self.parse_statement_as_block(), order=n + 4)
        return node

    def parse_switch(self) -> AstNode:
        t = self.eat()
        node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="SWITCH", pos=t.pos, line=t.line)
        self.expect("(")
        cond = self.parse_expr()
        cond_end = self._prev_end()
        self.expect(")")
        node.code = f"switch ({self.text[t.pos + 7:cond_end].strip().lstrip('(').strip()})"
        node.add(cond, order=1, argument_index=1, condition=True)
        node.add(self.parse_statement_as_block(), order=2)
        return node

    def skip_statement_as_unknown(self) -> AstNode | None:
        t = self.peek()
        if t is None:
            return None
        depth = 0
        while self.peek() is not None:
            tok = self.eat()
            if tok.text in ("{", "("):
                depth += 1
            elif tok.text in ("}", ")"):
                depth -= 1
            elif tok.text == ";" and depth <= 0:
                break
        code = self.slice(t.pos)
        return AstNode(kind="UNKNOWN", code=code, pos=t.pos, line=t.line)

    # --- expressions ----------------------------------------------------------
    def parse_expr(self) -> AstNode | None:
        return self.parse_assignment_expr()

    def parse_assignment_expr(self) -> AstNode | None:
        start = self.peek()
        lhs = self.parse_conditional()
        if lhs is None:
            return None
        t = self.peek()
        if t is not None and t.text in self.ASSIGN_NAMES:
            op = self.eat()
            rhs = self.parse_assignment_expr()
            call = operator_call(self.ASSIGN_NAMES[op.text],
                                 "", start.pos, start.line)
            call.add(lhs, order=1, argument_index=1)
            if rhs is not None:
                call.add(rhs, order=2, argument_index=2)
            call.code = self.text[start.pos:self._prev_end()].strip()
            return call
        return lhs

    def parse_conditional(self) -> AstNode | None:
        start = self.peek()
        cond = self.parse_binary(0)
        if cond is None:
            return None
        if self.at("?"):
            self.eat()
            if self.at(":"):
                # Kotlin/Groovy-style elvis `a ?: b` (Operators.elvis)
                self.eat()
                els = self.parse_conditional()
                call = operator_call(OP_ELVIS, "", start.pos, start.line)
                call.add(cond, order=1, argument_index=1)
                if els is not None:
                    call.add(els, order=2, argument_index=2)
                call.code = self.text[start.pos:self._prev_end()].strip()
                return call
            then = self.parse_assignment_expr()
            self.expect(":")
            els = self.parse_conditional()
            call = operator_call(OP_CONDITIONAL, "", start.pos, start.line)
            call.add(cond, order=1, argument_index=1)
            if then is not None:
                call.add(then, order=2, argument_index=2)
            if els is not None:
                call.add(els, order=3, argument_index=3)
            call.code = self.text[start.pos:self._prev_end()].strip()
            return call
        return cond

    def parse_binary(self, level: int) -> AstNode | None:
        # precedence climbing — tree-, pos-, and code-identical to the
        # 10-level recursive cascade it replaces, but one parse_unary call
        # per operand instead of len(_BIN_LEVELS) frames per expression
        # (the cascade was 16x the call count of the expressions it parsed)
        start = self.peek()
        lhs = self.parse_unary()
        return self._climb_binary(lhs, level, start)

    def _climb_binary(self, lhs: AstNode | None, min_level: int,
                      start: Token | None) -> AstNode | None:
        toks, n, get = self.toks, len(self.toks), _BIN_LEVEL_OF.get
        while lhs is not None and self.i < n:
            lvl = get(toks[self.i].text, -1)
            if lvl < min_level:
                break
            op = toks[self.i]
            self.i += 1
            rhs_start = toks[self.i] if self.i < n else None
            rhs = self.parse_unary()
            while rhs is not None and self.i < n:
                nxt = get(toks[self.i].text, -1)
                if nxt <= lvl:
                    break
                rhs = self._climb_binary(rhs, nxt, rhs_start)
            call = operator_call(BINARY_OPERATOR_NAMES[op.text], "",
                                 start.pos, start.line)
            call.add(lhs, order=1, argument_index=1)
            if rhs is not None:
                call.add(rhs, order=2, argument_index=2)
            call.code = self.text[start.pos:self._prev_end()].strip()
            lhs = call
        return lhs

    def parse_unary(self) -> AstNode | None:
        t = self.peek()
        if t is None:
            return None
        if t.text == "++" or t.text == "--":
            self.eat()
            operand = self.parse_unary()
            name = OP_PRE_INCREMENT if t.text == "++" else OP_PRE_DECREMENT
            call = operator_call(name, "", t.pos, t.line)
            if operand is not None:
                call.add(operand, order=1, argument_index=1)
            call.code = self.text[t.pos:self._prev_end()].strip()
            return call
        if t.text in UNARY_OPERATOR_NAMES and t.kind == "op":
            self.eat()
            operand = self.parse_unary()
            call = operator_call(UNARY_OPERATOR_NAMES[t.text], "", t.pos, t.line)
            if operand is not None:
                call.add(operand, order=1, argument_index=1)
            call.code = self.text[t.pos:self._prev_end()].strip()
            return call
        if t.text == "sizeof":
            self.eat()
            call = operator_call(OP_SIZEOF, "", t.pos, t.line)
            if self.at("("):
                self.eat()
                if self.at_type():
                    type_name = self.parse_type()
                    call.add(AstNode(kind="TYPE_REF", code=type_name,
                                     type_full_name=type_name, pos=t.pos, line=t.line),
                             order=1, argument_index=1)
                else:
                    inner = self.parse_expr()
                    if inner is not None:
                        call.add(inner, order=1, argument_index=1)
                self.expect(")")
            call.code = self.text[t.pos:self._prev_end()].strip()
            return call
        return self.parse_postfix()

    def parse_postfix(self) -> AstNode | None:
        start = self.peek()
        node = self.parse_primary()
        while node is not None and self.peek() is not None:
            t = self.peek()
            if t.text == "(" and node.kind == "IDENTIFIER":
                # direct call: identifier becomes the call itself (c2cpg:
                # the callee name is call.name, not a receiver child).
                self.eat()
                call = AstNode(kind="CALL", name=node.name, full_name=node.name,
                               dispatch_type=STATIC_DISPATCH, pos=node.pos, line=node.line)
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
                call.code = self.text[start.pos:self._prev_end()].strip()
                node = call
            elif t.text == "[":
                self.eat()
                idx_expr = self.parse_expr()
                self.expect("]")
                # c2cpg lowers every C array subscript through the pointer
                # form (AstForExpressionsCreator.scala:189-190); the plain
                # indexAccess spelling belongs to the Java/JS frontends
                call = operator_call(OP_INDIRECT_INDEX_ACCESS, "",
                                     start.pos, start.line)
                call.add(node, order=1, argument_index=1)
                if idx_expr is not None:
                    call.add(idx_expr, order=2, argument_index=2)
                call.code = self.text[start.pos:self._prev_end()].strip()
                node = call
            elif t.text in (".", "->"):
                self.eat()
                field = self.eat() if self.at_kind("ident") else None
                name = OP_FIELD_ACCESS if t.text == "." else OP_INDIRECT_FIELD_ACCESS
                call = operator_call(name, "", start.pos, start.line)
                call.add(node, order=1, argument_index=1)
                if field is not None:
                    call.add(AstNode(kind="FIELD_IDENTIFIER", name=field.text,
                                     code=field.text, pos=field.pos, line=field.line),
                             order=2, argument_index=2)
                call.code = self.text[start.pos:self._prev_end()].strip()
                node = call
            elif t.text == "++" or t.text == "--":
                self.eat()
                name = OP_POST_INCREMENT if t.text == "++" else OP_POST_DECREMENT
                call = operator_call(name, "", start.pos, start.line)
                call.add(node, order=1, argument_index=1)
                call.code = self.text[start.pos:self._prev_end()].strip()
                node = call
            else:
                break
        return node

    def parse_primary(self) -> AstNode | None:
        t = self.peek()
        if t is None:
            return None
        if t.text == "(":
            # cast or parenthesized expr
            if self.at_type(1):
                self.eat()
                type_name = self.parse_type()
                self.expect(")")
                operand = self.parse_unary()
                call = operator_call("<operator>.cast", "", t.pos, t.line)
                call.add(AstNode(kind="TYPE_REF", code=type_name,
                                 type_full_name=type_name, pos=t.pos, line=t.line),
                         order=1, argument_index=1)
                if operand is not None:
                    call.add(operand, order=2, argument_index=2)
                call.code = self.text[t.pos:self._prev_end()].strip()
                return call
            self.eat()
            inner = self.parse_expr()
            self.expect(")")
            return inner
        if t.kind == "ident":
            self.eat()
            return AstNode(kind="IDENTIFIER", name=t.text, code=t.text,
                           pos=t.pos, line=t.line)
        if t.kind in ("num", "str", "char") or t.text in ("true", "false", "null"):
            self.eat()
            return AstNode(kind="LITERAL", code=t.text, pos=t.pos, line=t.line,
                           type_full_name={"num": "int", "str": "char*",
                                           "char": "char"}.get(t.kind, "ANY"))
        if t.text == "NULL":
            self.eat()
            return AstNode(kind="LITERAL", code="NULL", pos=t.pos, line=t.line)
        return None


def parse_c(text: str) -> list[AstNode]:
    p = CParser(text)
    return p.parse_translation_unit() + p.comment_nodes()
