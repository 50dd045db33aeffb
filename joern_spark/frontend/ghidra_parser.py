"""Mini Ghidra frontend — the binary-lifter twin (13th reference frontend).

Substitutes the reference's ``ghidra2cpg`` (a Ghidra-backed machine-code
lifter) for a textual disassembly-listing subset. The reference disassembles
a binary and lowers it function-by-function
(``ghidra2cpg/.../passes/FunctionPass.scala``, ``x86/X86FunctionPass.scala``);
our input documents carry the lifted listing as text (the binary artifact
itself rides along as the doc's ``media_ref`` span), in the shape

    fn main @ 0x401000 params EDI ESI
    0x401000: MOV EAX, 97
    0x401004: CALL helper
    0x401008: JNZ 0x401010
    0x40100c: RET
    endfn

Reference parity, pass by pass:

- function → METHOD whose ``full_name`` IS the bare name (ghidra keys its
  call resolution on ``functionByName``, ``FunctionPass.scala:30-36`` — no
  qualified names exist in a stripped binary), parameters are the
  decompiler's register-storage symbols (``handleParameters``,
  ``FunctionPass.scala:70-107``) — here the ``params`` clause of the header;
- every instruction → a CALL node NAMED the processor-mapped operator
  (``X86Processor.scala:6-190``: MOV → ``<operator>.assignment``,
  ADD → ``<operator>.incBy``, CMP/TEST → ``<operator>.compare``, ...),
  STATIC_DISPATCH always (``Utils.scala:13-22``); unmapped mnemonics →
  ``UNKNOWN`` (``FunctionPass.scala:157`` getOrElse);
- operands → arguments at ``operand index + 1`` (``FunctionPass.scala:
  210-226``): registers → IDENTIFIER, scalars/addresses → LITERAL with the
  hex/decimal text as code, multi-object operands (``[EAX + 8]``) → one
  composite-string IDENTIFIER (``FunctionPass.scala:212-222``);
- ``CALL f`` → CALL node named/full-named ``f``; when ``f`` is defined in
  the same document its parameter REGISTERS are injected as the call's
  IDENTIFIER arguments (``FunctionPass.scala:157-207`` pulls the callee's
  register parameters via the decompiler — dataflow enters the callee
  through the registers live at the call site); unknown callees get no
  arguments (``functionByName.get(...)`` miss);
- control flow: instructions chain linearly (``X86FunctionPass.scala:
  30-46``); an unconditional JMP breaks the fall-through edge
  (``X86FunctionPass.scala:40-44``) and the jump lands on the instruction
  at the target address (``JumpPass.scala:16-34`` resolves the address
  literal). We lower JMP to the CONTROL_STRUCTURE GOTO + JUMP_LABEL shape
  and mark jumped-to addresses as JUMP_TARGETs so the shared CfgCreationPass
  produces exactly that CFG; conditional jumps (Jcc) become IF-with-goto
  (fall-through = implicit else) whose condition is the flags register the
  jump reads — the one deliberate deviation, since our CFG/DDG passes want
  a condition node while ghidra leaves Jcc conditions implicit.

All four of the reference's processor maps are carried verbatim
(``X86Processor.scala``, ``ArmProcessor.scala``, ``MipsProcessor.scala``,
``PCodeProcessor.scala`` — the last being Ghidra's architecture-neutral IR,
the reference's default lowering). A leading ``arch arm`` / ``arch mips`` /
``arch pcode`` line picks the processor the way ghidra's language id does;
MIPS conditional branches compare registers
directly (no flags), ``jr ra`` is the MIPS return idiom
(``MipsReturnEdgesPass.scala``), and register-target jumps lower to a goto
call with the register argument — unresolvable, exactly like the
reference's non-literal goto arguments (``JumpPass.scala:27-31``).

Deviations (documented, deliberate): line numbers are real listing lines
(the reference reuses the instruction ADDRESS as the line number,
``FunctionPass.scala:84,205`` — binaries have no lines; our docs do), and
register/literal types are ``int`` rather than ``Types.registerType``'s
raw-string types (which would flood TYPE vocabulary with every scalar seen,
a known reference wart — ``Utils.scala:39-47`` types literals by their own
text).
"""

from __future__ import annotations

import re

from .ast_model import AstNode, operator_call

# X86Processor.scala:6-190 — the subset our listings use, mapped verbatim
X86_OPERATORS = {
    "ADD": "<operator>.incBy",
    "AND": "<operator>.assignmentAnd",
    "CMP": "<operator>.compare",
    "DEC": "<operator>.assignment",
    "DIV": "<operator>.division",
    "IDIV": "<operator>.division",
    "IMUL": "<operator>.multiplication",
    "INC": "<operator>.assignment",
    "LEA": "<operator>.addressOf",
    "MOV": "<operator>.assignment",
    "MOVSX": "<operator>.assignment",
    "MOVZX": "<operator>.assignment",
    "MUL": "<operator>.multiplication",
    "NOP": "<operator>.NOP",
    "OR": "<operator>.or",
    "POP": "<operator>.assignment",
    "PUSH": "<operator>.assignment",
    "SHL": "<operator>.logicalShiftLeft",
    "SHR": "<operator>.logicalShiftRight",
    "SUB": "<operator>.subtraction",
    "TEST": "<operator>.compare",
    "XOR": "<operator>.assignmentXor",
}

# flags register each conditional jump reads (condition node for the IF)
COND_JUMP_FLAGS = {
    "JZ": "ZF", "JNZ": "ZF", "JE": "ZF", "JNE": "ZF",
    "JG": "SF", "JGE": "SF", "JL": "SF", "JLE": "SF",
    "JA": "CF", "JAE": "CF", "JB": "CF", "JBE": "CF",
}

# ArmProcessor.scala:6-60 — mapped verbatim (subset)
ARM_OPERATORS = {
    "add": "<operator>.incBy",
    "adr": "<operator>.assignment",
    "cmp": "<operator>.compare",
    "cpy": "<operator>.assignment",
    "ldp": "<operator>.addressOf",
    "ldr": "<operator>.addressOf",
    "ldrb": "<operator>.addressOf",
    "lsl": "<operator>.addressOf",
    "lsr": "<operator>.addressOf",
    "mov": "<operator>.assignment",
    "movk": "<operator>.assignment",
    "movs": "<operator>.assignment",
    "nop": "<operator>.NOP",
    "stp": "<operator>.assignment",
    "str": "<operator>.addition",
    "strb": "<operator>.assignment",
    "sub": "<operator>.subtraction",
}
# ARM conditional branches read the CPSR condition flags; cbz/cbnz test a
# register directly (the register operand becomes the condition node)
ARM_COND_FLAGS = {"bne": "CPSR", "beq": "CPSR", "bgt": "CPSR", "bge": "CPSR",
                  "blt": "CPSR", "ble": "CPSR", "bxeq": "CPSR"}
ARM_COND_REGS = {"cbz", "cbnz"}

# MipsProcessor.scala:6-120 — mapped verbatim (subset; the `_...` delay-slot
# twins map identically)
MIPS_OPERATORS = {
    "add": "<operator>.incBy",
    "addi": "<operator>.incBy",
    "addiu": "<operator>.incBy",
    "addu": "<operator>.incBy",
    "and": "<operator>.and",
    "andi": "<operator>.and",
    "clz": "<operator>.assignment",
    "li": "<operator>.assignment",
    "lui": "<operator>.assignment",
    "lw": "<operator>.assignment",
    "lb": "<operator>.assignment",
    "move": "<operator>.assignment",
    "nop": "<operator>.NOP",
    "nor": "<operator>.nor",
    "or": "<operator>.or",
    "ori": "<operator>.or",
    "sb": "<operator>.assignment",
    "sll": "<operator>.assignmentShiftLeft",
    "srl": "<operator>.assignmentLogicalShiftRight",
    "subu": "<operator>.decBy",
    "sw": "<operator>.assignment",
    "xor": "<operator>.assignmentXor",
    "xori": "<operator>.assignmentXor",
}
# MIPS conditional branches compare registers directly (no flags): the
# register operands (everything before the target) become the condition —
# lowered as a <operator>.compare call, or a bare identifier for one register
MIPS_COND_BRANCHES = {"beq", "bne", "beql", "bnel", "bgez", "bgtz", "blez",
                      "bltz", "bc1t", "bc1f"}

# PCodeProcessor.scala:6-81 — Ghidra's architecture-neutral IR (the default
# lowering for binaries without a dedicated processor). Ops the reference
# maps to <operator>.TODO keep that spelling; everything else verbatim.
PCODE_OPERATORS = {
    "BOOL_OR": "<operator>.or",
    "BOOL_XOR": "<operator>.xor",
    "COPY": "<operator>.assignment",
    "FLOAT_ADD": "<operator>.addition",
    "INT_ADD": "<operator>.addition",
    "INT_DIV": "<operator>.division",
    "INT_MULT": "<operator>.multiplication",
    "INT_OR": "<operator>.or",
    "INT_XOR": "<operator>.xor",
    "STORE": "<operator>.assignment",
}
_PCODE_TODO = {
    "BOOL_AND", "BOOL_NEGATE", "CALLOTHER", "CAST", "CPOOLREF", "EXTRACT",
    "FLOAT_ABS", "FLOAT_CEIL", "FLOAT_DIV", "FLOAT_EQUAL", "FLOAT_FLOOR",
    "FLOAT_LESS", "FLOAT_MULT", "FLOAT_NEG", "FLOAT_SQRT", "FLOAT_SUB",
    "INDIRECT", "INT_2COMP", "INT_AND", "INT_EQUAL", "INT_LEFT", "INT_LESS",
    "INT_NEGATE", "INT_NOTEQUAL", "INT_REM", "INT_RIGHT", "INT_SDIV",
    "INT_SEXT", "INT_SLESS", "INT_SREM", "INT_SUB", "INT_ZEXT", "LOAD",
    "MULTIEQUAL", "NEW", "PIECE", "POPCOUNT", "PTRADD", "PTRSUB", "SUBPIECE",
    "UNIMPLEMENTED",
}
PCODE_OPERATORS.update({op: "<operator>.TODO" for op in _PCODE_TODO})

# per-arch instruction grammar: which mnemonics call / return / jump.
# ghidra picks the processor from the binary's language id
# (Ghidra2Cpg.scala handlers per Processor); our listings declare it with an
# optional leading `arch arm|mips` line (default x86)
ARCH_SPECS = {
    "x86": {"operators": X86_OPERATORS, "call": {"CALL"}, "ret": {"RET"},
            "jump": {"JMP"}, "cond_flags": COND_JUMP_FLAGS,
            "cond_regs": frozenset()},
    "arm": {"operators": ARM_OPERATORS, "call": {"bl"},
            "ret": {"ret"}, "jump": {"b", "bx", "br", "blx", "blr", "bti"},
            "cond_flags": ARM_COND_FLAGS, "cond_regs": ARM_COND_REGS},
    "mips": {"operators": MIPS_OPERATORS, "call": {"jal", "bal"},
             # `jr ra` is the MIPS return idiom (MipsReturnEdgesPass)
             "ret": {"jr"}, "jump": {"j", "b"},
             "cond_flags": {}, "cond_regs": MIPS_COND_BRANCHES},
    # CBRANCH carries (condition varnode, target) — our listing grammar puts
    # the target last for every arch, so it slots into the cond_regs shape
    "pcode": {"operators": PCODE_OPERATORS, "call": {"CALL", "CALLIND"},
              "ret": {"RETURN"}, "jump": {"BRANCH", "BRANCHIND"},
              "cond_flags": {}, "cond_regs": {"CBRANCH"}},
}

_FN_RE = re.compile(
    r"^fn\s+(\w+)\s+@\s+(0x[0-9a-fA-F]+)(?:\s+params((?:\s+\$?\w+)+))?\s*$")
_INSN_RE = re.compile(
    r"^\s*(0x[0-9a-fA-F]+):\s+([A-Za-z_][A-Za-z0-9._]*)(?:\s+(\S.*?))?\s*$")
_ARCH_RE = re.compile(r"^arch\s+(x86|arm|mips|pcode)\s*$")
_NUM_RE = re.compile(r"^(?:0x[0-9a-fA-F]+|-?\d+)$")
_REG_TYPE = "int"


def _split_operands(s: str) -> list[str]:
    """Comma-split outside brackets: ``EAX, [EBX + 4]`` → 2 operands."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def _operand_node(tok: str, pos: int, line: int) -> AstNode:
    if _NUM_RE.match(tok):
        # Scalar/GenericAddress → LITERAL (FunctionPass.scala:224-250)
        return AstNode(kind="LITERAL", name=tok, code=tok,
                       type_full_name="int", pos=pos, line=line)
    # Register, or a composite memory operand as one string
    # (FunctionPass.scala:212-222 multi-opObject branch)
    return AstNode(kind="IDENTIFIER", name=tok, code=tok,
                   type_full_name=_REG_TYPE, pos=pos, line=line)


def _mnemonic_key(mnemonic: str, arch: str) -> str:
    """MIPS delay-slot twins (``_addu`` etc.) map identically to their base
    mnemonics (MipsProcessor.scala keeps both spellings as separate keys)."""
    if arch == "mips" and mnemonic.startswith("_"):
        return mnemonic[1:]
    return mnemonic


def parse_ghidra(text: str) -> list[AstNode]:
    lines = text.split("\n")
    offsets: list[int] = []
    cursor = 0
    for ln in lines:
        offsets.append(cursor)
        cursor += len(ln) + 1

    # the binary's language id picks the processor (Ghidra2Cpg handler per
    # Processor subclass); listings declare it with a leading `arch` line
    arch = "x86"
    for ln in lines:
        m = _ARCH_RE.match(ln.strip())
        if m:
            arch = m.group(1)
            break
        if _FN_RE.match(ln):
            break
    spec = ARCH_SPECS[arch]

    # pass 1: function table (FunctionPass.scala:30-36 functionByName) and
    # the set of jumped-to addresses (JumpPass target resolution)
    fn_params: dict[str, list[str]] = {}
    jump_targets: set[str] = set()
    for ln in lines:
        m = _FN_RE.match(ln)
        if m:
            fn_params[m.group(1)] = (m.group(3) or "").split()
            continue
        mi = _INSN_RE.match(ln)
        if mi is None:
            continue
        mn = _mnemonic_key(mi.group(2), arch)
        if mn in spec["jump"] or mn in spec["cond_flags"] \
                or mn in spec["cond_regs"]:
            ops = _split_operands(mi.group(3) or "")
            if ops and _NUM_RE.match(ops[-1]):
                jump_targets.add(ops[-1])

    out: list[AstNode] = []
    method: AstNode | None = None
    block: AstNode | None = None

    def close_method(line_no: int) -> None:
        nonlocal method, block
        if method is None:
            return
        n_params = sum(1 for c in method.children
                       if c.kind == "METHOD_PARAMETER_IN")
        method.add(block, order=n_params + 1)
        method.add(AstNode(kind="METHOD_RETURN", code="RET",
                           type_full_name="int", pos=block.pos,
                           line=block.line), order=n_params + 2)
        out.append(method)
        method = None
        block = None

    for li, ln in enumerate(lines):
        pos = offsets[li]
        line_no = li + 1
        m = _FN_RE.match(ln)
        if m:
            close_method(line_no)
            name = m.group(1)
            method = AstNode(kind="METHOD", name=name, full_name=name,
                             code=ln.strip(), pos=pos, line=line_no)
            for k, reg in enumerate(fn_params.get(name, ()), start=1):
                method.add(AstNode(
                    kind="METHOD_PARAMETER_IN", name=reg,
                    code=reg, type_full_name=_REG_TYPE,
                    pos=pos, line=line_no, argument_index=k), order=k,
                    argument_index=k)
            block = AstNode(kind="BLOCK", pos=pos, line=line_no)
            continue
        if ln.strip() == "endfn":
            close_method(line_no)
            continue
        mi = _INSN_RE.match(ln)
        if mi is None or block is None:
            continue
        addr, raw_mn, rest = mi.group(1), mi.group(2), mi.group(3) or ""
        mnemonic = _mnemonic_key(raw_mn, arch)
        if addr in jump_targets:
            block.add(AstNode(kind="JUMP_TARGET", name=addr,
                              code=f"{addr}:", pos=pos, line=line_no))
        insn_code = f"{raw_mn} {rest}".strip()

        def _goto_node() -> AstNode:
            tgt = _split_operands(rest)[-1] if rest.strip() else "*"
            g = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="GOTO",
                        code=insn_code, pos=pos, line=line_no)
            g.add(AstNode(kind="JUMP_LABEL", name=tgt, code=tgt,
                          pos=pos, line=line_no), order=1)
            return g

        if mnemonic in spec["ret"]:
            # MIPS: `jr ra` is the return idiom (MipsReturnEdgesPass);
            # `jr t9` is an indirect register jump — JumpPass can't resolve
            # those either ("Ignore for now", JumpPass.scala:27-31), so it
            # lowers like the reference: a goto call with the register arg
            if arch == "mips" and rest.strip().lstrip("$") != "ra":
                g = operator_call("<operator>.goto", insn_code, pos, line_no)
                g.add(_operand_node(rest.strip(), pos, line_no),
                      order=1, argument_index=1)
                block.add(g)
            else:
                block.add(AstNode(kind="RETURN", code=insn_code, pos=pos,
                                  line=line_no))
            continue
        if mnemonic in spec["call"]:
            callee = _split_operands(rest)[0] if rest.strip() else ""
            call = AstNode(kind="CALL", name=callee, full_name=callee,
                           code=insn_code, dispatch_type="STATIC_DISPATCH",
                           signature="", pos=pos, line=line_no)
            # callee's register parameters become the call's arguments
            # (FunctionPass.scala:157-207); unknown callee → none
            for k, reg in enumerate(fn_params.get(callee, ()), start=1):
                call.add(AstNode(kind="IDENTIFIER", name=reg, code=reg,
                                 type_full_name=_REG_TYPE, pos=pos,
                                 line=line_no), order=k, argument_index=k)
            block.add(call)
            continue
        if mnemonic in spec["jump"]:
            tgt = rest.strip()
            if _NUM_RE.match(tgt):
                block.add(_goto_node())
            else:
                # register-target jump: unresolvable, like the reference's
                # non-literal goto arguments (JumpPass.scala:27-31)
                g = operator_call("<operator>.goto", insn_code, pos, line_no)
                if tgt:
                    g.add(_operand_node(tgt, pos, line_no),
                          order=1, argument_index=1)
                block.add(g)
            continue
        if mnemonic in spec["cond_flags"] or mnemonic in spec["cond_regs"]:
            node = AstNode(kind="CONTROL_STRUCTURE", ctrl_type="IF",
                           code=insn_code, pos=pos, line=line_no)
            ops = _split_operands(rest)
            regs = [o for o in ops[:-1]] if len(ops) > 1 else []
            if mnemonic in spec["cond_flags"]:
                flag = spec["cond_flags"][mnemonic]
                cond = AstNode(kind="IDENTIFIER", name=flag, code=flag,
                               type_full_name=_REG_TYPE, pos=pos,
                               line=line_no)
            elif len(regs) >= 2:
                # MIPS compares registers directly — no flags; the operand
                # pair is the condition
                cond = operator_call("<operator>.compare",
                                     " ".join(regs), pos, line_no)
                for k, r2 in enumerate(regs, start=1):
                    cond.add(_operand_node(r2, pos, line_no), order=k,
                             argument_index=k)
            elif regs:
                cond = _operand_node(regs[0], pos, line_no)
            else:
                cond = AstNode(kind="IDENTIFIER", name="fcc", code="fcc",
                               type_full_name=_REG_TYPE, pos=pos,
                               line=line_no)
            node.add(cond, order=1, argument_index=1, condition=True)
            then = AstNode(kind="BLOCK", pos=pos, line=line_no)
            then.add(_goto_node())
            node.add(then, order=2)
            block.add(node)
            continue
        op = spec["operators"].get(mnemonic, "UNKNOWN")
        call = operator_call(op, insn_code, pos, line_no)
        if op == "UNKNOWN":
            # FunctionPass.scala:157 getOrElse — keep the node a CALL named
            # UNKNOWN, exactly what addCallOrReturnNode produces
            call.name = "UNKNOWN"
            call.full_name = "UNKNOWN"
        for k, tok in enumerate(_split_operands(rest), start=1):
            call.add(_operand_node(tok, pos, line_no), order=k,
                     argument_index=k)
        block.add(call)

    close_method(len(lines))
    return out
