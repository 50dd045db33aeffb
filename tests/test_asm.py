"""ghidra-mini frontend (F52): the binary-lifter twin.

Reference parity targets: ``ghidra2cpg/.../processors/X86Processor.scala``
(mnemonic → operator map), ``passes/FunctionPass.scala`` (functions keyed by
bare name :30-36, register parameters :70-107, operand lowering :210-250,
callee-register argument injection :157-207), ``passes/x86/
X86FunctionPass.scala:30-46`` (linear CFG, no fall-through after JMP) and
``passes/JumpPass.scala:16-34`` (address-literal jump resolution — here via
the shared GOTO/JUMP_TARGET machinery).
"""

from joern_spark.frontend.ghidra_parser import parse_ghidra
from joern_spark.frontend.lowering import detect_language

F52 = "fixtures/asm/bsum.asm"

_SRC = """fn bsum @ 0x402000 params EDI ESI
0x402000: PUSH EBP
0x402004: MOV EBP, ESP
0x402008: XOR EAX, EAX
0x40200c: MOV ECX, EDI
0x402010: TEST ECX, ECX
0x402014: JLE 0x402028
0x402018: ADD EAX, [EBX + 8]
0x40201c: SUB ECX, 1
0x402020: CALL mix
0x402024: JMP 0x402010
0x402028: POP EBP
0x40202c: RET
endfn
fn mix @ 0x402030 params EAX
0x402030: LEA EDX, [EAX + 4]
0x402034: IMUL EAX, EDX
0x402038: CALL log
0x40203c: RFOO EAX
0x402040: RET
endfn"""


def test_detect_language_asm():
    assert detect_language("a.asm", "") == "asm"
    assert detect_language("d", "fn f @ 0x1000\n0x1000: RET\nendfn") == "asm"
    # Rust-ish `fn` without the @-address header is NOT a listing
    assert detect_language("d", "int fn_table() { return 1; }") == "c"


def _method(name):
    for t in parse_ghidra(_SRC):
        if t.kind == "METHOD" and t.name == name:
            return t
    raise AssertionError(f"no method {name}")


def test_functions_and_register_parameters():
    m = _method("bsum")
    # full_name IS the bare name (functionByName keying, stripped binaries
    # have no qualified names)
    assert m.full_name == "bsum"
    params = [c for c in m.children if c.kind == "METHOD_PARAMETER_IN"]
    assert [(p.name, p.argument_index) for p in params] == [
        ("EDI", 1), ("ESI", 2)]


def test_mnemonic_operator_map():
    m = _method("bsum")
    ops = [n.name for n in m.walk()
           if n.kind == "CALL" and n.name.startswith("<operator>")]
    # X86Processor.scala verbatim: MOV→assignment, ADD→incBy, TEST→compare,
    # XOR→assignmentXor, SUB→subtraction, PUSH/POP→assignment
    assert ops.count("<operator>.assignment") == 4  # MOV x2, PUSH, POP
    assert "<operator>.incBy" in ops
    assert "<operator>.compare" in ops
    assert "<operator>.assignmentXor" in ops
    assert "<operator>.subtraction" in ops
    mix = _method("mix")
    mops = [n.name for n in mix.walk() if n.kind == "CALL"]
    assert "<operator>.addressOf" in mops        # LEA
    assert "<operator>.multiplication" in mops   # IMUL
    # unmapped mnemonic → CALL named UNKNOWN (FunctionPass.scala:157)
    assert "UNKNOWN" in mops


def test_operand_lowering():
    m = _method("bsum")
    add = next(n for n in m.walk() if n.name == "<operator>.incBy")
    kinds = [(c.kind, c.code, c.argument_index) for c in add.children]
    # register → IDENTIFIER; composite memory operand → ONE composite-string
    # IDENTIFIER (FunctionPass.scala:212-222)
    assert kinds == [("IDENTIFIER", "EAX", 1), ("IDENTIFIER", "[EBX + 8]", 2)]
    sub = next(n for n in m.walk() if n.name == "<operator>.subtraction")
    assert [(c.kind, c.code) for c in sub.children] == [
        ("IDENTIFIER", "ECX"), ("LITERAL", "1")]


def test_call_argument_injection():
    m = _method("bsum")
    call_mix = next(n for n in m.walk()
                    if n.kind == "CALL" and n.name == "mix")
    # the callee's register parameters become the call's arguments
    # (FunctionPass.scala:157-207); always STATIC (Utils.scala:20)
    assert [(c.kind, c.name, c.argument_index) for c in call_mix.children] \
        == [("IDENTIFIER", "EAX", 1)]
    assert call_mix.dispatch_type == "STATIC_DISPATCH"
    mix = _method("mix")
    call_log = next(n for n in mix.walk()
                    if n.kind == "CALL" and n.name == "log")
    assert call_log.children == []  # unknown callee → no injected args


def test_jump_shapes():
    m = _method("bsum")
    ctrls = [n for n in m.walk() if n.kind == "CONTROL_STRUCTURE"]
    assert [c.ctrl_type for c in ctrls] == ["IF", "GOTO", "GOTO"]
    iff = ctrls[0]
    cond = iff.children[0]
    # JLE reads the sign flag — the condition node for the IF
    assert (cond.kind, cond.name, cond.is_condition) == ("IDENTIFIER", "SF", True)
    targets = [n.name for n in m.walk() if n.kind == "JUMP_TARGET"]
    assert sorted(targets) == ["0x402010", "0x402028"]
    labels = [n.name for n in m.walk() if n.kind == "JUMP_LABEL"]
    assert sorted(labels) == ["0x402010", "0x402028"]


_ARM_SRC = """arch arm
fn start @ 0x8000 params r0
0x8000: mov r1, r0
0x8004: cmp r1, 4
0x8008: bne 0x8014
0x800c: bl mixer
0x8010: b 0x8018
0x8014: sub r1, r1, 1
0x8018: ret
endfn
fn mixer @ 0x8020 params r1
0x8020: add r1, r1, 2
0x8024: ret
endfn"""

_MIPS_SRC = """arch mips
fn boot @ 0x400000 params $a0
0x400000: move $t0, $a0
0x400004: beq $t0, $zero, 0x400014
0x400008: _addiu $t0, $t0, 3
0x40000c: jal pack
0x400010: j 0x400018
0x400014: li $t0, 1
0x400018: jr ra
endfn
fn pack @ 0x400020 params $t0
0x400020: sll $t0, $t0, 2
0x400024: jr $t9
0x400028: jr ra
endfn"""


def test_arm_processor_map():
    tops = parse_ghidra(_ARM_SRC)
    start = next(t for t in tops if t.name == "start")
    ops = [n.name for n in start.walk() if n.kind == "CALL"]
    assert "<operator>.assignment" in ops    # mov (ArmProcessor.scala)
    assert "<operator>.compare" in ops       # cmp
    assert "<operator>.subtraction" in ops   # sub
    # bl → CALL with the callee's register parameter injected
    call = next(n for n in start.walk()
                if n.kind == "CALL" and n.name == "mixer")
    assert [(c.kind, c.name) for c in call.children] == [("IDENTIFIER", "r1")]
    # bne reads the CPSR flags; b is the unconditional jump
    ctrls = [(n.ctrl_type, n.code) for n in start.walk()
             if n.kind == "CONTROL_STRUCTURE"]
    assert ("IF", "bne 0x8014") in ctrls
    assert ("GOTO", "b 0x8018") in ctrls
    iff = next(n for n in start.walk() if n.ctrl_type == "IF")
    assert iff.children[0].name == "CPSR"


def test_mips_processor_map():
    tops = parse_ghidra(_MIPS_SRC)
    boot = next(t for t in tops if t.name == "boot")
    ops = [n.name for n in boot.walk() if n.kind == "CALL"]
    assert "<operator>.assignment" in ops    # move / li
    assert "<operator>.incBy" in ops         # _addiu delay-slot twin → addiu
    # beq compares registers directly — condition is a compare over them
    iff = next(n for n in boot.walk() if n.ctrl_type == "IF")
    cond = iff.children[0]
    assert cond.kind == "CALL" and cond.name == "<operator>.compare"
    assert [c.name for c in cond.children] == ["$t0", "$zero"]
    # jal → CALL with register-param injection; jr ra → RETURN
    call = next(n for n in boot.walk()
                if n.kind == "CALL" and n.name == "pack")
    assert [c.name for c in call.children] == ["$t0"]
    assert any(n.kind == "RETURN" for n in boot.walk())
    pack = next(t for t in tops if t.name == "pack")
    # register-target jr is NOT a return: goto call with the register arg
    gotos = [n for n in pack.walk()
             if n.kind == "CALL" and n.name == "<operator>.goto"]
    assert len(gotos) == 1 and gotos[0].children[0].name == "$t9"
    assert "<operator>.assignmentShiftLeft" in [
        n.name for n in pack.walk() if n.kind == "CALL"]


# ---- pipeline-level (session fixture includes F52) --------------------------

def test_asm_static_link_and_stub(g):
    """bsum→mix links exactly by full_name (functionByName); the external
    `log` call links to the method stub universe."""
    names = g.nodes["full_name"]
    call_edges = g.edges[(g.edges["kind"] == "CALL")
                         & (g.edges["doc_id"] == F52)]
    callees = {names.get(d) for d in call_edges["dst"]}
    assert "mix" in callees
    assert "log" in callees  # stub (MethodStubCreator) or cross-doc


def test_asm_loop_cfg(g):
    """TEST/JLE + JMP loop: the flags condition has two CFG successors (loop
    exit target and fall-through) and the loop-head JUMP_TARGET has two
    predecessors (entry fall-through + the closing JMP back-edge)."""
    n = g.nodes[g.nodes["doc_id"] == F52]
    cfg = g.edges[(g.edges["kind"] == "CFG") & (g.edges["doc_id"] == F52)]
    cond_ids = n.index[(n["kind"] == "IDENTIFIER") & (n["name"] == "SF")]
    assert len(cond_ids) == 1
    assert len(cfg[cfg["src"] == cond_ids[0]]) == 2
    head_ids = n.index[(n["kind"] == "JUMP_TARGET")
                       & (n["name"] == "0x402010")]
    assert len(head_ids) == 1
    assert len(cfg[cfg["dst"] == head_ids[0]]) == 2
    # unconditional JMP has exactly one successor: the jump target
    # (X86FunctionPass.scala:40-44 — no fall-through edge)
    goto_ids = n.index[(n["kind"] == "CONTROL_STRUCTURE")
                       & (n["ctrl_type"] == "GOTO")
                       & (n["code"] == "JMP 0x402010")]
    assert len(goto_ids) == 1
    succ = cfg[cfg["src"] == goto_ids[0]]
    assert list(succ["dst"]) == [head_ids[0]]


def test_asm_param_dataflow(g):
    """MOV ECX, EDI uses the EDI register parameter: a REACHING_DEF edge
    must leave bsum's METHOD_PARAMETER_IN EDI."""
    n = g.nodes[g.nodes["doc_id"] == F52]
    pids = n.index[(n["kind"] == "METHOD_PARAMETER_IN") & (n["name"] == "EDI")]
    assert len(pids) == 1
    rd = g.edges[(g.edges["kind"] == "REACHING_DEF")
                 & (g.edges["doc_id"] == F52)]
    assert len(rd[rd["src"] == pids[0]]) >= 1


_PCODE_SRC = """arch pcode
fn frob @ 0x10000 params v0
0x10000: COPY v1, v0
0x10004: INT_ADD v1, v1, 7
0x10008: INT_SLESS v2, v1, 40
0x1000c: CBRANCH v2, 0x10018
0x10010: CALLIND helper
0x10014: BRANCH 0x1001c
0x10018: INT_XOR v1, v1, v1
0x1001c: RETURN ra
endfn"""


def test_pcode_processor_map():
    tops = parse_ghidra(_PCODE_SRC)
    frob = next(t for t in tops if t.name == "frob")
    ops = [n.name for n in frob.walk() if n.kind == "CALL"]
    assert "<operator>.assignment" in ops   # COPY (PCodeProcessor.scala)
    assert "<operator>.addition" in ops     # INT_ADD
    assert "<operator>.xor" in ops          # INT_XOR
    assert "<operator>.TODO" in ops         # INT_SLESS keeps the TODO name
    # CALLIND → CALL; CBRANCH condition is the boolean varnode; BRANCH and
    # the conditional target both resolve through JUMP_TARGETs
    assert any(n.kind == "CALL" and n.name == "helper" for n in frob.walk())
    iff = next(n for n in frob.walk() if n.ctrl_type == "IF")
    assert iff.children[0].name == "v2"
    assert sorted(n.name for n in frob.walk() if n.kind == "JUMP_TARGET") \
        == ["0x10018", "0x1001c"]
    assert any(n.kind == "RETURN" for n in frob.walk())


def test_asm_binary_pack_scan(spark):
    """The ghidra querydb pack scans binary-frontend docs end-to-end: a
    listing's `CALL strcpy` fires call-to-strcpy (the reference's
    ghidra/DangerousFunctions.scala:13-31 strcpyUsed matches methods by
    name regex — asm CALLs carry exactly the bare function name)."""
    from joern_spark.corpus import docs_df
    from joern_spark.pipeline import run_pipeline
    from joern_spark.scan import DEFAULT_BUNDLE, run_scan

    src = ("fn copy @ 0x600000 params EDI ESI\n"
           "0x600000: MOV EAX, EDI\n"
           "0x600004: CALL strcpy\n"
           "0x600008: RET\n"
           "endfn")
    docs = docs_df(spark, [{"doc_id": "adhoc/bin.asm", "spans": [
        {"kind": "code", "text": src, "media_ref": "", "offset": 0},
        {"kind": "media", "text": "", "media_ref": "bin://adhoc", "offset": 1},
    ]}])
    res = run_pipeline(spark, docs, n_parts=2)
    bundle = [q for q in DEFAULT_BUNDLE if q.name == "call-to-strcpy"]
    assert bundle
    rows = run_scan(res.nodes, res.edges, bundle=bundle).collect()
    assert [(r["doc_id"], r["code"]) for r in rows] == [
        ("adhoc/bin.asm", "CALL strcpy")]


def test_asm_media_span_preserved(g):
    """The lifted binary artifact rides along as the doc's media span and
    survives to the spans frame (north-rule span-sequence invariant)."""
    s = g.spans[g.spans["doc_id"] == F52]
    media = s[s["kind"] == "media"]
    assert list(media["media_ref"]) == ["bin://f52-blob"]
    assert list(media["span_offset"]) == [1]
