"""Flow semantics: which argument indices of a callee taint which others.

Re-expresses the reference's external-DSL semantics table
(``dataflowengineoss/.../DefaultSemantics.scala:23-123`` operator + C flows;
mapping ``(src, dst)`` with −1 = return value, ``PASSTHROUGH`` = identity).
Broadcast as a plain dict into the reaching-def kernel (SURVEY.md §2.A #26).
"""

from __future__ import annotations

PASSTHROUGH = ("PASSTHROUGH",)

_ASSIGN_VARIANTS = [
    "<operator>.assignmentAnd", "<operator>.assignmentArithmeticShiftRight",
    "<operator>.assignmentDivision", "<operator>.assignmentExponentiation",
    "<operator>.assignmentLogicalShiftRight", "<operator>.assignmentMinus",
    "<operator>.assignmentModulo", "<operator>.assignmentMultiplication",
    "<operator>.assignmentOr", "<operator>.assignmentPlus",
    "<operator>.assignmentShiftLeft", "<operator>.assignmentXor",
]


def default_semantics() -> dict[str, list[tuple[int, int]]]:
    sem: dict[str, list] = {
        "<operator>.addition": [(1, -1), (2, -1)],
        "<operator>.subtraction": [(1, -1), (2, -1)],
        "<operator>.multiplication": [(1, -1), (2, -1)],
        "<operator>.division": [(1, -1), (2, -1)],
        "<operator>.modulo": [(1, -1), (2, -1)],
        "<operator>.addressOf": [(1, -1)],
        "<operator>.assignment": [(2, 1), (2, -1)],
        "<operator>.cast": [(1, -1), (2, -1)],
        "<operator>.computedMemberAccess": [(1, -1)],
        "<operator>.conditional": [(2, -1), (3, -1)],
        "<operator>.elvis": [(1, -1), (2, -1)],
        "<operator>.notNullAssert": [(1, -1)],
        "<operator>.fieldAccess": [(1, -1)],
        "<operator>.getElementPtr": [(1, -1)],
        # ghidra2cpg's ADD lowering (DefaultSemantics.scala:48)
        "<operator>.incBy": [(1, 1), (2, 1), (3, 1), (4, 1)],
        "<operator>.indexAccess": [(1, -1)],
        "<operator>.indirectComputedMemberAccess": [(1, -1)],
        "<operator>.indirectFieldAccess": [(1, -1)],
        "<operator>.indirectIndexAccess": [(1, -1), (2, 1)],
        "<operator>.indirectMemberAccess": [(1, -1)],
        "<operator>.indirection": [(1, -1)],
        "<operator>.memberAccess": [(1, -1)],
        "<operator>.pointerShift": [(1, -1)],
        "<operator>.postDecrement": [(1, 1), (1, -1)],
        "<operator>.postIncrement": [(1, 1), (1, -1)],
        "<operator>.preDecrement": [(1, 1), (1, -1)],
        "<operator>.preIncrement": [(1, 1), (1, -1)],
        "<operator>.sizeOf": [],
        # common external C calls
        "abs": [(1, 1), (1, -1)],
        "abort": [],
        "atoi": [(1, 1), (1, -1)],
        "atol": [(1, 1), (1, -1)],
        "atof": [(1, 1), (1, -1)],
        "calloc": [(1, -1), (2, -1)],
        "exit": [(1, 1)],
        "free": [(1, 1)],
        "fwrite": [(1, 1), (1, -1), (2, -1), (3, -1), (4, -1)],
        "getc": [(1, 1)],
        "scanf": [(2, 2)],
        "strcmp": [(1, 1), (1, -1), (2, 2), (2, -1)],
        "strlen": [(1, 1), (1, -1)],
        "strncpy": [(1, 1), (2, 2), (3, 3), (1, -1), (2, -1)],
        "strncat": [(1, 1), (1, -1), (2, 2), (2, -1)],
    }
    for op in _ASSIGN_VARIANTS:
        sem[op] = [(2, 1), (1, 1), (2, -1)]
    return sem


def semantics_for(sem: dict, full_name: str | None, name: str | None = None):
    """Lookup like ``Semantics.forMethod`` (exact key; operator names double
    as full names)."""
    if full_name and full_name in sem:
        return sem[full_name]
    if name and name in sem:
        return sem[name]
    return None
