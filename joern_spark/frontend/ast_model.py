"""In-memory AST node model used by the mini-frontends before lowering to rows.

One ``AstNode`` == one future CPG node row. Children carry the AST edge; extra
edge kinds (ARGUMENT/CONDITION/RECEIVER) are derived from ``argument_index``
and ``is_condition`` during lowering, mirroring the exact edge set the
reference's ``Ast.storeInDiffGraph`` emits (``x2cpg/.../Ast.scala:25-52``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class AstNode:
    kind: str
    code: str = ""
    name: str = ""
    full_name: str = ""
    signature: str = ""
    dispatch_type: str = ""
    ctrl_type: str = ""
    type_full_name: str = ""
    order: int = 0
    argument_index: int = 0
    line: int = 0
    pos: int = 0  # char offset into the doc's concatenated code text
    is_condition: bool = False
    is_receiver: bool = False
    is_external: bool = False
    children: list["AstNode"] = field(default_factory=list)

    def add(self, child: "AstNode | None", *, order: int | None = None,
            argument_index: int | None = None, condition: bool = False,
            receiver: bool = False) -> "AstNode | None":
        if child is None:
            return None
        if order is not None:
            child.order = order
        else:
            child.order = len(self.children) + 1
        if argument_index is not None:
            child.argument_index = argument_index
        child.is_condition = condition
        child.is_receiver = receiver
        self.children.append(child)
        return child

    def walk(self):
        yield self
        for c in self.children:
            yield from c.walk()


# joern operator-call vocabulary (reference: operatorextension/package.scala:10-126,
# c2cpg AstForExpressionsCreator.scala:13-58)
BINARY_OPERATOR_NAMES = {
    "+": "<operator>.addition",
    "-": "<operator>.subtraction",
    "*": "<operator>.multiplication",
    "/": "<operator>.division",
    "%": "<operator>.modulo",
    "==": "<operator>.equals",
    "!=": "<operator>.notEquals",
    # JS strict (jssrc2cpg AstForExpressionsCreator.scala:261-268)
    "===": "<operator>.equals",
    "!==": "<operator>.notEquals",
    "<": "<operator>.lessThan",
    ">": "<operator>.greaterThan",
    "<=": "<operator>.lessEqualsThan",
    ">=": "<operator>.greaterEqualsThan",
    "&&": "<operator>.logicalAnd",
    "||": "<operator>.logicalOr",
    "&": "<operator>.and",
    "|": "<operator>.or",
    "^": "<operator>.xor",
    "<<": "<operator>.shiftLeft",
    ">>": "<operator>.arithmeticShiftRight",
}

ASSIGNMENT_OPERATOR_NAMES = {
    "=": "<operator>.assignment",
    "+=": "<operator>.assignmentPlus",
    "-=": "<operator>.assignmentMinus",
    "*=": "<operator>.assignmentMultiplication",
    "/=": "<operator>.assignmentDivision",
    "%=": "<operator>.assignmentModulo",
    "&=": "<operator>.assignmentAnd",
    "|=": "<operator>.assignmentOr",
    "^=": "<operator>.assignmentXor",
    "<<=": "<operator>.assignmentShiftLeft",
    ">>=": "<operator>.assignmentArithmeticShiftRight",
}

UNARY_OPERATOR_NAMES = {
    "!": "<operator>.logicalNot",
    "~": "<operator>.not",
    "-": "<operator>.minus",
    "+": "<operator>.plus",
    "*": "<operator>.indirection",
    "&": "<operator>.addressOf",
}

OP_CONDITIONAL = "<operator>.conditional"
OP_ELVIS = "<operator>.elvis"
OP_DELETE = "<operator>.delete"
OP_ARRAY_NEW = "<operator>.arrayNew"
OP_FIELD_ACCESS = "<operator>.fieldAccess"
OP_INDIRECT_FIELD_ACCESS = "<operator>.indirectFieldAccess"
OP_INDEX_ACCESS = "<operator>.indexAccess"
# c2cpg lowers EVERY array subscript through the pointer form
# (AstForExpressionsCreator.scala:189-190 astForArrayIndexExpression)
OP_INDIRECT_INDEX_ACCESS = "<operator>.indirectIndexAccess"
# jssrc2cpg maps `??=` logical assignment to notNullAssert
# (AstForExpressionsCreator.scala:187); kotlin2cpg uses it for `!!`
OP_NOT_NULL_ASSERT = "<operator>.notNullAssert"
OP_CAST = "<operator>.cast"
OP_SIZEOF = "<operator>.sizeOf"
OP_ALLOC = "<operator>.alloc"
OP_FORMAT_STRING = "<operator>.formatString"
OP_LIST_LITERAL = "<operator>.listLiteral"
OP_DICT_LITERAL = "<operator>.dictLiteral"
OP_POST_INCREMENT = "<operator>.postIncrement"
OP_POST_DECREMENT = "<operator>.postDecrement"
OP_PRE_INCREMENT = "<operator>.preIncrement"
OP_PRE_DECREMENT = "<operator>.preDecrement"

STATIC_DISPATCH = "STATIC_DISPATCH"
DYNAMIC_DISPATCH = "DYNAMIC_DISPATCH"


def operator_call(name: str, code: str, pos: int, line: int) -> AstNode:
    return AstNode(
        kind="CALL", name=name, full_name=name, code=code, pos=pos, line=line,
        dispatch_type=STATIC_DISPATCH, signature="",
    )
