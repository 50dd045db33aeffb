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
        # Python-ish collection literals: pure pass-through constructors
        # (DefaultSemantics.scala:79-82, PTF = mappings + PassThroughMapping)
        "<operator>.tupleLiteral": [PASSTHROUGH],
        "<operator>.dictLiteral": [PASSTHROUGH],
        "<operator>.setLiteral": [PASSTHROUGH],
        "<operator>.listLiteral": [PASSTHROUGH],
        # JS template literal lowering (jssrc2cpg astForTemplateExpression →
        # formatString): the result carries every interpolated part
        "<operator>.formatString": [PASSTHROUGH],
        # common external C calls (DefaultSemantics.scala cFlows :90-125)
        "abs": [(1, 1), (1, -1)],
        "abort": [],
        "asctime": [(1, 1), (1, -1)],
        "asctime_r": [(1, 1), (1, -1)],
        "atoi": [(1, 1), (1, -1)],
        "atol": [(1, 1), (1, -1)],
        "atof": [(1, 1), (1, -1)],
        "calloc": [(1, -1), (2, -1)],
        "ceil": [(1, 1)],
        "clock": [],
        "ctime": [(1, -1)],
        "ctime64": [(1, -1)],
        "ctime_r": [(1, -1)],
        "ctime64_r": [(1, -1)],
        "difftime": [(1, -1), (2, -1)],
        "difftime64": [(1, -1), (2, -1)],
        "div": [PASSTHROUGH],
        "exit": [(1, 1)],
        "exp": [(1, -1)],
        "fabs": [(1, -1)],
        "fclose": [(1, 1), (1, -1)],
        "fdopen": [(1, -1), (2, -1)],
        "feof": [(1, 1), (1, -1)],
        "ferror": [(1, 1), (1, -1)],
        "fflush": [(1, 1), (1, -1)],
        "fgetc": [(1, 1), (1, -1)],
        "free": [(1, 1)],
        "fwrite": [(1, 1), (1, -1), (2, -1), (3, -1), (4, -1)],
        "getc": [(1, 1)],
        "scanf": [(2, 2)],
        "strcmp": [(1, 1), (1, -1), (2, 2), (2, -1)],
        "strlen": [(1, 1), (1, -1)],
        "strncpy": [(1, 1), (2, 2), (3, 3), (1, -1), (2, -1)],
        "strncat": [(1, 1), (1, -1), (2, 2), (2, -1)],
        # common external Java/Android calls (DefaultSemantics.scala
        # javaFlows :130-160; index 0 = receiver)
        "java.lang.String.split:java.lang.String[](java.lang.String)":
            [(0, 0), PASSTHROUGH],
        "java.lang.String.split:java.lang.String[](java.lang.String,int)":
            [(0, 0), PASSTHROUGH],
        "java.lang.String.compareTo:int(java.lang.String)":
            [(0, 0), PASSTHROUGH],
        "java.io.PrintWriter.print:void(java.lang.String)": [(0, 0), (1, 1)],
        "java.io.PrintWriter.println:void(java.lang.String)": [(0, 0), (1, 1)],
        "java.io.PrintStream.println:void(java.lang.String)": [(0, 0), (1, 1)],
        "java.io.PrintStream.print:void(java.lang.String)":
            [(0, 0), PASSTHROUGH],
        "android.text.TextUtils.isEmpty:boolean(java.lang.String)":
            [(0, -1), (1, -1)],
        "java.sql.PreparedStatement.prepareStatement:"
        "java.sql.PreparedStatement(java.lang.String)": [(1, -1)],
        "java.sql.PreparedStatement.prepareStatement:setDouble(int,double)":
            [(1, 1), (2, 2)],
        "java.sql.PreparedStatement.prepareStatement:setFloat(int,float)":
            [(1, 1), (2, 2)],
        "java.sql.PreparedStatement.prepareStatement:setInt(int,int)":
            [(1, 1), (2, 2)],
        "java.sql.PreparedStatement.prepareStatement:setLong(int,long)":
            [(1, 1), (2, 2)],
        "java.sql.PreparedStatement.prepareStatement:setShort(int,short)":
            [(1, 1), (2, 2)],
        "java.sql.PreparedStatement.prepareStatement:"
        "setString(int,java.lang.String)": [(1, 1), (2, 2)],
        "org.apache.http.HttpRequest.<init>:void(org.apache.http.RequestLine)":
            [(1, 1), (1, 0)],
        "org.apache.http.HttpRequest.<init>:"
        "void(java.lang.String,java.lang.String)": [(1, 1), (1, 0), (2, 0)],
        "org.apache.http.HttpRequest.<init>:void(java.lang.String,"
        "java.lang.String,org.apache.http.ProtocolVersion)":
            [(1, 1), (1, 0), (2, 2), (2, 0), (3, 3), (3, 0)],
        "org.apache.http.HttpResponse.getStatusLine:"
        "org.apache.http.StatusLine()": [(0, -1)],
        "org.apache.http.HttpResponse.setStatusLine:"
        "void(org.apache.http.StatusLine)": [(1, 0), (1, 1), (0, -1)],
        "org.apache.http.HttpResponse.setReasonPhrase:"
        "void(java.lang.String)": [(1, 0), (1, 1), (0, -1)],
        "org.apache.http.HttpResponse.getEntity:"
        "org.apache.http.HttpEntity()": [(0, -1)],
        "org.apache.http.HttpResponse.setEntity:"
        "void(org.apache.http.HttpEntity)": [(1, 0), (1, 1)],
    }
    for op in _ASSIGN_VARIANTS:
        sem[op] = [(2, 1), (1, 1), (2, -1)]
    # the reference keeps legacy "<operators>." (plural) aliases for eight
    # assignment variants — a historical typo preserved for graphs produced
    # by old frontends (DefaultSemantics.scala:66-75); note the alias rows
    # carry no (2, -1) return flow
    for op in ("assignmentExponentiation", "assignmentModulo",
               "assignmentShiftLeft", "assignmentLogicalShiftRight",
               "assignmentArithmeticShiftRight", "assignmentAnd",
               "assignmentOr", "assignmentXor"):
        sem[f"<operators>.{op}"] = [(2, 1), (1, 1)]
    return sem


def semantics_for(sem: dict, full_name: str | None, name: str | None = None):
    """Lookup like ``Semantics.forMethod`` (exact key; operator names double
    as full names)."""
    if full_name and full_name in sem:
        return sem[full_name]
    if name and name in sem:
        return sem[name]
    return None
