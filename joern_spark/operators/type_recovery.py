"""Type recovery + field-access linking.

- ``type_recovery_pass``: bounded-iteration type propagation for identifiers
  (reference XTypeRecovery, ``x2cpg/.../frontend/XTypeRecovery.scala`` —
  default 2 iterations, ``:28``). Declarative join rounds:
    round 0: declared types — IDENTIFIER ← (method_id, name) → LOCAL /
             METHOD_PARAMETER_IN.type_full_name; ``this`` ← enclosing class.
    round k: assignment propagation — ``a = rhs`` gives a's identifiers the
             rhs type (alloc calls ``new X()`` and typed identifiers).
  Output: (node_id, recovered_type) — the DYNAMIC_TYPE_HINT analog.
- ``field_access_linker``: REF edges from ``<operator>.fieldAccess`` CALLs to
  the MEMBER they access, key = (receiver recovered type, field name)
  (reference FieldAccessLinkerPass,
  ``x2cpg/.../typerelations/FieldAccessLinkerPass.scala:17-87``).

Scale shape: every round is an equi-join on (method_id, name) — co-located
if nodes are bucketed by doc; the member dimension broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITERATIONS = 2  # XTypeRecovery.scala:28

_FIELD_ACCESS_OPS = ["<operator>.fieldAccess", "<operator>.indirectFieldAccess"]
_ALLOC_OPS = ["<operator>.new", "<operator>.alloc"]


def _declared(nodes: DataFrame) -> DataFrame:
    return (
        nodes.filter(
            F.col("kind").isin("LOCAL", "METHOD_PARAMETER_IN")
            & F.col("type_full_name").isNotNull() & (F.col("type_full_name") != "")
        )
        .select(F.col("method_id").alias("v_mid"), F.col("name").alias("v_name"),
                F.col("type_full_name").alias("v_type"))
        .dropDuplicates(["v_mid", "v_name"])
    )


def _members_dim(nodes: DataFrame) -> DataFrame:
    """(class full_name, member name, member declared type)."""
    classes = nodes.filter(F.col("kind") == "TYPE_DECL").select(
        F.col("node_id").alias("c_id"), F.col("full_name").alias("mc_full")
    )
    return (
        nodes.filter(
            (F.col("kind") == "MEMBER")
            & F.col("type_full_name").isNotNull() & (F.col("type_full_name") != "")
        )
        .join(F.broadcast(classes), F.col("parent_id") == F.col("c_id"))
        .select(F.col("mc_full").alias("recv_type"), F.col("name").alias("f_name"),
                F.col("type_full_name").alias("member_type"))
    )


def _distribute(rec: DataFrame, idents: DataFrame) -> DataFrame:
    """Lift node-level type events to the variable level: every occurrence of
    (method, name) carries every hint recorded for any occurrence — the
    dynamicTypeHintFullName set semantics of XTypeRecovery (one assignment
    types the variable, not just the assigned identifier node)."""
    per_var = (
        rec.join(idents.select("node_id", "method_id", "name"), "node_id")
        .select("method_id", "name", "recovered_type")
        .distinct()
    )
    return idents.join(per_var, ["method_id", "name"]).select(
        "node_id", "recovered_type"
    )


def type_recovery_events(nodes: DataFrame, iterations: int = ITERATIONS) -> DataFrame:
    """→ (node_id, recovered_type) hint events for identifiers (multi-row:
    a node carries every hint its variable accumulated).

    Full-rule analog of ``XTypeRecovery.scala`` as bounded join rounds:
    declared types, ``this``, assignment transfer from typed RHS
    (alloc/cast results, typed identifiers, internal-call returns, member
    loads) — each iteration is one round of declarative equi-joins, the
    distributed re-expression of the reference's per-procedure
    ``RecoverForXCompilationUnit`` worklist."""
    idents = nodes.filter(F.col("kind") == "IDENTIFIER").select(
        "node_id", "method_id", "name", "parent_id"
    )

    # round 0a: declared variable types
    decl = _declared(nodes)
    rec = (
        idents.join(
            decl,
            (idents["method_id"] == decl["v_mid"]) & (idents["name"] == decl["v_name"]),
        )
        .select(idents["node_id"], F.col("v_type").alias("recovered_type"))
    )

    # round 0b: `this` → enclosing class (METHOD.parent_id → TYPE_DECL)
    methods = nodes.filter(F.col("kind") == "METHOD").select(
        F.col("node_id").alias("m_id"), F.col("parent_id").alias("m_parent")
    )
    classes = nodes.filter(F.col("kind") == "TYPE_DECL").select(
        F.col("node_id").alias("c_id"), F.col("full_name").alias("c_full")
    )
    this_types = (
        idents.filter(F.col("name") == "this")
        .join(methods, idents["method_id"] == methods["m_id"])
        .join(F.broadcast(classes), F.col("m_parent") == F.col("c_id"))
        .select("node_id", F.col("c_full").alias("recovered_type"))
    )
    rec = rec.unionByName(this_types)

    # bounded assignment-propagation rounds
    assigns = nodes.filter(
        (F.col("kind") == "CALL") & (F.col("name") == "<operator>.assignment")
    ).select(F.col("node_id").alias("a_id"))
    kids = nodes.filter(F.col("argument_index").isNotNull()).select(
        "node_id", "parent_id", "argument_index", "kind", "name",
        F.col("type_full_name").alias("tfn"),
    )
    targets = (
        assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                     & (kids["argument_index"] == 1)
                     & (kids["kind"] == "IDENTIFIER"))
        .select("a_id", F.col("node_id").alias("t_id"), F.col("name").alias("t_name"),
                F.col("parent_id").alias("t_parent"))
    )
    # any typed RHS call result: alloc (`new X()` lowers to <init> with
    # type_full_name set), casts, constructors
    alloc_rhs = (
        assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                     & (kids["argument_index"] == 2)
                     & (kids["kind"] == "CALL")
                     & F.col("tfn").isNotNull() & (F.col("tfn") != ""))
        .select("a_id", F.col("tfn").alias("rhs_type"))
    )
    # internal-call-return RHS: `x = g()` takes g's METHOD_RETURN type
    methods = nodes.filter(F.col("kind") == "METHOD").select(
        F.col("node_id").alias("mm_id"), F.col("full_name").alias("mm_full")
    )
    rets = nodes.filter(
        (F.col("kind") == "METHOD_RETURN")
        & F.col("type_full_name").isNotNull() & (F.col("type_full_name") != "")
        & (F.col("type_full_name") != "ANY")
    ).select(F.col("method_id").alias("mm_id"), F.col("type_full_name").alias("ret_type"))
    method_ret = methods.join(rets, "mm_id").select(
        F.col("mm_full").alias("callee_full"), "ret_type"
    )
    call_ret_rhs = (
        assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                     & (kids["argument_index"] == 2)
                     & (kids["kind"] == "CALL")
                     & ~F.col("name").startswith("<operator>"))
        .select("a_id", F.col("node_id").alias("rhs_call"))
        .join(
            nodes.select(F.col("node_id").alias("rhs_call"),
                         F.col("full_name").alias("callee_full")),
            "rhs_call",
        )
        .join(F.broadcast(method_ret), "callee_full")
        .select("a_id", F.col("ret_type").alias("rhs_type"))
    )
    alloc_rhs = alloc_rhs.unionByName(call_ret_rhs)

    members = _members_dim(nodes)
    fa_calls = nodes.filter(
        (F.col("kind") == "CALL") & F.col("name").isin(_FIELD_ACCESS_OPS)
    ).select(F.col("node_id").alias("fa_id"))
    fa_recv = nodes.filter(
        (F.col("kind") == "IDENTIFIER") & (F.col("argument_index") == 1)
    ).select(F.col("parent_id").alias("fa_id"), F.col("node_id").alias("recv_id"))
    fa_fields = nodes.filter(F.col("kind") == "FIELD_IDENTIFIER").select(
        F.col("parent_id").alias("fa_id"), F.col("name").alias("f_name")
    )
    deref = F.trim(F.regexp_replace(F.col("recovered_type"), r"\*", ""))

    for _ in range(max(0, iterations - 1)):
        rec_d = _distribute(rec, idents)
        # typed RHS identifiers propagate to the assignment target
        rhs_ident = (
            assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                         & (kids["argument_index"] == 2)
                         & (kids["kind"] == "IDENTIFIER"))
            .select("a_id", F.col("node_id").alias("r_id"))
            .join(rec_d.withColumnRenamed("node_id", "r_id"), "r_id")
            .select("a_id", F.col("recovered_type").alias("rhs_type"))
        )
        # member-load RHS: `x = a.b` takes MEMBER b's declared type, keyed by
        # a's recovered (dereferenced) type — XTypeRecovery field-level rule
        fa_typed = (
            fa_calls.join(fa_recv, "fa_id")
            .join(rec_d.withColumnRenamed("node_id", "recv_id"), "recv_id")
            .select("fa_id", deref.alias("recv_type"))
            .join(fa_fields, "fa_id")
            .join(F.broadcast(members), ["recv_type", "f_name"])
            .select("fa_id", F.col("member_type").alias("rhs_type"))
        )
        member_rhs = (
            assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                         & (kids["argument_index"] == 2)
                         & (kids["kind"] == "CALL")
                         & F.col("name").isin(_FIELD_ACCESS_OPS))
            .select("a_id", F.col("node_id").alias("fa_id"))
            .join(fa_typed, "fa_id")
            .select("a_id", "rhs_type")
        )
        new_types = (
            targets.join(
                alloc_rhs.unionByName(rhs_ident).unionByName(member_rhs), "a_id"
            )
            .select(F.col("t_id").alias("node_id"),
                    F.col("rhs_type").alias("recovered_type"))
        )
        rec = rec.unionByName(new_types)

    return _distribute(rec, idents).distinct()


def type_recovery_pass(nodes: DataFrame, iterations: int = ITERATIONS) -> DataFrame:
    """→ (node_id, recovered_type), one row per node: of a variable's hint
    set the deterministic min string wins (the single-type consumer view
    used by field_access_linker)."""
    rec = type_recovery_events(nodes, iterations)
    return rec.groupBy("node_id").agg(F.min("recovered_type").alias("recovered_type"))


def dynamic_type_hints(nodes: DataFrame, edges: DataFrame,
                       recovered: DataFrame | None = None) -> DataFrame:
    """(call_id, hint_full) — DYNAMIC_TYPE_HINT_FULL_NAME analog: for a
    dynamic call ``recv.m()`` whose receiver identifier has a recovered type
    ``T``, the candidate callee is ``T.m`` (XTypeRecovery's hint emission
    feeding ``XTypeHintCallLinker.calleeNames``)."""
    if recovered is None:
        recovered = type_recovery_events(nodes)
    dyn = nodes.filter(
        (F.col("kind") == "CALL") & (F.col("dispatch_type") == "DYNAMIC_DISPATCH")
    ).select(F.col("node_id").alias("call_id"), F.col("name").alias("c_name"),
             "doc_id", "method_id")
    recv = edges.filter(F.col("kind") == "RECEIVER").select(
        F.col("src").alias("call_id"), F.col("dst").alias("recv_id")
    )
    deref = F.trim(F.regexp_replace(F.col("recovered_type"), r"\*", ""))
    return (
        dyn.join(recv, "call_id")
        .join(recovered.withColumnRenamed("node_id", "recv_id"), "recv_id")
        .filter(F.col("recovered_type") != "ANY")
        .select(
            "call_id", "doc_id", "method_id",
            F.concat(deref, F.lit("."), F.col("c_name")).alias("hint_full"),
        )
        .distinct()
    )


def type_hint_call_linker(nodes: DataFrame, edges: DataFrame,
                          existing_call_edges: DataFrame,
                          recovered: DataFrame | None = None) -> DataFrame:
    """CALL edges from recovered dynamic type hints.

    Reference ``XTypeHintCallLinker.scala:22-90``: for calls that no other
    linker resolved, materialize CALL edges to methods whose full_name
    matches a hint. The method dim broadcasts; unresolved-call filtering is
    an anti-join on the already-linked call ids."""
    hints = dynamic_type_hints(nodes, edges, recovered)
    # a call linked only to an external stub still counts as unresolved —
    # XTypeHintCallLinker.calls requires callee.isEmpty of *real* methods
    internal_m = nodes.filter(
        (F.col("kind") == "METHOD") & (~F.col("is_external"))
    ).select(F.col("node_id").alias("dst"))
    linked = (
        existing_call_edges.join(internal_m, "dst")
        .select(F.col("src").alias("call_id")).distinct()
    )
    unresolved = hints.join(linked, "call_id", "left_anti")
    # internal methods only: a hint that matches nothing but an auto-created
    # external stub is noise from the declared-type lattice (e.g. Object.f) —
    # the prefer-internal pruning DynamicCallLinker applies (:187-196)
    methods = nodes.filter(
        (F.col("kind") == "METHOD") & (~F.col("is_external"))
    ).select(
        F.col("full_name").alias("hint_full"), F.col("node_id").alias("m_id")
    )
    return (
        unresolved.join(F.broadcast(methods), "hint_full")
        .select(
            F.col("call_id").alias("src"), F.col("m_id").alias("dst"),
            F.lit("CALL").alias("kind"), F.lit("").alias("variable"),
            "doc_id", "method_id",
        )
        .distinct()
    )


def field_access_linker(nodes: DataFrame, edges: DataFrame,
                        recovered: DataFrame | None = None) -> DataFrame:
    """REF edges: fieldAccess CALL → MEMBER (composite-key equi-join)."""
    if recovered is None:
        recovered = type_recovery_pass(nodes)
    fa = nodes.filter(
        (F.col("kind") == "CALL") & F.col("name").isin(_FIELD_ACCESS_OPS)
    ).select(F.col("node_id").alias("fa_id"), "doc_id", "method_id")

    args = edges.filter(F.col("kind") == "ARGUMENT").select(
        F.col("src").alias("fa_id"), F.col("dst").alias("arg_id")
    )
    receivers = nodes.filter(
        (F.col("kind") == "IDENTIFIER") & (F.col("argument_index") == 1)
    ).select(F.col("node_id").alias("arg_id"))
    # dereference normalization on the key (Dereference.scala:22-29):
    # C receivers are spelled "struct node *" but TYPE_DECLs "struct node"
    deref = F.trim(F.regexp_replace(F.col("recovered_type"), r"\*", ""))
    recv_type = (
        fa.join(args, "fa_id").join(receivers, "arg_id")
        .join(recovered.withColumnRenamed("node_id", "arg_id"), "arg_id")
        .select("fa_id", "doc_id", "method_id", deref.alias("recv_type"))
    )

    fields = nodes.filter(F.col("kind") == "FIELD_IDENTIFIER").select(
        F.col("parent_id").alias("fa_id"), F.col("name").alias("f_name")
    )
    classes = nodes.filter(F.col("kind") == "TYPE_DECL").select(
        F.col("node_id").alias("c_id"), F.col("full_name").alias("c_full")
    )
    members = (
        nodes.filter(F.col("kind") == "MEMBER")
        .join(F.broadcast(classes), F.col("parent_id") == F.col("c_id"))
        .select(F.col("node_id").alias("mem_id"), F.col("c_full").alias("recv_type"),
                F.col("name").alias("f_name"))
    )
    return (
        recv_type.join(fields, "fa_id")
        .join(F.broadcast(members), ["recv_type", "f_name"])
        .select(
            F.col("fa_id").alias("src"), F.col("mem_id").alias("dst"),
            F.lit("REF").alias("kind"), F.lit("").alias("variable"),
            "doc_id", "method_id",
        )
        .distinct()
    )
