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


def type_recovery_pass(nodes: DataFrame, iterations: int = ITERATIONS) -> DataFrame:
    """→ (node_id, recovered_type) for identifiers."""
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
    for _ in range(max(0, iterations - 1)):
        # typed RHS identifiers propagate to the assignment target
        rhs_ident = (
            assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                         & (kids["argument_index"] == 2)
                         & (kids["kind"] == "IDENTIFIER"))
            .select("a_id", F.col("node_id").alias("r_id"))
            .join(rec.withColumnRenamed("node_id", "r_id"), "r_id")
            .select("a_id", F.col("recovered_type").alias("rhs_type"))
        )
        new_types = (
            targets.join(alloc_rhs.unionByName(rhs_ident), "a_id")
            .select(F.col("t_id").alias("node_id"),
                    F.col("rhs_type").alias("recovered_type"))
        )
        rec = rec.unionByName(new_types)

    # first hint wins deterministically: min type string per node
    return rec.groupBy("node_id").agg(F.min("recovered_type").alias("recovered_type"))


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
