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

from .dims import budgeted_broadcast

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
        .join(budgeted_broadcast(classes), F.col("parent_id") == F.col("c_id"))
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
        .join(budgeted_broadcast(classes), F.col("m_parent") == F.col("c_id"))
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
        .join(budgeted_broadcast(method_ret), "callee_full")
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
            .join(budgeted_broadcast(members), ["recv_type", "f_name"])
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


# ---------------------------------------------------------------------------
# In-kernel (per-method, Python) mirror of type_recovery_events.
#
# Rationale (round-3 scaling work): the DataFrame implementation above is a
# ~30-stage join DAG re-scanning the cached parse output ~12 times; profiled
# at 14 s (8 cores) -> 33 s (32 cores) — the pipeline's worst anti-scaling
# stage. Every join keys on ids within one method except three
# vocabulary-sized dimensions (method return types, members, class names),
# which ship as broadcast dicts — the same pattern as the fused kernel's
# internal-name dictionary. The DF implementation stays as the over-budget
# fallback and the parity oracle (tests/test_fused_recovery.py asserts exact
# event-set equality between the two).
# ---------------------------------------------------------------------------

RECOVERY_DICT_BUDGET = 2_000_000  # rows across all dictionaries


def collect_recovery_dicts(nodes: DataFrame, budget: int = RECOVERY_DICT_BUDGET,
                           with_counts: bool = False):
    """Collect the vocabulary-sized global dictionaries the fused kernel
    needs, in ONE Spark job. Returns (internal_names, ret_types, members,
    class_by_id) or None when the union exceeds ``budget`` rows (caller
    falls back to the DataFrame implementation).

    - internal_names: set of internal METHOD full_names (EdgeValidator dim)
    - ret_types: method full_name -> tuple of METHOD_RETURN types (non-ANY)
    - members:   (class full_name, member name) -> tuple of member types
    - class_by_id: TYPE_DECL node_id -> full_name (only decls that parent a
      METHOD — the `this` rule's lookup set; empty for C corpora)
    Ids travel as strings end-to-end (never through pandas float64).

    With ``with_counts=True`` the same single job also returns per-kind node
    counts (appended as ``tag='n'`` rows) as a 5th element — the pipeline's
    input to the run-wide broadcast-budget decision (``dims.dim_fits_hint``),
    so no dim join pays its own probe job on the hot path.
    """
    methods = nodes.filter(F.col("kind") == "METHOD").select(
        F.col("node_id").alias("mm_id"), F.col("full_name").alias("mm_full"),
        F.col("parent_id").alias("m_parent"), F.col("is_external").alias("m_ext"),
    )
    name_rows = methods.filter(~F.col("m_ext")).select(
        F.lit("name").alias("tag"), F.col("mm_full").alias("a"),
        F.lit("").alias("b"), F.lit("").alias("c"),
    ).distinct()
    rets = nodes.filter(
        (F.col("kind") == "METHOD_RETURN")
        & F.col("type_full_name").isNotNull() & (F.col("type_full_name") != "")
        & (F.col("type_full_name") != "ANY")
    ).select(F.col("method_id").alias("mm_id"),
             F.col("type_full_name").alias("ret_type"))
    ret_rows = methods.join(rets, "mm_id").select(
        F.lit("ret").alias("tag"), F.col("mm_full").alias("a"),
        F.col("ret_type").alias("b"), F.lit("").alias("c"),
    ).distinct()

    classes = nodes.filter(F.col("kind") == "TYPE_DECL").select(
        F.col("node_id").alias("c_id"), F.col("full_name").alias("c_full")
    )
    member_rows = (
        nodes.filter(
            (F.col("kind") == "MEMBER")
            & F.col("type_full_name").isNotNull() & (F.col("type_full_name") != "")
        )
        .join(classes, F.col("parent_id") == F.col("c_id"))
        .select(F.lit("member").alias("tag"), F.col("c_full").alias("a"),
                F.col("name").alias("b"), F.col("type_full_name").alias("c"))
        .distinct()
    )

    method_parents = methods.select(F.col("m_parent").alias("c_id")).distinct()
    class_rows = (
        classes.join(method_parents, "c_id", "left_semi")
        .select(F.lit("class").alias("tag"),
                F.col("c_id").cast("string").alias("a"),
                F.col("c_full").alias("b"), F.lit("").alias("c"))
    )

    union = (
        name_rows.unionByName(ret_rows).unionByName(member_rows)
        .unionByName(class_rows)
        .limit(budget + 1)
    )
    if with_counts:
        kind_counts = nodes.groupBy("kind").count().select(
            F.lit("n").alias("tag"), F.col("kind").alias("a"),
            F.col("count").cast("string").alias("b"), F.lit("").alias("c"))
        union = union.unionByName(kind_counts)
    pdf = union.toPandas()
    counts: dict[str, int] = {}
    if with_counts:
        mask = pdf["tag"] == "n"
        counts = {a: int(b) for a, b in zip(pdf["a"][mask], pdf["b"][mask])}
        pdf = pdf[~mask]
    if len(pdf) > budget:
        return None
    internal_names: set[str] = set()
    ret_types: dict[str, set] = {}
    members: dict[tuple, set] = {}
    class_by_id: dict[int, str] = {}
    for tag, a, b, c in zip(pdf["tag"], pdf["a"], pdf["b"], pdf["c"]):
        if tag == "name":
            internal_names.add(a)
        elif tag == "ret":
            ret_types.setdefault(a, set()).add(b)
        elif tag == "member":
            members.setdefault((a, b), set()).add(c)
        else:
            class_by_id[int(a)] = b
    out = (
        internal_names,
        {k: tuple(sorted(v)) for k, v in ret_types.items()},
        {k: tuple(sorted(v)) for k, v in members.items()},
        class_by_id,
    )
    return out + (counts,) if with_counts else out


def _str_or_none(v):
    """pandas record values: None/NaN -> None (NaN is truthy!)."""
    return v if isinstance(v, str) else None


def recover_types_for_method(rows: list[dict], ret_types: dict, members: dict,
                             class_by_id: dict,
                             iterations: int = ITERATIONS) -> list[tuple[int, str]]:
    """Exact per-method mirror of ``type_recovery_events``: returns the sorted
    distinct (identifier node_id, recovered_type) events for one method's
    rows. Rules and round structure match the DataFrame version line-for-line
    (declared types, `this`, then ``iterations-1`` assignment-propagation
    rounds with variable-level hint distribution)."""
    idents = [r for r in rows if r["kind"] == "IDENTIFIER"]
    if not idents:
        return []
    rec: list[tuple[int, str]] = []

    # round 0a: declared variable types (dropDuplicates analog: deterministic
    # min when a (method, name) is multiply declared)
    decl: dict[str, str] = {}
    for r in rows:
        if r["kind"] in ("LOCAL", "METHOD_PARAMETER_IN"):
            t = _str_or_none(r.get("type_full_name"))
            if t:
                prev = decl.get(r["name"])
                decl[r["name"]] = t if prev is None else min(prev, t)
    for i in idents:
        t = decl.get(i["name"])
        if t:
            rec.append((i["node_id"], t))

    # round 0b: `this` -> enclosing class
    meth = next((r for r in rows if r["kind"] == "METHOD"), None)
    cls = class_by_id.get(meth["parent_id"]) if meth is not None else None
    if cls:
        for i in idents:
            if i["name"] == "this":
                rec.append((i["node_id"], cls))

    # assignment machinery (computed once, like the DF version)
    kids_by_parent: dict[int, list[dict]] = {}
    for r in rows:
        if r.get("argument_index") is not None:
            kids_by_parent.setdefault(r["parent_id"], []).append(r)
    fa_ids = {r["node_id"] for r in rows
              if r["kind"] == "CALL"
              and _str_or_none(r.get("name")) in _FIELD_ACCESS_OPS}
    fa_recv: dict[int, list[int]] = {}
    fa_fields: dict[int, list[str]] = {}
    for r in rows:
        p = r.get("parent_id")
        if p in fa_ids:
            if r["kind"] == "IDENTIFIER" and r.get("argument_index") == 1:
                fa_recv.setdefault(p, []).append(r["node_id"])
            elif r["kind"] == "FIELD_IDENTIFIER":
                fa_fields.setdefault(p, []).append(r["name"])

    targets: list[tuple[int, int]] = []       # (a_id, target ident node)
    rhs_static: dict[int, set] = {}           # a_id -> typed-RHS types
    rhs_ident_ids: dict[int, list[dict]] = {}  # a_id -> arg2 identifier rows
    rhs_fa_ids: dict[int, list[int]] = {}     # a_id -> arg2 fieldAccess calls
    for r in rows:
        if r["kind"] == "CALL" and r.get("name") == "<operator>.assignment":
            a_id = r["node_id"]
            for k in kids_by_parent.get(a_id, ()):
                ai = k.get("argument_index")
                if ai == 1 and k["kind"] == "IDENTIFIER":
                    targets.append((a_id, k["node_id"]))
                elif ai == 2 and k["kind"] == "CALL":
                    tfn = _str_or_none(k.get("type_full_name"))
                    if tfn:
                        rhs_static.setdefault(a_id, set()).add(tfn)
                    nm = _str_or_none(k.get("name")) or ""
                    if not nm.startswith("<operator>"):
                        for rt in ret_types.get(
                                _str_or_none(k.get("full_name")) or "", ()):
                            rhs_static.setdefault(a_id, set()).add(rt)
                    if nm in _FIELD_ACCESS_OPS:
                        rhs_fa_ids.setdefault(a_id, []).append(k["node_id"])
                elif ai == 2 and k["kind"] == "IDENTIFIER":
                    rhs_ident_ids.setdefault(a_id, []).append(k)

    ident_names = {i["node_id"]: i["name"] for i in idents}

    def distribute() -> dict[str, set]:
        hints: dict[str, set] = {}
        for nid, t in rec:
            nm = ident_names.get(nid)
            if nm is not None:
                hints.setdefault(nm, set()).add(t)
        return hints

    for _ in range(max(0, iterations - 1)):
        var_hints = distribute()
        # member-load RHS: fa call result types via recovered receiver
        fa_types: dict[int, set] = {}
        for fa in fa_ids:
            fnames = fa_fields.get(fa)
            if not fnames:
                continue
            for rid in fa_recv.get(fa, ()):
                nm = ident_names.get(rid)
                if nm is None:
                    continue
                for t in var_hints.get(nm, ()):
                    rt = t.replace("*", "").strip()
                    for f in fnames:
                        for mt in members.get((rt, f), ()):
                            fa_types.setdefault(fa, set()).add(mt)
        new: list[tuple[int, str]] = []
        for a_id, t_id in targets:
            rhs = set(rhs_static.get(a_id, ()))
            for k in rhs_ident_ids.get(a_id, ()):
                rhs |= var_hints.get(k["name"], set())
            for fid in rhs_fa_ids.get(a_id, ()):
                rhs |= fa_types.get(fid, set())
            for t in rhs:
                new.append((t_id, t))
        rec.extend(new)

    var_hints = distribute()
    out = set()
    for i in idents:
        for t in var_hints.get(i["name"], ()):
            out.add((i["node_id"], t))
    return sorted(out)


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


def _method_ref_candidates(nodes: DataFrame) -> DataFrame:
    """Function-pointer call candidates: ``fp = someFunc; fp(...)`` links the
    call on ``fp`` to ``someFunc``.

    Reference: XTypeRecovery's identifier-assigned-METHOD_REF rule feeding
    ``XTypeHintCallLinker.scala:22-90`` (a variable holding a method ref
    types calls through that variable with the ref's full name). Scoped
    per-method on (method_id, var name) — a ref assigned in one function
    never links calls in another; both join dims (method-ref assignments,
    internal methods) are vocabulary-sized and broadcast under budget."""
    assigns = nodes.filter(
        (F.col("kind") == "CALL") & (F.col("name") == "<operator>.assignment")
    ).select(F.col("node_id").alias("a_id"))
    kids = nodes.filter(F.col("argument_index").isNotNull()).select(
        "node_id", "parent_id", "argument_index", "kind", "name",
        "full_name", "method_id",
    )
    lhs = (
        assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                     & (kids["argument_index"] == 1)
                     & (kids["kind"] == "IDENTIFIER"))
        .select("a_id", F.col("method_id").alias("v_mid"),
                F.col("name").alias("v_name"))
    )
    rhs = (
        assigns.join(kids, (F.col("a_id") == kids["parent_id"])
                     & (kids["argument_index"] == 2)
                     & (kids["kind"] == "METHOD_REF"))
        .select("a_id", F.col("full_name").alias("ref_full"))
    )
    var_refs = lhs.join(rhs, "a_id").select("v_mid", "v_name", "ref_full") \
        .distinct()
    methods = nodes.filter(
        (F.col("kind") == "METHOD") & (~F.col("is_external"))
    ).select(F.col("full_name").alias("ref_full"), F.col("node_id").alias("m_id"))
    calls = nodes.filter(F.col("kind") == "CALL").select(
        F.col("node_id").alias("src"), F.col("name").alias("c_name"),
        "method_id", "doc_id",
    )
    return (
        calls.join(budgeted_broadcast(var_refs),
                   (calls["method_id"] == F.col("v_mid"))
                   & (calls["c_name"] == F.col("v_name")))
        .join(budgeted_broadcast(methods), "ref_full")
        .select(
            "src", F.col("m_id").alias("dst"), "doc_id", "method_id",
            F.lit(False).alias("m_external"),
        )
        .distinct()
    )


def _hint_candidates(nodes: DataFrame, edges: DataFrame,
                     recovered: DataFrame | None = None) -> DataFrame:
    """Hint-link candidate rows (src, dst, doc_id, method_id, m_external) for
    EVERY hinted dynamic call — internal methods only, so ``m_external`` is
    constant false; the "no other linker resolved it" condition is applied by
    the caller (``link_calls`` arbitration window or
    ``type_hint_call_linker``'s anti-join)."""
    hints = dynamic_type_hints(nodes, edges, recovered)
    # internal methods only: a hint that matches nothing but an auto-created
    # external stub is noise from the declared-type lattice (e.g. Object.f) —
    # the prefer-internal pruning DynamicCallLinker applies (:187-196)
    methods = nodes.filter(
        (F.col("kind") == "METHOD") & (~F.col("is_external"))
    ).select(
        F.col("full_name").alias("hint_full"), F.col("node_id").alias("m_id")
    )
    return (
        hints.join(budgeted_broadcast(methods), "hint_full")
        .select(
            F.col("call_id").alias("src"), F.col("m_id").alias("dst"),
            "doc_id", "method_id", F.lit(False).alias("m_external"),
        )
        .distinct()
        .unionByName(_method_ref_candidates(nodes))
    )


def type_hint_call_linker(nodes: DataFrame, edges: DataFrame,
                          existing_call_edges: DataFrame,
                          recovered: DataFrame | None = None) -> DataFrame:
    """CALL edges from recovered dynamic type hints.

    Reference ``XTypeHintCallLinker.scala:22-90``: for calls that no other
    linker resolved, materialize CALL edges to methods whose full_name
    matches a hint. The method dim broadcasts; unresolved-call filtering is
    an anti-join on the already-linked call ids."""
    candidates = _hint_candidates(nodes, edges, recovered)
    # a call linked only to an external stub still counts as unresolved —
    # XTypeHintCallLinker.calls requires callee.isEmpty of *real* methods
    internal_m = nodes.filter(
        (F.col("kind") == "METHOD") & (~F.col("is_external"))
    ).select(F.col("node_id").alias("dst"))
    linked = (
        existing_call_edges.join(internal_m, "dst")
        .select(F.col("src")).distinct()
    )
    return (
        candidates.join(linked, "src", "left_anti")
        .select(
            "src", "dst",
            F.lit("CALL").alias("kind"), F.lit("").alias("variable"),
            "doc_id", "method_id",
        )
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
        .join(budgeted_broadcast(classes), F.col("parent_id") == F.col("c_id"))
        .select(F.col("node_id").alias("mem_id"), F.col("c_full").alias("recv_type"),
                F.col("name").alias("f_name"))
    )
    return (
        recv_type.join(fields, "fa_id")
        .join(budgeted_broadcast(members), ["recv_type", "f_name"])
        .select(
            F.col("fa_id").alias("src"), F.col("mem_id").alias("dst"),
            F.lit("REF").alias("kind"), F.lit("").alias("variable"),
            "doc_id", "method_id",
        )
        .distinct()
    )
