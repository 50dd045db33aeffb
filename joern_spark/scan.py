"""Packaged query bundles → FINDING rows (joern-scan analog).

Reference: ``console/.../scan/package.scala:14-44`` (Query → NewFinding),
querydb bundle shape ``querydb/.../c/CopyLoops.scala:11-39`` /
``java/SQLInjection.scala:15-38``. A query here is (name, title, severity,
traversal function CpgQuery-in → DataFrame of matched node ids); running a
bundle unions per-query findings into one ``findings`` table.

Dangerous-function queries anchor on the CALL node's ``name`` rather than
``cpg.method(regex).callIn``: the two are equivalent here because every
named call gets a (possibly external-stub) METHOD and a CALL edge from the
linkers, and name-anchoring keeps the DuckDB oracle twin
(``cpg_oracles._SCAN_SQL``) join-free. Regexes are anchored (``^...$``)
to match the reference's full-match property-filter semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dataflow import reachable_by
from .query import Cpg
from .query.dsl import ARRAY_ACCESS_OPS, ASSIGNMENT_OPS

# bound for the per-start ancestor walks below; tree relations (AST,
# DOMINATE, POST_DOMINATE) have depth ~ statement count per method, and the
# DuckDB oracle twins recurse to fixpoint, so this is a safety valve, not a
# semantic bound (a method with >256 nested/sequenced statements is corrupt).
MAX_ANCESTOR_ROUNDS = 256


def _ancestor_pairs(edges: DataFrame, kind: str, starts: DataFrame) -> DataFrame:
    """(start_id, anc_id) transitive pairs walking ``kind`` edges backward
    (dst → src) from ``starts(node_id)``; excludes the trivial self pair.

    Per-start pairing that the DSL's frontier closure (which merges all
    sources into one visited set) cannot provide — needed whenever a query
    asks "is THIS call dominated by / inside ...". All three edge kinds used
    here are trees (AST parent, idom, ipdom), so the pair count is
    |starts| × depth, never quadratic in the graph.
    """
    e = edges.filter(F.col("kind") == kind).select(
        F.col("dst").alias("node_id"), F.col("src").alias("anc"))
    frontier = starts.select(F.col("node_id").alias("start_id"),
                             F.col("node_id")).localCheckpoint(eager=True)
    out = None
    for _ in range(MAX_ANCESTOR_ROUNDS):
        frontier = (
            frontier.join(e, "node_id")
            .select("start_id", F.col("anc").alias("node_id"))
            .distinct().localCheckpoint(eager=True)
        )
        if frontier.limit(1).count() == 0:
            break
        out = frontier if out is None else out.unionByName(frontier)
    if out is None:
        out = frontier.limit(0)
    return out.select("start_id", F.col("node_id").alias("anc_id")).distinct()


def _decl_types(cpg: Cpg) -> DataFrame:
    """(method_id, name) → declared type from LOCAL / METHOD_PARAMETER_IN
    rows — the scan-side ``evalType`` analog (full inference lives in
    XTypeRecovery; scanners only need declaration types, matching the
    reference queries which run with ``NoResolve``)."""
    return (
        cpg.nodes.filter(F.col("kind").isin("LOCAL", "METHOD_PARAMETER_IN"))
        .filter(F.col("type_full_name") != "")
        .groupBy("method_id", "name")
        .agg(F.min("type_full_name").alias("decl_type"))
    )


def _args(cpg: Cpg) -> DataFrame:
    """ARGUMENT edges joined to the argument node's properties."""
    a = cpg.edges.filter(F.col("kind") == "ARGUMENT").select(
        F.col("src").alias("call_id"), F.col("dst").alias("arg_id"))
    arg_nodes = cpg.nodes.select(
        F.col("node_id").alias("arg_id"), F.col("kind").alias("a_kind"),
        F.col("name").alias("a_name"), F.col("code").alias("a_code"),
        F.col("argument_index"), F.col("method_id").alias("a_mid"),
        F.col("type_full_name").alias("a_type"))
    return a.join(arg_nodes, "arg_id")


@dataclass(frozen=True)
class Query:
    name: str
    title: str
    severity: float
    run: Callable[[Cpg], DataFrame]  # → DataFrame with node_id column


def _malloc_to_free_missing(cpg: Cpg) -> DataFrame:
    """allocated-but-never-freed heuristic: malloc call sites in methods
    with no free() call (querydb resource-leak family)."""
    mallocs = cpg.call("^malloc$").to_df().select("node_id", "method_id")
    frees = cpg.call("^free$").to_df().select(F.col("method_id").alias("fm")).distinct()
    return mallocs.join(frees, mallocs["method_id"] == frees["fm"], "left_anti").select("node_id")


def _literal_argument_to_risky_sink(cpg: Cpg) -> DataFrame:
    """dataflow query: literals reaching printf-family sink arguments
    (format-string family; uses the reachableBy engine)."""
    sinks = cpg.call("^(printf|sprintf|fprintf)$").argument().ids()
    sources = cpg.literal().ids()
    hits = reachable_by(cpg.nodes, cpg.edges, sinks, sources)
    return hits.select(F.col("sink_id").alias("node_id")).distinct()


def _uncalled_internal_method(cpg: Cpg) -> DataFrame:
    """dead-code family: internal non-main methods with no incoming CALL."""
    methods = cpg.method().is_external(False).to_df().filter(
        ~F.col("name").rlike("^main")
    ).select("node_id")
    called = cpg.nodes.sparkSession.createDataFrame([], "node_id long")
    call_dsts = (
        cpg.edges.filter(F.col("kind") == "CALL").select(F.col("dst").alias("node_id")).distinct()
    )
    return methods.join(call_dsts, "node_id", "left_anti")


def _deep_nesting(cpg: Cpg, depth: int = 3) -> DataFrame:
    """complexity family: control structures nested >= depth deep."""
    cs = cpg.all().is_control_structure()
    cur = cs
    for _ in range(depth - 1):
        cur = cur.ast_minus_root().is_control_structure()
    return cur.ids()


def _call_to(name_regex: str) -> Callable[[Cpg], DataFrame]:
    """Dangerous-function family (querydb/c/DangerousFunctions.scala:13-330):
    every call site whose callee name matches."""
    def run(cpg: Cpg) -> DataFrame:
        return cpg.call(name_regex).ids()
    return run


def _format_controlled_printf(cpg: Cpg) -> DataFrame:
    """printf with non-literal format (arg 1), sprintf/vsprintf with
    non-literal format (arg 2) — DangerousFunctions.scala:56-77
    (``argvUsedInPrintf``: ``whereNot(_.argument.order(n).isLiteral)``)."""
    args = _args(cpg)
    lit1 = args.filter((F.col("argument_index") == 1)
                       & (F.col("a_kind") == "LITERAL")).select("call_id")
    lit2 = args.filter((F.col("argument_index") == 2)
                       & (F.col("a_kind") == "LITERAL")).select("call_id")
    printf = cpg.call("(?i)^printf$").ids().withColumnRenamed("node_id", "call_id") \
        .join(lit1, "call_id", "left_anti")
    sprintf = cpg.call("(?i)^(sprintf|vsprintf)$").ids() \
        .withColumnRenamed("node_id", "call_id") \
        .join(lit2, "call_id", "left_anti")
    return printf.unionByName(sprintf).select(F.col("call_id").alias("node_id"))


def _signed_left_shift(cpg: Cpg) -> DataFrame:
    """<<  /  <<=  with a signed int/long left operand, unless both operands
    are literals (SignedLeftShift.scala:23-28). Operand type = literal's own
    type or the identifier's declaration type."""
    shifts = cpg.nodes.filter(
        (F.col("kind") == "CALL")
        & F.col("name").isin("<operator>.shiftLeft",
                             "<operator>.assignmentShiftLeft")
    ).select(F.col("node_id").alias("call_id"))
    args = _args(cpg).join(shifts, "call_id")
    decl = _decl_types(cpg)
    a1 = args.filter(F.col("argument_index") == 1).join(
        decl,
        (args["a_mid"] == decl["method_id"]) & (args["a_name"] == decl["name"]),
        "left",
    ).withColumn(
        "t1",
        F.when(F.col("a_kind") == "LITERAL", F.col("a_type"))
         .otherwise(F.col("decl_type")),
    ).filter(F.col("t1").isin("int", "long")).select("call_id")
    both_lit = (
        args.filter(F.col("argument_index").isin(1, 2))
        .groupBy("call_id")
        .agg(F.sum(F.when(F.col("a_kind") == "LITERAL", 1).otherwise(0)).alias("nlit"))
        .filter(F.col("nlit") == 2).select("call_id")
    )
    return a1.join(both_lit, "call_id", "left_anti") \
        .select(F.col("call_id").alias("node_id")).distinct()


def _strlen_truncation(cpg: Cpg) -> DataFrame:
    """strlen result assigned to an int-typed target
    (IntegerTruncations.scala:28-35: ``strlen.callIn.inAssignment.target
    .evalType("(g?)int")``; size_t → int truncates on 64-bit)."""
    args = _args(cpg)
    strlen_calls = cpg.call("(?i)^strlen$").ids()
    asn = cpg.nodes.filter(F.col("name").isin(ASSIGNMENT_OPS)) \
        .select(F.col("node_id").alias("call_id"))
    enclosing = args.join(strlen_calls,
                          args["arg_id"] == strlen_calls["node_id"]) \
        .select("call_id").join(asn, "call_id")
    targets = args.join(enclosing, "call_id").filter(
        (F.col("argument_index") == 1) & (F.col("a_kind") == "IDENTIFIER"))
    decl = _decl_types(cpg)
    return targets.join(
        decl,
        (targets["a_mid"] == decl["method_id"]) & (targets["a_name"] == decl["name"]),
    ).filter(F.col("decl_type").rlike("^(g?)int$")) \
        .select(F.col("arg_id").alias("node_id")).distinct()


def _not_dominated_by(cpg: Cpg, call_regex: str, guard_regex: str) -> DataFrame:
    """Calls matching ``call_regex`` with no ``guard_regex`` call among their
    strict dominators (CredentialDrop.scala:26-31/70-75:
    ``whereNot(_.dominatedBy.isCall.name(...))``)."""
    starts = cpg.call(call_regex).ids()
    dom = _ancestor_pairs(cpg.edges, "DOMINATE", starts)
    guards = cpg.call(guard_regex).ids().withColumnRenamed("node_id", "anc_id")
    guarded = dom.join(guards, "anc_id").select(
        F.col("start_id").alias("node_id")).distinct()
    return starts.join(guarded, "node_id", "left_anti")


def _return_value_not_checked(cpg: Cpg, call_regex: str) -> DataFrame:
    """``returnValueNotChecked`` (QueryLangExtensions.scala:11-27): calls
    whose result is (a) not compared inside an enclosing condition, (b) whose
    assignment target never appears in any condition of the method, and
    (c) not directly returned. Used by RetvalChecks.scala:12-27
    (read/recv/malloc) and SocketApi.scala:14-31 (send)."""
    calls = cpg.call(call_regex).to_df().select(
        "node_id", F.col("code").alias("c_code"),
        F.col("method_id").alias("c_mid"))
    starts = calls.select("node_id")
    anc = _ancestor_pairs(cpg.edges, "AST", starts)
    # (a) an AST ancestor is a control structure whose condition's code
    # contains the call's code
    cond = cpg.edges.filter(F.col("kind") == "CONDITION").select(
        F.col("src").alias("anc_id"), F.col("dst").alias("cond_id"))
    cond_code = cpg.nodes.select(F.col("node_id").alias("cond_id"),
                                 F.col("code").alias("cond_code"))
    direct = (
        anc.join(cond, "anc_id").join(cond_code, "cond_id")
        .join(calls, anc["start_id"] == calls["node_id"])
        .filter(F.col("cond_code").contains(F.col("c_code")))
        .select(F.col("start_id").alias("node_id")).distinct()
    )
    # (c) directly returned
    anc_kind = cpg.nodes.select(F.col("node_id").alias("anc_id"),
                                F.col("kind").alias("anc_kind"))
    in_ret = (anc.join(anc_kind, "anc_id")
              .filter(F.col("anc_kind") == "RETURN")
              .select(F.col("start_id").alias("node_id")).distinct())
    # (b) the assignment target's code appears among the method's condition
    # subtrees (identifier names ∪ call codes — the reference's checkedVars)
    args = _args(cpg)
    asn = cpg.nodes.filter(F.col("name").isin(list(ASSIGNMENT_OPS))).select(
        F.col("node_id").alias("call_id"))
    rhs = args.join(asn, "call_id").filter(F.col("argument_index") == 2).select(
        "call_id", F.col("arg_id").alias("rhs_id"))
    tgt = args.filter(F.col("argument_index") == 1).select(
        F.col("call_id").alias("t_call"), F.col("a_code").alias("t_code"))
    call_tgt = (rhs.join(calls, rhs["rhs_id"] == calls["node_id"])
                .join(tgt, F.col("call_id") == F.col("t_call"))
                .select("node_id", "t_code", "c_mid"))
    mids = calls.select(F.col("c_mid").alias("method_id")).distinct()
    cand = cpg.nodes.join(mids, "method_id").filter(
        F.col("kind").isin("IDENTIFIER", "CALL")).select(
        "node_id", "method_id", "kind", "name", "code")
    anc2 = _ancestor_pairs(cpg.edges, "AST", cand.select("node_id"))
    cond_roots = cpg.edges.filter(F.col("kind") == "CONDITION").select(
        F.col("dst").alias("anc_id"))
    in_cond = (
        anc2.join(cond_roots, "anc_id")
        .select(F.col("start_id").alias("node_id"))
        .unionByName(cand.select("node_id").join(
            cond_roots.withColumnRenamed("anc_id", "node_id"), "node_id"))
        .distinct()
    )
    checked = (cand.join(in_cond, "node_id")
               .select("method_id",
                       F.when(F.col("kind") == "IDENTIFIER", F.col("name"))
                       .otherwise(F.col("code")).alias("chk_code"))
               .distinct())
    tgt_checked = (
        call_tgt.join(checked,
                      (call_tgt["c_mid"] == checked["method_id"])
                      & (call_tgt["t_code"] == checked["chk_code"]))
        .select(call_tgt["node_id"]).distinct()
    )
    return (starts.join(direct, "node_id", "left_anti")
            .join(in_ret, "node_id", "left_anti")
            .join(tgt_checked, "node_id", "left_anti"))


def _unchecked_read_recv_malloc(cpg: Cpg) -> DataFrame:
    return _return_value_not_checked(cpg, "(?i)^(read|recv|malloc)$")


def _socket_send(cpg: Cpg) -> DataFrame:
    return _return_value_not_checked(cpg, "(?i)^send$")


# FileOpRace.scala:28-58 — path argument positions per file operation
_FILE_OPS = {
    "access": [1], "chdir": [1], "chmod": [1], "chown": [1], "creat": [1],
    "faccessat": [2], "fchmodat": [2], "fopen": [1], "fstatat": [2],
    "lchown": [1], "linkat": [2, 4], "link": [1, 2], "lstat": [1],
    "mkdirat": [2], "mkdir": [1], "mkfifoat": [2], "mkfifo": [1],
    "mknodat": [2], "mknod": [1], "openat": [2], "open": [1],
    "readlinkat": [2], "readlink": [1], "renameat": [2, 4],
    "rename": [1, 2], "rmdir": [1], "stat": [1], "unlinkat": [2],
    "unlink": [1],
}


def _file_operation_race(cpg: Cpg) -> DataFrame:
    """FileOpRace.scala:13-72: two file operations in one method share a
    non-literal path argument (TOCTOU race)."""
    spark = cpg.nodes.sparkSession
    ops = spark.createDataFrame(
        [(k, i) for k, v in _FILE_OPS.items() for i in v],
        "op_name string, op_idx int")
    calls = cpg.nodes.filter(F.col("kind") == "CALL").select(
        "node_id", "name", "method_id")
    args = _args(cpg)
    fo = (calls.join(F.broadcast(ops), calls["name"] == ops["op_name"])
          .join(args, calls["node_id"] == args["call_id"])
          .filter((F.col("argument_index") == F.col("op_idx"))
                  & (F.col("a_kind") != "LITERAL"))
          .select("node_id", "method_id", "a_code"))
    other = fo.select(F.col("node_id").alias("o_id"),
                      F.col("method_id").alias("o_mid"),
                      F.col("a_code").alias("o_code"))
    return (fo.join(other, (fo["method_id"] == other["o_mid"])
                    & (fo["a_code"] == other["o_code"])
                    & (fo["node_id"] != other["o_id"]))
            .select("node_id").distinct())


def _call_to_exec(cpg: Cpg) -> DataFrame:
    """java/DangerousFunctions.scala:12-27: Runtime.exec call sites (full
    name — the mini-frontends key dynamic calls by simple class names)."""
    return cpg.nodes.filter(
        (F.col("kind") == "CALL")
        & F.col("full_name").rlike(r"^(java\.lang\.)?Runtime\.exec$")
    ).select("node_id")


def _setuid_without_setgid(cpg: Cpg) -> DataFrame:
    return _not_dominated_by(cpg, "(?i)^set(res|re|e|)uid$",
                             "(?i)^set(res|re|e|)?gid$")


def _setgid_without_setgroups(cpg: Cpg) -> DataFrame:
    return _not_dominated_by(cpg, "(?i)^set(res|re|e|)gid$", "^setgroups$")


def _copy_loop(cpg: Cpg) -> DataFrame:
    """Array write whose subscript is incremented by an enclosing for loop
    (CopyLoops.scala:23-38): for assignment-target array accesses, intersect
    the subscript codes with the assignment-target codes of the enclosing
    FOR's non-block AST children. Finding node = the array expression."""
    args = _args(cpg)
    asn = cpg.nodes.filter(F.col("name").isin(ASSIGNMENT_OPS)) \
        .select(F.col("node_id").alias("call_id"))
    # array accesses in assignment-target position
    acc = args.join(asn, "call_id").filter(
        (F.col("argument_index") == 1) & (F.col("a_kind") == "CALL")
        & F.col("a_name").isin(ARRAY_ACCESS_OPS)
    ).select(F.col("arg_id").alias("access_id"))
    parts = args.withColumnRenamed("call_id", "access_id").join(acc, "access_id")
    arrays = parts.filter(F.col("argument_index") == 1).select(
        "access_id", F.col("arg_id").alias("array_id"))
    subs = parts.filter(F.col("argument_index") == 2).select(
        "access_id", F.col("a_code").alias("sub_code"))
    # enclosing FOR ancestors of each access
    fors = cpg.nodes.filter(
        (F.col("kind") == "CONTROL_STRUCTURE") & (F.col("ctrl_type") == "FOR")
    ).select(F.col("node_id").alias("anc_id"))
    enclosing_for = _ancestor_pairs(cpg.edges, "AST", acc.select(
        F.col("access_id").alias("node_id"))) \
        .join(fors, "anc_id") \
        .select(F.col("start_id").alias("access_id"), F.col("anc_id").alias("for_id"))
    # the FOR's non-block direct children, their AST subtrees' assignment targets
    ast = cpg.edges.filter(F.col("kind") == "AST").select("src", "dst")
    kids = enclosing_for.select("for_id").distinct().join(
        ast, F.col("for_id") == F.col("src")).select(
        "for_id", F.col("dst").alias("kid_id"))
    non_block = kids.join(
        cpg.nodes.filter(F.col("kind") != "BLOCK")
        .select(F.col("node_id").alias("kid_id")), "kid_id")
    # subtree closure: ancestor pairs seeded from every assignment node, kept
    # when a non-block for-kid is among the ancestors (or is the node itself)
    asn_nodes = cpg.nodes.filter(F.col("name").isin(ASSIGNMENT_OPS)) \
        .select("node_id")
    asn_anc = _ancestor_pairs(cpg.edges, "AST", asn_nodes) \
        .unionByName(asn_nodes.select(F.col("node_id").alias("start_id"),
                                      F.col("node_id").alias("anc_id")))
    asn_in_for = asn_anc.join(
        non_block, asn_anc["anc_id"] == non_block["kid_id"]) \
        .select(F.col("start_id").alias("call_id"), "for_id")
    # inc_for_id alias: inc_targets' for_id descends from enclosing_for's, so
    # an equality on the shared name resolves to the SAME attribute (Spark
    # plans a trivially-true predicate, i.e. a cross join across FOR loops)
    inc_targets = asn_in_for.join(args, "call_id").filter(
        F.col("argument_index") == 1).select(
        F.col("for_id").alias("inc_for_id"),
        F.col("a_code").alias("inc_code")).distinct()
    hits = (
        enclosing_for.join(subs, "access_id")
        .join(inc_targets,
              (F.col("for_id") == F.col("inc_for_id"))
              & (F.col("sub_code") == F.col("inc_code")))
        .select("access_id").distinct()
    )
    return hits.join(arrays, "access_id").select(
        F.col("array_id").alias("node_id")).distinct()


def _sql_injection(cpg: Cpg) -> DataFrame:
    """Parameters of request-handler methods (return type ModelAndView)
    reaching the first parameter of a ``query`` method
    (java/SQLInjection.scala:27-37)."""
    handler_methods = cpg.nodes.filter(
        (F.col("kind") == "METHOD_RETURN")
        & F.col("type_full_name").rlike("ModelAndView")
    ).select("method_id")
    sources = cpg.parameter().to_df().join(handler_methods, "method_id") \
        .select("node_id")
    query_methods = cpg.method("^query$").ids() \
        .withColumnRenamed("node_id", "method_id")
    sinks = cpg.parameter().order(1).to_df().join(query_methods, "method_id") \
        .select("node_id")
    hits = reachable_by(cpg.nodes, cpg.edges, sinks, sources)
    return hits.select(F.col("sink_id").alias("node_id")).distinct()


def _free_follows_value_reuse(cpg: Cpg) -> DataFrame:
    """Identifier used after being free'd on every path from the free, with
    no reassignment in between (UseAfterFree.scala:180-209
    ``freePostDominatesUsage``, modeled after CVE-2019-18903): uses that
    post-dominate the free call, minus reassignment targets of the same
    variable and everything post-dominated by such a reassignment.
    Reassignment = assignment-target position (the reference's broader
    ``inAssignment`` guard also excuses RHS appearances; target-only is the
    strictly-sound reading and what its code examples exercise)."""
    args = _args(cpg)
    one_arg = args.groupBy("call_id").agg(
        F.count("*").alias("n_args")).filter(F.col("n_args") == 1)
    frees = (
        cpg.call("^(.*_)?free$").to_df()
        .select(F.col("node_id").alias("call_id"))
        .join(one_arg.select("call_id"), "call_id")
        .join(args.filter((F.col("argument_index") == 1)
                          & (F.col("a_kind") == "IDENTIFIER")), "call_id")
        .select("call_id", F.col("a_code").alias("var_code"))
    )
    pdom = _ancestor_pairs(cpg.edges, "POST_DOMINATE",
                           frees.select(F.col("call_id").alias("node_id")))
    idents = cpg.nodes.filter(F.col("kind") == "IDENTIFIER").select(
        F.col("node_id").alias("anc_id"), F.col("code").alias("use_code"))
    uses = (
        pdom.join(frees, pdom["start_id"] == frees["call_id"])
        .join(idents, "anc_id")
        .filter(F.col("use_code") == F.col("var_code"))
        .select("start_id", F.col("anc_id").alias("use_id"))
    )
    asn = cpg.nodes.filter(F.col("name").isin(ASSIGNMENT_OPS)) \
        .select(F.col("node_id").alias("call_id"))
    reassign = uses.join(
        args.filter(F.col("argument_index") == 1).join(asn, "call_id")
        .select(F.col("arg_id").alias("use_id")),
        "use_id",
    )
    # excluded = the reassignment targets themselves + their post-dominators
    re_pdom = _ancestor_pairs(cpg.edges, "POST_DOMINATE", reassign.select(
        F.col("use_id").alias("node_id")))
    excluded = reassign.select("start_id", "use_id").unionByName(
        reassign.join(re_pdom, reassign["use_id"] == re_pdom["start_id"])
        .select(reassign["start_id"], F.col("anc_id").alias("use_id"))
    ).distinct()
    return uses.join(excluded, ["start_id", "use_id"], "left_anti") \
        .select(F.col("use_id").alias("node_id")).distinct()


DEFAULT_BUNDLE = [
    Query("malloc-without-free", "Allocation without matching free in method", 5.0,
          _malloc_to_free_missing),
    Query("literal-to-format-sink", "Literal flows into format-string sink", 4.0,
          _literal_argument_to_risky_sink),
    Query("uncalled-internal-method", "Internal method never called", 2.0,
          _uncalled_internal_method),
    Query("deeply-nested-control", "Control structures nested >= 3 deep", 1.0,
          _deep_nesting),
    # querydb/c/DangerousFunctions.scala (scores from the reference)
    Query("call-to-gets", "Dangerous function gets() used", 8.0,
          _call_to("(?i)^gets$")),
    Query("call-to-scanf", "Insecure function scanf() used", 4.0,
          _call_to("(?i)^scanf$")),
    Query("call-to-strcat", "Dangerous functions strcat/strncat used", 4.0,
          _call_to("(?i)^(strcat|strncat)$")),
    Query("call-to-strcpy", "Dangerous functions strcpy/strncpy used", 4.0,
          _call_to("(?i)^(strcpy|strncpy)$")),
    Query("call-to-strtok", "Dangerous function strtok() used", 4.0,
          _call_to("(?i)^strtok$")),
    Query("call-to-getwd", "Dangerous function getwd() used", 4.0,
          _call_to("(?i)^getwd$")),
    Query("format-controlled-printf",
          "Non-constant format string passed to printf/sprintf/vsprintf", 4.0,
          _format_controlled_printf),
    # querydb/c/SignedLeftShift.scala
    Query("signed-left-shift", "Signed shift may cause undefined behavior", 2.0,
          _signed_left_shift),
    # querydb/c/IntegerTruncations.scala
    Query("strlen-truncation", "Truncation in strlen-to-int assignment", 2.0,
          _strlen_truncation),
    # querydb/c/CredentialDrop.scala
    Query("setuid-without-setgid",
          "Process user ID changed without dropping group privileges first", 2.0,
          _setuid_without_setgid),
    Query("setgid-without-setgroups",
          "Group ID changed without dropping ancillary groups first", 2.0,
          _setgid_without_setgroups),
    # querydb/c/CopyLoops.scala
    Query("copy-loop", "Copy loop detected", 2.0, _copy_loop),
    # querydb/java/SQLInjection.scala
    Query("sql-injection",
          "A parameter is used in an insecure database API call", 5.0,
          _sql_injection),
    # querydb/c/UseAfterFree.scala (freePostDominatesUsage)
    Query("free-follows-value-reuse",
          "A value that is free'd is reused without reassignment", 5.0,
          _free_follows_value_reuse),
    # querydb/c/RetvalChecks.scala
    Query("unchecked-read-recv-malloc",
          "Return value of read/recv/malloc is never checked", 3.0,
          _unchecked_read_recv_malloc),
    # querydb/c/SocketApi.scala
    Query("socket-send", "Unchecked call to send", 2.0, _socket_send),
    # querydb/c/FileOpRace.scala
    Query("file-operation-race",
          "Two file operations on the same path can act on different files",
          3.0, _file_operation_race),
    # querydb/java/DangerousFunctions.scala
    Query("call-to-exec", "Dangerous function Runtime.exec used", 8.0,
          _call_to_exec),
]


def run_scan(nodes: DataFrame, edges: DataFrame,
             bundle: list[Query] | None = None) -> DataFrame:
    """→ findings(name, title, severity, node_id, doc_id, code)."""
    cpg = Cpg(nodes=nodes, edges=edges)
    out: DataFrame | None = None
    meta = nodes.select("node_id", "doc_id", "code")
    for q in bundle or DEFAULT_BUNDLE:
        ids = q.run(cpg).select("node_id").distinct()
        f = ids.join(meta, "node_id").select(
            F.lit(q.name).alias("name"), F.lit(q.title).alias("title"),
            F.lit(q.severity).alias("severity"), "node_id", "doc_id", "code",
        )
        out = f if out is None else out.unionByName(f)
    return out
