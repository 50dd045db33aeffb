"""Call-graph construction: static linking, CHA dynamic dispatch, naive fallback.

Reference passes (SURVEY.md §2.A #21-24):
- StaticCallLinker (``x2cpg/.../callgraph/StaticCallLinker.scala:11-47``):
  STATIC_DISPATCH/INLINED calls joined to methods on full_name (+ signature
  when the call carries one). This is the hot join — callee names like
  ``printf``/``malloc`` are heavily skewed, so the METHOD dimension is
  broadcast (map-side join: no shuffle of the skewed fact side at all); if the
  dimension outgrew the broadcast threshold the fallback is AQE skew-join
  (enabled in session conf).
- DynamicCallLinker (``DynamicCallLinker.scala:25-229``): CHA/SAFEDISPATCH —
  resolve each DYNAMIC_DISPATCH call ``T.m`` against every implementor of
  ``m`` in the subclass closure of ``T``, with super-class fallback and
  internal-preferred pruning. The inheritance transitive closure is a bounded
  iterative self-join (class-hierarchy depth iterations).
- NaiveCallLinker (``NaiveCallLinker.scala:13-28``): leftover calls by bare
  name (last-resort alias dictionary).

Also emits the ``link_misses`` side output (``LinkingUtil.logFailedDstLookup``
analog) — calls that no linker resolved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dims import MAX_BROADCAST_DIM, budgeted_broadcast

MAX_HIERARCHY_DEPTH = 20  # bound for the inheritance closure loop
# driver-side closure is a collect, i.e. the same memory class as a broadcast
# dimension — tie its bound to the shared broadcast budget instead of an
# independent magic constant (INHERITS_FROM edge rows are wider than dim rows,
# hence the divisor); above it the distributed iterative closure takes over
SMALL_HIERARCHY_LIMIT = MAX_BROADCAST_DIM // 20
# method-dimension budget for the static-link broadcast join; above it the
# broadcast would blow the driver/executor memory at cluster scale, so the
# linker auto-falls-back to the salted shuffle join
MAX_BROADCAST_METHODS = MAX_BROADCAST_DIM


def _method_dim(nodes: DataFrame) -> DataFrame:
    return (
        nodes.filter(F.col("kind") == "METHOD")
        .select(
            F.col("full_name").alias("m_full"),
            F.col("name").alias("m_name"),
            F.col("signature").alias("m_sig"),
            F.col("node_id").alias("m_id"),
            F.col("is_external").alias("m_external"),
        )
    )


def static_call_linker(nodes: DataFrame, strategy: str = "auto",
                       hot_keys: DataFrame | None = None,
                       broadcast_budget: int = MAX_BROADCAST_METHODS) -> DataFrame:
    """CALL edges for STATIC_DISPATCH / INLINED calls.

    strategy='broadcast' (dim fits → map-side join, no shuffle of the skewed
    fact side) or 'salted' (dim exceeds the broadcast threshold → hot callee
    names like printf/malloc are replicated across salts so no reducer owns
    a whole hot key; SURVEY.md §4 skew row). The default 'auto' counts the
    METHOD dimension against ``broadcast_budget`` and picks the strategy —
    at 100× corpus scale the distinct-method dim (incl. stubs) can exceed
    any broadcast threshold, and an unconditional broadcast would kill the
    job rather than degrade it.
    """
    return _static_candidates(nodes, strategy=strategy, hot_keys=hot_keys,
                              broadcast_budget=broadcast_budget).select(
        "src", "dst",
        F.lit("CALL").alias("kind"), F.lit("").alias("variable"),
        "doc_id", "method_id",
    )


def _static_calls(nodes: DataFrame, id_alias: str = "call_id") -> DataFrame:
    """Static-dispatch calls projection — the ONE definition of which calls
    the static linker considers, shared by candidate generation and the
    resolved-membership probe so the naive linker's leftover set can never
    diverge from the static candidate set (round-4 advice)."""
    return nodes.filter(
        (F.col("kind") == "CALL")
        & F.col("dispatch_type").isin("STATIC_DISPATCH", "INLINED")
    ).select(
        F.col("node_id").alias(id_alias),
        F.col("full_name").alias("m_full"),
        F.col("signature").alias("c_sig"),
        "doc_id", "method_id",
    )


def _sig_conjunct():
    """Reference semantics: signature is an extra conjunct only when the
    call carries one (empty/null c_sig matches any method signature)."""
    return (
        (F.col("c_sig").isNull()) | (F.col("c_sig") == "")
        | (F.col("c_sig") == F.col("m_sig"))
    )


def _static_candidates(nodes: DataFrame, strategy: str = "auto",
                       hot_keys: DataFrame | None = None,
                       broadcast_budget: int = MAX_BROADCAST_METHODS) -> DataFrame:
    """Static-link candidate rows (src, dst, doc_id, method_id, m_external)."""
    calls = _static_calls(nodes)
    methods = _method_dim(nodes)
    if strategy == "auto":
        from . import dims

        if dims._FITS_HINT is not None:
            strategy = "broadcast" if dims._FITS_HINT else "salted"
        else:
            # bounded count: stops scanning at budget+1, never a full aggregate
            n_methods = methods.limit(broadcast_budget + 1).count()
            strategy = "broadcast" if n_methods <= broadcast_budget else "salted"
    if strategy == "salted":
        from .salting import salted_join

        joined = salted_join(calls, methods, key="m_full",
                             fact_salt_from="call_id", hot_keys=hot_keys)
    else:
        joined = calls.join(F.broadcast(methods), "m_full")
    joined = joined.filter(_sig_conjunct())
    return joined.select(
        F.col("call_id").alias("src"), F.col("m_id").alias("dst"),
        "doc_id", "method_id", "m_external",
    )


def _static_resolved(nodes: DataFrame) -> DataFrame:
    """Call ids (as ``src``) that the static linker WILL resolve — the same
    join key + signature conjunct as :func:`_static_candidates`, but as a
    left-semi probe against the broadcast METHOD dim: one map-side pass that
    yields one row per resolved call, never the call×methods expansion. Used
    as the anti-join build side for leftover-only naive linking, where only
    set membership matters."""
    calls = (
        _static_calls(nodes, id_alias="src")
        .withColumnRenamed("m_full", "c_full")
        .select("src", "c_full", "c_sig")
    )
    methods = _method_dim(nodes).select("m_full", "m_sig")
    return calls.join(
        budgeted_broadcast(methods),
        (F.col("c_full") == F.col("m_full")) & _sig_conjunct(),
        "left_semi",
    ).select("src")


def method_ref_linker(nodes: DataFrame) -> DataFrame:
    """REF edges METHOD_REF → METHOD by method full_name.

    Reference: ``x2cpg/.../base/MethodRefLinker.scala:12-29`` (linkToSingle on
    methodFullNameToNode). The METHOD dim is the same broadcast dictionary the
    static linker uses; METHOD_REF rows are sparse, so this is a cheap
    map-side join at any scale.
    """
    refs = nodes.filter(F.col("kind") == "METHOD_REF").select(
        F.col("node_id").alias("ref_id"),
        F.col("full_name").alias("m_full"),
        "doc_id", "method_id",
    )
    methods = _method_dim(nodes)
    return (
        refs.join(budgeted_broadcast(methods), "m_full")
        .select(
            F.col("ref_id").alias("src"), F.col("m_id").alias("dst"),
            F.lit("REF").alias("kind"), F.lit("").alias("variable"),
            "doc_id", "method_id",
        )
    )


def inheritance_closure(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Transitive subclass→superclass pairs over INHERITS_FROM.

    Returns (sub_full, super_full) including the reflexive pair. Bounded
    iterative self-join — iterations = class-hierarchy depth, which is small
    even at web scale; each step is an equi-join on the closure frontier.
    """
    decls = nodes.filter(F.col("kind") == "TYPE_DECL").select(
        F.col("node_id").alias("decl_id"), F.col("full_name").alias("decl_full")
    )
    types = nodes.filter(F.col("kind") == "TYPE").select(
        F.col("node_id").alias("type_id"), F.col("full_name").alias("type_full")
    )
    base = (
        edges.filter(F.col("kind") == "INHERITS_FROM")
        .join(decls, F.col("src") == F.col("decl_id"))
        .join(budgeted_broadcast(types), F.col("dst") == F.col("type_id"))
        .select(F.col("decl_full").alias("sub"), F.col("type_full").alias("sup"))
        .distinct()
    )
    reflexive = decls.select(
        F.col("decl_full").alias("sub"), F.col("decl_full").alias("sup")
    ).distinct()
    closure = base.unionByName(reflexive).distinct()
    # the class hierarchy is a dimension (distinct class names), usually tiny
    # relative to the fact tables: compute the closure driver-side and
    # re-broadcast when it fits, otherwise fall back to bounded iterative
    # self-joins (each iteration = one equi-join on the frontier).
    spark = nodes.sparkSession
    base_rows = base.limit(SMALL_HIERARCHY_LIMIT + 1).collect()
    if len(base_rows) <= SMALL_HIERARCHY_LIMIT:
        up: dict[str, set[str]] = {}
        for r in base_rows:
            up.setdefault(r["sub"], set()).add(r["sup"])
        result: set[tuple[str, str]] = set()
        for sub in up:
            seen, stack = {sub}, [sub]
            while stack:
                cur = stack.pop()
                for sup in up.get(cur, ()):
                    if sup not in seen:
                        seen.add(sup)
                        stack.append(sup)
            result.update((sub, sup) for sup in seen)
        pairs = spark.createDataFrame(
            sorted(result) or [("", "")], schema="sub string, sup string"
        ).filter(F.col("sub") != "")
        return pairs.unionByName(reflexive).distinct()
    closure = closure.localCheckpoint()
    for _ in range(MAX_HIERARCHY_DEPTH):
        step = (
            closure.alias("a")
            .join(base.alias("b"), F.col("a.sup") == F.col("b.sub"))
            .select(F.col("a.sub").alias("sub"), F.col("b.sup").alias("sup"))
        )
        new_closure = closure.unionByName(step).distinct().localCheckpoint()
        if new_closure.count() == closure.count():
            closure = new_closure
            break
        closure = new_closure
    return closure


def _dynamic_candidates(nodes: DataFrame, edges: DataFrame) -> DataFrame | None:
    """CHA candidate set for DYNAMIC_DISPATCH calls: (src, dst, doc_id,
    method_id, m_external) distinct rows, NO internal-preference pruning —
    or None when the corpus has no dynamic dispatch (C-only inputs; the
    reference early-exits the same way, ``DynamicCallLinker.scala:52-55``)."""
    calls = nodes.filter(
        (F.col("kind") == "CALL") & (F.col("dispatch_type") == "DYNAMIC_DISPATCH")
        & F.col("full_name").contains(".")
    )
    if calls.limit(1).count() == 0:
        return None
    calls = calls.select(
        F.col("node_id").alias("call_id"),
        F.col("full_name").alias("c_full"),
        F.col("name").alias("c_name"),
        "doc_id", "method_id",
        F.expr("substring_index(full_name, '.', 1)").alias("recv_type"),
    )
    methods = _method_dim(nodes).withColumn(
        "m_class", F.expr("substring_index(m_full, '.', 1)")
    )
    closure = inheritance_closure(nodes, edges)

    # subclass closure: recv_type → every sub where sub inherits recv
    subclasses = closure.select(
        F.col("sup").alias("recv_type"), F.col("sub").alias("impl_class")
    )
    down = (
        calls.join(budgeted_broadcast(subclasses), "recv_type")
        .join(
            budgeted_broadcast(methods),
            (F.col("impl_class") == F.col("m_class"))
            & (F.col("c_name") == F.col("m_name")),
        )
    )
    # superclass fallback for calls with no downward candidates
    resolved_ids = down.select("call_id").distinct()
    supers = closure.select(
        F.col("sub").alias("recv_type"), F.col("sup").alias("impl_class")
    )
    up = (
        calls.join(resolved_ids, "call_id", "left_anti")
        .join(budgeted_broadcast(supers), "recv_type")
        .join(
            budgeted_broadcast(methods),
            (F.col("impl_class") == F.col("m_class"))
            & (F.col("c_name") == F.col("m_name")),
        )
    )
    return (
        down.unionByName(up)
        .select(F.col("call_id").alias("src"), F.col("m_id").alias("dst"),
                "doc_id", "method_id", "m_external")
        .distinct()
    )


def dynamic_call_linker(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """PARITY-ORACLE ONLY — not a production path. The pipeline resolves
    dynamic dispatch through the one-pass aggregate arbitration in
    :func:`link_calls`; this sequential window-based variant exists solely
    so test_dims.py can A/B the two (test_plans.py asserts production never
    plans it; tests/test_parity_oracle_isolation.py lints imports).

    CHA resolution for DYNAMIC_DISPATCH calls.

    call full_name = ``Recv.m`` → candidates = methods ``C.m`` for every C in
    subclass-closure(Recv); if none, walk up the superclass chain
    (``DynamicCallLinker.scala:142-167``); prefer internal methods over
    external stubs (``:187-196``).
    """
    candidates = _dynamic_candidates(nodes, edges)
    if candidates is None:
        return nodes.sparkSession.createDataFrame(
            [], schema="src long, dst long, kind string, variable string, "
                       "doc_id string, method_id long")
    # prefer-internal pruning: if any internal candidate exists for a call,
    # drop the external stubs (window over call id).
    from pyspark.sql import Window as W

    w = W.partitionBy("src")
    candidates = (
        candidates.withColumn(
            "has_internal", F.max(F.when(~F.col("m_external"), 1).otherwise(0)).over(w)
        )
        .filter((F.col("has_internal") == 0) | (~F.col("m_external")))
    )
    return candidates.select(
        "src", "dst",
        F.lit("CALL").alias("kind"), F.lit("").alias("variable"),
        "doc_id", "method_id",
    ).distinct()


def _naive_candidates(nodes: DataFrame,
                      resolved: DataFrame | None = None) -> DataFrame:
    """Bare-name candidates for non-operator calls.

    ``resolved`` (a frame of already-linked ``src`` call ids) is anti-joined
    BEFORE the name join: bare-name matching is cross-document quadratic per
    name (a method called ``run`` defined in k documents and called in k
    documents yields k² rows), so generating candidates for calls that
    static/CHA already resolved — rows the arbitration provably never keeps
    (their ``f_r01`` flag is 1) — costs quadratic work to produce garbage.
    The reference's NaiveCallLinker has the same shape: it runs on *leftover*
    calls only (``NaiveCallLinker.scala:13-28``). Without ``resolved`` the
    unlinked-only filter falls to the caller (arbitration flags, or
    :func:`naive_call_linker`'s own anti-join)."""
    calls = nodes.filter(
        (F.col("kind") == "CALL") & ~F.col("name").startswith("<operator>")
    ).select(
        F.col("node_id").alias("call_id"), F.col("name").alias("m_name"),
        "doc_id", "method_id",
    )
    if resolved is not None:
        calls = calls.join(
            resolved.select(F.col("src").alias("call_id")), "call_id",
            "left_anti")
    methods = _method_dim(nodes).filter(~F.col("m_name").startswith("<operator>"))
    return calls.join(budgeted_broadcast(methods), "m_name").select(
        F.col("call_id").alias("src"), F.col("m_id").alias("dst"),
        "doc_id", "method_id", "m_external",
    )


def naive_call_linker(nodes: DataFrame, call_edges: DataFrame) -> DataFrame:
    """PARITY-ORACLE ONLY — not a production path (production uses
    leftover-only ``_naive_candidates(resolved=...)`` inside the arbitration;
    see :func:`dynamic_call_linker`'s marker for the lint/test guards).

    Leftover calls linked by bare name against non-operator methods."""
    unlinked = _naive_candidates(nodes).join(
        call_edges.select(F.col("src")).distinct(), "src", "left_anti",
    )
    return unlinked.select(
        "src", "dst",
        F.lit("CALL").alias("kind"), F.lit("").alias("variable"),
        "doc_id", "method_id",
    )


def prefer_internal_call_edges(call_edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """PARITY-ORACLE ONLY — not a production path (the same pruning runs
    inside :func:`link_calls`'s aggregate arbitration; see
    :func:`dynamic_call_linker`'s marker for the lint/test guards).

    Drop a call's external-stub CALL edges when it also resolved to an
    internal method (DynamicCallLinker.scala:187-196 pruning, applied across
    all linkers so a recovered-hint resolution supersedes a stub link)."""
    from pyspark.sql import Window as W

    meth = nodes.filter(F.col("kind") == "METHOD").select(
        F.col("node_id").alias("dst"), F.col("is_external").alias("m_ext")
    )
    joined = call_edges.join(meth, "dst", "left")
    w = W.partitionBy("src")
    return (
        joined.withColumn(
            "has_internal",
            F.max(F.when(~F.coalesce(F.col("m_ext"), F.lit(True)), 1).otherwise(0)).over(w),
        )
        .filter((F.col("has_internal") == 0)
                | (~F.coalesce(F.col("m_ext"), F.lit(True))))
        .select(*call_edges.columns)
    )


def candidate_pool(nodes: DataFrame, edges: DataFrame,
                   barrier: bool | None = None) -> DataFrame:
    """The kernel-independent candidate ranks (static=0, CHA=1, naive=3) as
    one frame — the pipeline materializes this concurrently with the fused
    kernel (whose output only the rank-2 hint candidates need), hiding the
    linkers' many small join stages behind the kernel's long Python stage.

    Pre-arbitration pruning (semantics-neutral): rows the final arbitration
    can NEVER keep — naive rows for calls that static/CHA already resolved
    (their keep condition requires f_r01 == 0) and CHA external stubs whose
    call has an internal CHA candidate — are dropped before the pool hits
    disk. Bare-name naive matches are cross-document quadratic per name, so
    for a mostly-statically-resolved corpus this removes the bulk of the
    spill; the arbitration in :func:`link_calls` re-derives its flags over
    the pruned pool and keeps row-for-row identical output (dropped rows
    only ever feed flag conditions of branches that are themselves dead:
    a pruned naive row's src has f_r01 == 1, killing every rank-3 branch)."""
    rank = lambda df, r: df.select(  # noqa: E731
        "src", "dst", "doc_id", "method_id", "m_external", F.lit(r).alias("rank"))
    dyn = _dynamic_candidates(nodes, edges)
    # The naive anti-join only needs set MEMBERSHIP of resolved call ids, not
    # the candidate rows — so the build side is a broadcast SEMI-join probe
    # (calls that match any method on the static key), never the full
    # static×methods expansion. The old shape eagerly checkpointed the whole
    # static∪CHA candidate frame (6 columns incl. doc_id strings) just to
    # reuse it as the anti-join build; on the bandwidth-walled host (and on
    # any real executor) that full-width materialization IS the cost — the
    # semi probe re-reads only the checkpointed vocabulary leaves map-side.
    # CHA is the one subtree whose re-evaluation is non-trivial (its
    # super-fallback branch already evaluates its down-branch twice), so at
    # corpus scale (caller passes barrier=True on CALL count) the CHA
    # candidate frame — a small fraction of all calls — is checkpointed
    # narrow instead of the whole pool.
    if dyn is not None and barrier:
        dyn = dyn.localCheckpoint(eager=True)
    resolved = _static_resolved(nodes)
    if dyn is not None:
        resolved = resolved.unionByName(dyn.select("src"))
    cand = rank(_static_candidates(nodes), 0)
    if dyn is not None:
        cand = cand.unionByName(rank(dyn, 1))
    # leftover-only naive: anti-join the static/CHA-resolved call ids before
    # the quadratic name join (the k²-per-name rows the arbitration would
    # drop anyway are never produced; NaiveCallLinker.scala:13-28 leftover
    # semantics). Every rank-3 row in the pool is then already
    # arbitration-keepable on the f_r01 axis; the final arbitration in
    # :func:`link_calls` drops the (bounded) CHA-external leftovers in its
    # single pass.
    return cand.unionByName(rank(_naive_candidates(nodes, resolved), 3))


def link_calls(nodes: DataFrame, edges: DataFrame,
               recovered: DataFrame | None = None,
               pre_candidates: DataFrame | None = None) -> DataFrame:
    """All four call linkers in ONE pass: static + CHA + type-hint + naive
    candidates (no anti-joins) arbitrated by a single priority window.

    Physically this replaces the linker chain's anti-join cascade — where
    each stage's "still unlinked?" probe re-evaluated every upstream linker,
    and the final materialization re-evaluated the whole chain again (the
    round-2 profile's anti-scaling edges stage) — with one candidate union
    and one shuffle by call id. Semantics are row-for-row identical to the
    sequential chain (asserted by tests/test_callgraph.py): per call,

    - static/CHA candidates always link (CHA externals pruned when the call
      has an internal CHA candidate or a recovered-hint link);
    - hint candidates link iff no internal static/CHA method resolved the
      call (``XTypeHintCallLinker.calls`` emptiness condition);
    - naive candidates link iff nothing else linked the call, external stubs
      pruned when an internal bare-name match exists
      (``DynamicCallLinker.scala:187-196`` pruning applied across linkers).
    """
    from .type_recovery import _hint_candidates

    rank = lambda df, r: df.select(  # noqa: E731
        "src", "dst", "doc_id", "method_id", "m_external", F.lit(r).alias("rank"))

    cand = pre_candidates if pre_candidates is not None \
        else candidate_pool(nodes, edges)
    cand = cand.unionByName(rank(_hint_candidates(nodes, edges, recovered), 2))

    # per-call flags as a map-side-combined aggregate joined back, NOT a
    # window: a Window(partitionBy src) would shuffle + sort the full
    # candidate union and buffer every src group (and five chained
    # withColumns plan five separate Window operators — measured 9x task-CPU
    # inflation at 32 cores from the per-group buffer churn). The aggregate
    # shrinks to one row per call before its (tiny) shuffle, and AQE
    # broadcasts it back over the un-shuffled candidates; when calls outgrow
    # the broadcast threshold at 100x scale it degrades to a shuffle join —
    # exactly the exchange the window needed anyway, minus the sort.
    flag = lambda c, n: F.max(F.when(c, 1).otherwise(0)).alias(n)  # noqa: E731
    flags = cand.groupBy("src").agg(
        flag(F.col("rank") <= 1, "f_r01"),
        flag((F.col("rank") <= 1) & ~F.col("m_external"), "f_r01_int"),
        flag((F.col("rank") == 1) & ~F.col("m_external"), "f_dyn_int"),
        flag(F.col("rank") == 2, "f_hint"),
        flag((F.col("rank") == 3) & ~F.col("m_external"), "f_naive_int"),
    )
    cand = cand.join(flags, "src")
    hint_kept = (F.col("f_hint") == 1) & (F.col("f_r01_int") == 0)
    keep = (
        # static: always (the sequential chain never prunes static edges)
        (F.col("rank") == 0)
        # CHA internal: always; CHA external: only if no internal CHA
        # candidate and no hint link supersedes it
        | ((F.col("rank") == 1) & (~F.col("m_external")
           | ((F.col("f_dyn_int") == 0) & ~hint_kept)))
        # hint: iff no internal static/CHA resolution
        | ((F.col("rank") == 2) & (F.col("f_r01_int") == 0))
        # naive: iff the call is otherwise unlinked; externals pruned when an
        # internal bare-name candidate exists
        | ((F.col("rank") == 3) & (F.col("f_r01") == 0) & ~hint_kept
           & (~F.col("m_external") | (F.col("f_naive_int") == 0)))
    )
    return cand.filter(keep).select(
        "src", "dst", F.lit("CALL").alias("kind"), F.lit("").alias("variable"),
        "doc_id", "method_id",
    )


def link_misses(nodes: DataFrame, call_edges: DataFrame) -> DataFrame:
    """Side output: calls that no linker resolved (LinkingUtil.scala:142-154)."""
    calls = nodes.filter(F.col("kind") == "CALL").select(
        F.col("node_id").alias("call_id"), "name", "full_name", "doc_id"
    )
    return calls.join(
        call_edges.select(F.col("src").alias("call_id")).distinct(),
        "call_id", "left_anti",
    )
