"""Broadcast-budget dispatch shared by every dimension join.

The reference links everything through in-memory maps (LinkingUtil.scala's
``methodFullNameToNode`` et al.); the distributed analog is a broadcast
dimension — but an UNCONDITIONAL broadcast dies at 100× corpus scale when the
METHOD/MEMBER dims (incl. stubs) outgrow executor memory. Every dim join in
the repo goes through :func:`budgeted_broadcast`: broadcast when a bounded
count (or the pipeline's precomputed vocabulary-size hint) says the dim fits,
otherwise return the frame unhinted so Catalyst plans a shuffle join — with
AQE skew handling enabled in the session conf, the job degrades instead of
dying.

The pipeline computes the corpus vocabulary size ONCE per run (a side product
of the recovery-dictionary job) and installs it with :func:`dim_fits_hint`,
so the hot path pays zero extra probe jobs; standalone calls (tests, DSL,
the over-budget DataFrame fallback) probe per-site with an early-stopping
``limit(budget+1).count()``.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# matches the reference-derived 2M-row dictionary budget used by the fused
# kernel (method_kernels.MAX_BROADCAST_NAMES, type_recovery.RECOVERY_DICT_BUDGET)
MAX_BROADCAST_DIM = 2_000_000

_FITS_HINT: bool | None = None


@contextmanager
def dim_fits_hint(fits: bool):
    """Install a run-scoped answer to "do the vocabulary dims fit the
    broadcast budget?" — read by every budgeted_broadcast call in the block
    (including ones on pipeline pool threads, which start inside it)."""
    global _FITS_HINT
    prev = _FITS_HINT
    _FITS_HINT = fits
    try:
        yield
    finally:
        _FITS_HINT = prev


# probe memo: semantically-equal dims recur (the method dim is rebuilt by
# every linker); keyed by the analyzed-plan hash so a probe runs once per
# distinct dim per process. A stale entry can only mis-pick the join
# strategy, never change results.
_PROBE_MEMO: dict[tuple[int, int, int | None], bool] = {}
_PROBE_MEMO_MAX = 4096


def budgeted_broadcast(dim: DataFrame, budget: int = MAX_BROADCAST_DIM,
                       fits: bool | None = None,
                       bound: DataFrame | None = None) -> DataFrame:
    """``F.broadcast(dim)`` when it fits the budget, else ``dim`` unhinted
    (shuffle join). ``fits=None`` consults the run hint, then falls back to a
    memoized bounded count that stops scanning at ``budget + 1`` rows.

    ``bound``: optional frame whose row count upper-bounds ``dim``'s (e.g.
    the pre-distinct source of a ``filter().distinct()`` dim). Probing it is
    a map-only early-stopping count — no shuffle — where probing ``dim``
    itself would have to execute the distinct's exchange just to decide the
    join strategy. Conservative by construction: an over-budget bound picks
    the shuffle join even when the distinct dim would have fit, which
    degrades the plan, never the result."""
    if fits is None:
        fits = _FITS_HINT
    if fits is None:
        try:
            # the verdict depends on WHICH frame was probed: a conservative
            # bound-based False must not be replayed for bound-less callers
            # of the same dim (or vice versa), so the bound is part of the key
            key = (
                dim.semanticHash(),
                budget,
                bound.semanticHash() if bound is not None else None,
            )
        except Exception:
            key = None
        if key is not None and key in _PROBE_MEMO:
            fits = _PROBE_MEMO[key]
        else:
            probe = bound if bound is not None else dim
            fits = probe.limit(budget + 1).count() <= budget
            if key is not None:
                if len(_PROBE_MEMO) >= _PROBE_MEMO_MAX:
                    _PROBE_MEMO.clear()
                _PROBE_MEMO[key] = fits
    return F.broadcast(dim) if fits else dim
