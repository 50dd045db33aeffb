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
    qs = entry.queries()
    return {name: _plan(qs[name](spark, SF)) for name in AUDITED}


def test_audit_covers_all_non_pipeline_queries():
    # 42 driver queries total; every non-cpg one must be in the audit
    assert len(AUDITED) >= 22


@pytest.mark.parametrize("name", AUDITED)
def test_no_row_at_a_time_python(plans, name):
    assert "BatchEvalPython" not in plans[name], (
        f"{name} plans a row-at-a-time Python UDF:\n{plans[name]}"
    )


@pytest.mark.parametrize("name", AUDITED)
def test_no_cartesian_product(plans, name):
    assert "CartesianProduct" not in plans[name], (
        f"{name} plans an unpartitioned cartesian product:\n{plans[name]}"
    )
