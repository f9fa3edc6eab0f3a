"""Scale-fallback property for the headline joins (round-6 hint removal).

At 100× scale the build sides of the TPC-H joins no longer fit the
broadcast threshold; with no forced `broadcast()` hints the plans must
degrade to shuffle joins AND still produce identical answers. Simulate
exactly that by disabling auto-broadcast entirely
(`autoBroadcastJoinThreshold = -1`): every query must return the same
rows it returns under the default config, and its physical plan must
actually contain a non-broadcast join (proving the fallback engaged —
a forced hint would have pinned BroadcastHashJoin regardless).

Reference anchor: the engine-side merge join is the reference's ONLY
join strategy precisely because backends can't bound the build side
(/root/reference/planner/executor.go:84-96).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from tests.conftest import SF_DIR

# multi-minute suite (micro-batch harness / no-broadcast scale properties):
# excluded from the inner-loop fast path (`pytest -m "not slow"`);
# the full unmarked run remains the gate
pytestmark = pytest.mark.slow

# the ten joins whose forced broadcasts were removed in round 6, plus the
# 5-way as the deepest tree
AFFECTED = [
    "join_inner",
    "join_3way",
    "q3_shipping_priority",
    "join_5way_regional_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q21_waiting_suppliers",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", AFFECTED)
def test_headline_join_survives_no_broadcast(spark, name):
    from dataux_spark import queries as Q

    fn = Q.queries()[name]
    baseline = _rows(fn(spark, SF_DIR))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = fn(spark, SF_DIR)
        plan = _plan(df)
        # the fallback actually engaged: at least one shuffle join planned
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
            f"{name}: no shuffle join under threshold=-1 — a forced "
            "broadcast is pinning the plan"
        )
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        assert _rows(df) == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_no_forced_broadcast_of_sf_scaled_frames(spark):
    """The tools/explain_audit.py hint rule as a standing pytest gate:
    across EVERY registered query's analyzed plan, a broadcast-hinted
    subtree may touch an sf-scaled relation only below a
    cardinality-reshaping node (Aggregate / GlobalLimit / Deduplicate)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "explain_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools", "explain_audit.py"),
    )
    audit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(audit)

    from dataux_spark import queries as Q

    bad = {}
    for name, fn in Q.queries().items():
        try:
            analyzed = fn(spark, SF_DIR)._jdf.queryExecution().analyzed().toString()
        except Exception:
            continue  # fixture-dependent entry; tools run covers it
        v = audit._hint_violations(analyzed)
        if v:
            bad[name] = v
    assert not bad, f"forced broadcasts of sf-scaled frames: {bad}"
