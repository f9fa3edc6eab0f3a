"""Record-linkage operator tests: blocking containment, scoring,
threshold early-exit, tie-break determinism, and the no-cartesian plan
guarantee."""

from pyspark.sql import functions as F

from dataux_spark.operators.linkage import blocked_entity_match


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "Acme Corp"),
            (2, 10, "Globex"),
            (3, 20, "Initech"),
            (4, 20, "Umbrella"),
        ],
        "lid long, region long, name string",
    )
    right = spark.createDataFrame(
        [
            (101, 10, "acme  corp"),   # ws + case noise -> distance 0
            (102, 10, "Globexx"),      # one insertion -> distance 1
            (103, 20, "Initech"),      # exact
            (104, 10, "Initech"),      # same name, WRONG block
            (105, 20, "Umbrellas"),    # distance 1
            (106, 20, "Umbrellaz"),    # distance 1, larger id loses tie
        ],
        "rid long, region long, name string",
    )
    return left, right


def test_match_scores_and_normalization(spark):
    left, right = _frames(spark)
    out = {
        r.lid: (r.rid, r.distance)
        for r in blocked_entity_match(
            left, right, ["region"], "name", "lid", "rid", max_distance=1
        ).collect()
    }
    assert out[1] == (101, 0)  # whitespace collapse + casefold
    assert out[2] == (102, 1)
    assert out[3] == (103, 0)


def test_blocking_excludes_cross_block_candidates(spark):
    """Initech exists verbatim in region 10 (rid 104) — a blocked pass
    must never even consider it for the region-20 entity."""
    left, right = _frames(spark)
    pairs = blocked_entity_match(
        left, right, ["region"], "name", "lid", "rid",
        max_distance=1, best_per_left=False,
    )
    assert pairs.filter(F.col("rid") == 104).count() == 0
    assert {r.rid for r in pairs.filter(F.col("lid") == 3).collect()} == {103}


def test_tie_break_is_smaller_right_id(spark):
    left, right = _frames(spark)
    out = {r.lid: r.rid for r in blocked_entity_match(
        left, right, ["region"], "name", "lid", "rid", max_distance=1
    ).collect()}
    assert out[4] == 105  # both candidates at distance 1; min rid wins


def test_threshold_drops_far_pairs_all_candidates_mode(spark):
    left, right = _frames(spark)
    pairs = blocked_entity_match(
        left, right, ["region"], "name", "lid", "rid",
        max_distance=1, best_per_left=False,
    ).collect()
    assert all(0 <= r.distance <= 1 for r in pairs)
    # Globex vs acme corp share a block but are far apart: filtered out
    assert not any(r.lid == 2 and r.rid == 101 for r in pairs)


def test_plan_has_no_cartesian_stage(spark):
    """Candidates come only from the blocking equi-join: the physical
    plan must contain a real join on the block key and no cartesian /
    nested-loop product."""
    left, right = _frames(spark)
    plan = (
        blocked_entity_match(left, right, ["region"], "name", "lid", "rid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
