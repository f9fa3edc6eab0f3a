"""Expectation-gate tests: report counts, pass/quarantine partition,
NULL-predicate strictness, warn-vs-drop semantics, and the fail-action
write gate."""

import pytest
from pyspark.sql import functions as F

from dataux_spark.operators.quality import (
    Expectation,
    ExpectationError,
    enforce,
    expectation_report,
    split_on_expectations,
)

RULES = [
    Expectation("v_pos", "v > 0", "warn"),
    Expectation("k_small", "k < 10", "drop"),
    Expectation("s_set", "s IN ('a', 'b')", "fail"),
]


@pytest.fixture()
def frame(spark):
    # rows: clean / v<=0 (warn only) / k>=10 / s out-of-set / NULL v
    return spark.createDataFrame(
        [
            (1, 5.0, "a"),
            (2, -1.0, "b"),
            (11, 2.0, "a"),
            (3, 3.0, "z"),
            (4, None, "b"),
        ],
        "k: long, v: double, s: string",
    )


def test_report_counts_and_order(frame):
    rows = expectation_report(frame, RULES).collect()
    assert [r.rule for r in rows] == ["v_pos", "k_small", "s_set"]
    by = {r.rule: r for r in rows}
    # NULL predicate result counts as a violation (strict gate)
    assert by["v_pos"].n_violations == 2
    assert by["k_small"].n_violations == 1
    assert by["s_set"].n_violations == 1
    assert all(r.n_rows == 5 for r in rows)
    assert by["k_small"].violation_pct == 20.0


def test_split_partitions_frame(frame):
    passed, bad = split_on_expectations(frame, RULES)
    # warn-only violations stay in the passed frame
    assert sorted(r.k for r in passed.collect()) == [1, 2, 4]
    bad_rows = {r.k: r.violations for r in bad.collect()}
    assert set(bad_rows) == {11, 3}
    assert bad_rows[11] == ["k_small"]
    assert bad_rows[3] == ["s_set"]
    assert passed.count() + bad.count() == frame.count()
    # the passed frame keeps the input schema exactly
    assert passed.columns == frame.columns


def test_quarantine_records_warn_violations_too(spark):
    # a row violating both a warn and a drop rule is quarantined once,
    # with BOTH names in its sorted violations array
    df = spark.createDataFrame([(20, -5.0, "a")], "k: long, v: double, s: string")
    _, bad = split_on_expectations(df, RULES)
    assert bad.collect()[0].violations == ["k_small", "v_pos"]


def test_warn_only_rules_never_divert(frame):
    passed, bad = split_on_expectations(frame, [RULES[0]])
    assert bad.count() == 0 and passed.count() == 5


def test_enforce_raises_on_fail_rule(frame):
    with pytest.raises(ExpectationError, match="s_set=1"):
        enforce(frame, RULES)


def test_enforce_drops_when_fail_rules_hold(frame):
    ok = frame.filter(F.col("s").isin("a", "b"))
    out = enforce(ok, RULES)
    # the fail rule holds everywhere, so enforce returns the drop-gated
    # frame (k>=10 removed, warn rows kept)
    assert sorted(r.k for r in out.collect()) == [1, 2, 4]


def test_bad_action_rejected():
    with pytest.raises(ValueError, match="action"):
        Expectation("x", "1=1", "explode")


def test_single_scan_plan(frame):
    # the report is ONE aggregate over one scan: no join, no window
    plan = expectation_report(frame, RULES)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
