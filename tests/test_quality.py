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


# --- table CHECK constraints (engine/TableStore integration) --------------


def test_check_constraint_gates_writes(spark, sf_dir, tmp_path):
    from dataux_spark import Engine
    from dataux_spark.engine import QueryError

    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_ck", f"{sf_dir}/nation.parquet", str(tmp_path / "ck_work"),
        keys=["n_nationkey"],
    )
    eng.sql("ALTER TABLE nation_ck ADD CONSTRAINT key_nonneg CHECK (n_nationkey >= 0)")
    n0 = eng.sql("SELECT count(*) AS ct FROM nation_ck").collect()[0][0]

    # violating INSERT rejected, table state and version untouched
    with pytest.raises(QueryError, match="key_nonneg=1"):
        eng.sql('INSERT INTO nation_ck (n_nationkey, n_name, n_regionkey) VALUES (-1, "X", 0)')
    assert eng.sql("SELECT count(*) AS ct FROM nation_ck").collect()[0][0] == n0
    assert sorted(p.name for p in (tmp_path / "ck_work").iterdir()) == ["v000000"]

    # violating file-pruned UPDATE rejected BEFORE any version appears
    with pytest.raises(QueryError, match="key_nonneg"):
        eng.sql("UPDATE nation_ck SET n_nationkey = -5 WHERE n_nationkey = 3")
    assert sorted(p.name for p in (tmp_path / "ck_work").iterdir()) == ["v000000"]

    # clean writes pass; NULL in the predicate counts as a violation
    r = eng.sql('INSERT INTO nation_ck (n_nationkey, n_name, n_regionkey) VALUES (900, "OK", 0)')
    assert r.affected == 1
    with pytest.raises(QueryError, match="key_nonneg"):
        eng.sql('INSERT INTO nation_ck (n_name, n_regionkey) VALUES ("NOKEY", 0)')

    # DROP CONSTRAINT reopens the gate
    eng.sql("ALTER TABLE nation_ck DROP CONSTRAINT key_nonneg")
    r = eng.sql('INSERT INTO nation_ck (n_nationkey, n_name, n_regionkey) VALUES (-1, "X", 0)')
    assert r.affected == 1


def test_add_constraint_scans_existing_rows(spark, sf_dir, tmp_path):
    from dataux_spark import Engine
    from dataux_spark.engine import QueryError

    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_ck2", f"{sf_dir}/nation.parquet", str(tmp_path / "ck2_work")
    )
    # existing data violates -> registration itself is rejected
    with pytest.raises(QueryError, match="small_keys"):
        eng.sql("ALTER TABLE nation_ck2 ADD CONSTRAINT small_keys CHECK (n_nationkey < 3)")
    # and the gate is NOT in place afterwards
    r = eng.sql('INSERT INTO nation_ck2 (n_nationkey, n_name, n_regionkey) VALUES (777, "Y", 0)')
    assert r.affected == 1


def test_drop_missing_constraint_errors(spark, sf_dir, tmp_path):
    from dataux_spark import Engine
    from dataux_spark.engine import QueryError

    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_ck3", f"{sf_dir}/nation.parquet", str(tmp_path / "ck3_work")
    )
    with pytest.raises(QueryError, match="no constraint"):
        eng.sql("ALTER TABLE nation_ck3 DROP CONSTRAINT ghost")


def test_constraint_gates_merge_inserts(spark, sf_dir, tmp_path):
    from dataux_spark import Engine
    from dataux_spark.engine import QueryError

    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_ck4", f"{sf_dir}/nation.parquet", str(tmp_path / "ck4_work"),
        keys=["n_nationkey"],
    )
    eng.register_memory("ckmem", {
        "src_rows": spark.createDataFrame(
            [(-9, "BAD", 0)], "n_nationkey: long, n_name: string, n_regionkey: long"
        )
    })
    eng.sql("ALTER TABLE nation_ck4 ADD CONSTRAINT key_nonneg CHECK (n_nationkey >= 0)")
    with pytest.raises(QueryError, match="key_nonneg"):
        eng.sql(
            "MERGE INTO nation_ck4 USING src_rows ON nation_ck4.n_nationkey = src_rows.n_nationkey "
            "WHEN NOT MATCHED THEN INSERT *"
        )


def test_show_create_table_lists_constraints(spark, sf_dir, tmp_path):
    from dataux_spark import Engine

    eng = Engine(spark)
    eng.register_writable_parquet(
        "nation_ck5", f"{sf_dir}/nation.parquet", str(tmp_path / "ck5_work")
    )
    eng.sql("ALTER TABLE nation_ck5 ADD CONSTRAINT key_nonneg CHECK (n_nationkey >= 0)")
    ddl = eng.sql("SHOW CREATE TABLE nation_ck5").collect()[0][1]
    assert "CONSTRAINT `key_nonneg` CHECK (n_nationkey >= 0)" in ddl
    eng.sql("ALTER TABLE nation_ck5 DROP CONSTRAINT key_nonneg")
    ddl = eng.sql("SHOW CREATE TABLE nation_ck5").collect()[0][1]
    assert "CONSTRAINT" not in ddl
