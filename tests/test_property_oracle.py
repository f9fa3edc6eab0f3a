"""Property-based oracle fuzzing: hypothesis generates random predicate
trees; the same SQL must return the same row count in Spark (via Engine,
through the dialect pass) and DuckDB on the same parquet. This is the
adversarial extension of the fixed tools/check.py inventory — it explores
predicate shapes nobody hand-wrote (reference has no property tests;
SURVEY §5 calls out our DuckDB-oracle plan)."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dataux_spark import Engine

# multi-minute suite: excluded from the inner-loop fast path
# (`pytest -m "not slow"`); the full unmarked run remains the gate
pytestmark = pytest.mark.slow

NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
STR_VALS = ["O", "F", "P", "1-URGENT", "2-HIGH", "3-MEDIUM", "nope"]
NUM_OPS = ["=", "!=", "<", "<=", ">", ">="]


def num_pred():
    return st.builds(
        lambda c, op, v: f"{c} {op} {v}",
        st.sampled_from(NUM_COLS),
        st.sampled_from(NUM_OPS),
        st.integers(min_value=-10, max_value=200000),
    )


def str_pred():
    return st.one_of(
        st.builds(
            lambda c, op, v: f"{c} {op} '{v}'",
            st.sampled_from(STR_COLS),
            st.sampled_from(["=", "!="]),
            st.sampled_from(STR_VALS),
        ),
        st.builds(
            lambda c, vals: f"{c} IN ({', '.join(repr(v) for v in vals)})",
            st.sampled_from(STR_COLS),
            st.lists(st.sampled_from(STR_VALS), min_size=1, max_size=3),
        ),
        st.builds(
            lambda c, v: f"{c} LIKE '%{v}%'",
            st.sampled_from(STR_COLS),
            st.sampled_from(["H", "1", "URG", "E", "zz"]),
        ),
    )


def leaf():
    return st.one_of(num_pred(), str_pred())


predicate = st.recursive(
    leaf(),
    lambda children: st.builds(
        lambda a, op, b: f"({a} {op} {b})",
        children,
        st.sampled_from(["AND", "OR"]),
        children,
    ),
    max_leaves=4,
)


@pytest.fixture(scope="module")
def harness(spark, sf_dir):
    eng = Engine(spark)
    eng.register_parquet_dir("prop", sf_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'")
    return eng, con


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pred=predicate)
def test_random_predicates_match_duckdb(harness, pred):
    eng, con = harness
    sql = f"SELECT count(*) AS ct FROM orders WHERE {pred}"
    spark_ct = eng.sql(sql).collect()[0][0]
    duck_ct = con.execute(sql).fetchone()[0]
    assert spark_ct == duck_ct, sql


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pred=predicate, limit=st.integers(min_value=0, max_value=50))
def test_random_filter_order_limit_match(harness, pred, limit):
    eng, con = harness
    sql = (
        f"SELECT o_orderkey, o_totalprice FROM orders WHERE {pred} "
        f"ORDER BY o_orderkey LIMIT {limit}"
    )
    a = [tuple(r) for r in eng.sql(sql).collect()]
    b = con.execute(sql).fetchall()
    assert a == b, sql


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pred=predicate, key=st.sampled_from(STR_COLS), h=st.integers(min_value=0, max_value=5))
def test_random_groupby_aggs_match(harness, pred, key, h):
    """Random predicate + GROUP BY + HAVING: full grouped result (count,
    integer sum, double min/max — no float arithmetic beyond comparison)
    must match DuckDB exactly."""
    eng, con = harness
    sql = (
        f"SELECT {key}, count(*) AS ct, sum(o_orderkey) AS sk, "
        f"min(o_totalprice) AS mn, max(o_totalprice) AS mx "
        f"FROM orders WHERE {pred} GROUP BY {key} HAVING count(*) >= {h}"
    )
    a = sorted(tuple(r) for r in eng.sql(sql).collect())
    b = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert a == b, sql


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pred=predicate, how=st.sampled_from(["JOIN", "LEFT JOIN"]))
def test_random_join_shapes_match(harness, pred, how):
    """Random predicate over an orders⋈customer equi-join (inner and
    left-outer): grouped counts per customer segment must match DuckDB."""
    eng, con = harness
    sql = (
        f"SELECT c.c_mktsegment, count(*) AS ct, count(o.o_orderkey) AS oct "
        f"FROM customer c {how} orders o ON o.o_custkey = c.c_custkey "
        f"AND ({pred}) GROUP BY c.c_mktsegment"
    )
    a = sorted(tuple(r) for r in eng.sql(sql).collect())
    b = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert a == b, sql


WIN_FUNCS = [
    "row_number()",
    "rank()",
    "dense_rank()",
    "lag(o_orderkey, 1)",
    "lead(o_orderkey, 2)",
    "sum(o_orderkey)",
    "count(*)",
    "min(o_totalprice)",
]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    pred=predicate,
    wf=st.sampled_from(WIN_FUNCS),
    pk=st.sampled_from(STR_COLS + ["o_custkey % 7"]),
    desc=st.booleans(),
)
def test_random_window_functions_match(harness, pred, wf, pk, desc):
    """Random window function over a random partition key and predicate:
    ordering by the unique o_orderkey makes every function's output
    deterministic (ranking, offsets, and running frames alike), so the
    full value set must match DuckDB exactly. Running sum/min get an
    explicit ROWS frame so both engines use the identical frame; count(*)
    runs unframed over the whole partition."""
    eng, con = harness
    direction = "DESC" if desc else "ASC"
    if wf in ("sum(o_orderkey)", "min(o_totalprice)"):
        over = (
            f"OVER (PARTITION BY {pk} ORDER BY o_orderkey {direction} "
            f"ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        )
    elif wf == "count(*)":
        over = f"OVER (PARTITION BY {pk})"
    else:
        over = f"OVER (PARTITION BY {pk} ORDER BY o_orderkey {direction})"
    sql = (
        f"SELECT o_orderkey, {wf} {over} AS w "
        f"FROM orders WHERE {pred} ORDER BY o_orderkey LIMIT 500"
    )
    a = [tuple(r) for r in eng.sql(sql).collect()]
    b = con.execute(sql).fetchall()
    assert a == b, sql


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    p1=predicate,
    p2=predicate,
    setop=st.sampled_from(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT", "INTERSECT ALL", "EXCEPT ALL"]
    ),
)
def test_random_set_operations_match(harness, p1, p2, setop):
    """Random predicates on both branches of every set operator (distinct
    and ALL forms): the surviving key multiset must match DuckDB."""
    eng, con = harness
    sql = (
        f"SELECT o_orderkey FROM orders WHERE {p1} "
        f"{setop} SELECT o_orderkey FROM orders WHERE {p2}"
    )
    a = sorted(r[0] for r in eng.sql(sql).collect())
    b = sorted(r[0] for r in con.execute(sql).fetchall())
    assert a == b, f"{setop}: {sql}"
