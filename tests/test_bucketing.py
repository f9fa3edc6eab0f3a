"""Bucketed-table tests: co-located joins must plan without exchanges and
return identical results to the unbucketed join."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from dataux_spark import bucketing
from dataux_spark.queries import read_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf, set in get_spark (outside the repo)
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    bucketing.bucketize(li, "li_b", ["l_orderkey"], buckets=8)
    bucketing.bucketize(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", ["l_orderkey"], buckets=8
    )
    return li, o


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_no_shuffle(spark, bucketed):
    joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    plan = _plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    assert bucketing.is_shuffle_free_join(spark, "li_b", "o_b", "l_orderkey")


def test_bucketed_join_results_equal_plain(spark, sf_dir, bucketed):
    li, o = bucketed
    plain = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("ct"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    buck = (
        spark.table("li_b")
        .join(spark.table("o_b"), "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("ct"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, buck.collect()))


def test_bucketed_agg_no_exchange(spark, bucketed):
    agg = spark.table("li_b").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan
