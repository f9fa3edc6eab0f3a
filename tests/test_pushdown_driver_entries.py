"""The driver-gate pushdown entries (queries.pushdown_*) must actually
exercise the PUSHED path — if the negotiation silently declined, the
entries would still pass the oracle via the polyfill and prove nothing.
These tests replicate each entry with a push log attached and pin the
native execution."""

import json
import tempfile

from dataux_spark.engine import Engine
from dataux_spark.infer import TableMeta
from dataux_spark.queries import _materialize_docs
from dataux_spark.sources.cassandra_style import CassandraStyleSource
from dataux_spark.sources.es_style import EsStyleRestSource
from dataux_spark.sources.mongo_style import MongoStyleSource


def test_driver_entries_take_the_pushed_path(spark, sf_dir):
    d = tempfile.mkdtemp()
    e = Engine(spark)

    e.register_source(MongoStyleSource(
        "mgopin", {"mgopin_nation": _materialize_docs(sf_dir, "nation")},
        push_log_dir=d))
    out = e.sql(
        "SELECT n_name, n_regionkey FROM mgopin_nation "
        "WHERE n_regionkey >= 2 ORDER BY n_name LIMIT 10"
    ).collect()
    assert len(out) == 10
    log = json.load(open(f"{d}/mgopin.mgopin_nation.topk.json"))
    assert log["sort"] == [["n_name", False]] and log["limit"] == 10
    assert log["filters"] == [["n_regionkey", ">=", 2]]

    e.register_source(EsStyleRestSource(
        "espin", {"espin_supplier": _materialize_docs(sf_dir, "supplier")},
        push_log_dir=d))
    out = e.sql(
        "SELECT s_nationkey AS nk, count(*) AS ct, min(s_acctbal) AS min_bal, "
        "max(s_acctbal) AS max_bal FROM espin_supplier GROUP BY s_nationkey"
    ).collect()
    assert len(out) > 0
    log = json.load(open(f"{d}/espin.espin_supplier.agg.json"))
    assert log["group_by"] == ["s_nationkey"]
    assert ["count", "*"] in log["aggs"] and ["min", "s_acctbal"] in log["aggs"]

    meta = TableMeta(name="casspin_supplier", schema=None,
                     partition_keys=["s_nationkey"], clustering_keys=["s_suppkey"])
    e.register_source(CassandraStyleSource(
        "casspin", {"casspin_supplier": (_materialize_docs(sf_dir, "supplier"), meta)},
        push_log_dir=d))
    out = e.sql(
        "SELECT s_name, s_suppkey FROM casspin_supplier "
        "WHERE s_nationkey = 5 AND s_suppkey >= 10 ORDER BY s_suppkey LIMIT 5"
    ).collect()
    # result equals the parquet twin (may legitimately be empty at tiny SF)
    twin = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter("s_nationkey = 5 AND s_suppkey >= 10")
        .orderBy("s_suppkey").limit(5).select("s_name", "s_suppkey").collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in twin]
    log = json.load(open(f"{d}/casspin.casspin_supplier.topk.json"))
    assert log["sort"] == [["s_suppkey", False]] and log["limit"] == 5
    assert ["s_nationkey", "=", 5] in log["filters"]


def test_datastore_and_lytics_entries_take_the_pushed_path(spark, sf_dir):
    import os

    from dataux_spark.sources.datastore_style import DatastoreStyleSource
    from dataux_spark.sources.lytics_style import LyticsStyleSource

    d = tempfile.mkdtemp()
    e = Engine(spark)

    e.register_source(DatastoreStyleSource(
        "dspin", {"dspin_customer": _materialize_docs(sf_dir, "customer")},
        push_log_dir=d))
    out = e.sql(
        "SELECT c_name, c_acctbal FROM dspin_customer "
        "WHERE c_nationkey = 3 AND c_acctbal > 1000 ORDER BY c_acctbal LIMIT 10"
    ).collect()
    twin_ds = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter("c_nationkey = 3 AND c_acctbal > 1000")
        .orderBy("c_acctbal").limit(10)
        .select("c_name", "c_acctbal").collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in twin_ds] and out
    log = json.load(open(f"{d}/dspin.dspin_customer.topk.json"))
    assert log["sort"] == [["c_acctbal", False]] and log["limit"] == 10
    assert ["c_nationkey", "=", 3] in log["filters"]
    assert ["c_acctbal", ">", 1000] in log["filters"]

    e.register_source(LyticsStyleSource(
        "lypin", {"lypin_nation": _materialize_docs(sf_dir, "nation")},
        push_log_dir=d))
    out = e.sql(
        "SELECT n_name, n_nationkey FROM lypin_nation "
        "WHERE n_regionkey = 2 AND n_nationkey >= 8"
    ).collect()
    twin = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter("n_regionkey = 2 AND n_nationkey >= 8")
        .select("n_name", "n_nationkey").collect()
    )
    assert sorted(tuple(r) for r in out) == sorted(tuple(r) for r in twin)
    # the scan wrote a SegmentQL FilterStatement for the pushed conjunction
    assert any(
        "FILTER" in json.load(open(f"{d}/{f}")).get("segmentql", "")
        for f in os.listdir(d) if f.endswith(".json")
        and "segmentql" in open(f"{d}/{f}").read()
    )
