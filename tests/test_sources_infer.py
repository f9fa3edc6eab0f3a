"""Schema inference, source registry, and distributed-equivalence tests."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataux_spark import infer
from dataux_spark.queries import read_table


# -- mongo-style sampled document inference (mgo_source.go:241-366)

def test_infer_widening_and_nullable():
    docs = [
        {"a": 1, "b": "x", "ts": dt.datetime(2020, 1, 1), "flag": True},
        {"a": 2.5, "b": None, "extra": [1, 2]},
        {"a": 3, "nested": {"k": "v", "n": 7}},
    ]
    schema = infer.infer_from_documents(docs)
    m = {f.name: f.dataType for f in schema.fields}
    assert isinstance(m["a"], T.DoubleType)          # long ⊔ double → double
    assert isinstance(m["b"], T.StringType)
    assert isinstance(m["ts"], T.TimestampType)
    assert isinstance(m["flag"], T.BooleanType)      # bool not swallowed by int
    assert isinstance(m["extra"], T.ArrayType) and isinstance(m["extra"].elementType, T.LongType)
    assert isinstance(m["nested"], T.StructType)
    assert [f.name for f in schema.fields][:2] == ["a", "b"]  # first-seen order


def test_infer_sample_bound():
    docs = [{"a": 1}] * 10 + [{"late_field": "x"}] * 100
    schema = infer.infer_from_documents(docs, sample_n=5)
    assert [f.name for f in schema.fields] == ["a"]  # beyond-sample fields ignored


def test_infer_json_file_and_read(spark, tmp_path):
    path = str(tmp_path / "docs.json")
    with open(path, "w") as f:
        for i in range(100):
            f.write(json.dumps({"id": i, "name": f"n{i}", "score": i / 2}) + "\n")
    schema = infer.infer_json_file(spark, path, sample_n=30)
    df = spark.read.schema(schema).json(path)
    assert df.count() == 100
    assert dict(df.dtypes) == {"id": "bigint", "name": "string", "score": "double"}


# -- ES mapping walk (source.go:154-255)

def test_flatten_mapping_nested_dotted():
    mapping = {
        "actor": {"type": "keyword"},
        "repository": {
            "properties": {
                "id": {"type": "long"},
                "name": {"type": "text"},
                "owner": {"properties": {"login": {"type": "keyword"}}},
            }
        },
        "created_at": {"type": "date"},
    }
    fields = infer.flatten_mapping(mapping)
    m = dict(fields)
    assert isinstance(m["repository.id"], T.LongType)
    assert isinstance(m["repository.owner.login"], T.StringType)
    assert isinstance(m["created_at"], T.TimestampType)
    # ES meta-fields injected (source.go:201-203)
    assert {"_id", "type", "_score"} <= set(m)


# -- key metadata pushdown decisions (sql_to_cql.go:396-408,570-600)

def test_table_meta_pushdown_rules():
    meta = infer.TableMeta(
        "events", T.StructType(), partition_keys=["user_id"], clustering_keys=["ts"]
    )
    assert meta.can_push_filter("user_id") and meta.can_push_filter("ts")
    assert not meta.can_push_filter("value")
    assert meta.can_push_order(["ts"]) and not meta.can_push_order(["value"])


# -- sources: csv round-trip + files virtual table + CREATE source DDL

def test_csv_source_and_files_table(spark, tmp_path):
    import csv

    p = tmp_path / "appearances.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["playerid", "yearid", "teamid"])
        w.writerows([["barnero01", "1871", "BS1"], ["aaronha01", "1954", "ML1"]])

    from dataux_spark import Engine

    eng = Engine(spark)
    eng.register_source(__import__("dataux_spark.sources", fromlist=["CsvDirSource"]).CsvDirSource("files", str(tmp_path)))
    out = eng.sql(
        'SELECT playerid, yearid, teamid FROM appearances WHERE playerid = "barnero01" AND yearid = "1871"'
    ).collect()
    # inferSchema types yearid as int; the string literal still matches via
    # coercion (MySQL-loose comparison semantics preserved)
    assert [tuple(r) for r in out] == [("barnero01", 1871, "BS1")]
    files = eng.sql("SELECT table, file FROM files_files").collect()
    assert [tuple(r) for r in files] == [("appearances", "appearances.csv")]


def test_create_source_ddl(spark, sf_dir):
    from dataux_spark import Engine

    eng = Engine(spark)
    eng.sql('CREATE SOURCE dyn WITH {"type": "parquet", "path": "%s"}' % sf_dir)
    assert eng.sql("SELECT count(*) AS ct FROM nation").collect()[0][0] > 0
    eng.sql("DROP SOURCE dyn")
    assert "dyn" not in eng.sources


def test_alter_source_ddl(spark, sf_dir, tmp_path):
    """ALTER SOURCE re-registers the schema at runtime (reference SqlAlter,
    mysql_handler.go:253-260) — here re-pointing a source at a different
    path swaps every table it serves."""
    import shutil

    from dataux_spark import Engine

    sub = tmp_path / "only_nation"
    sub.mkdir()
    shutil.copy(f"{sf_dir}/nation.parquet", sub / "nation.parquet")

    eng = Engine(spark)
    eng.sql('CREATE SOURCE dyn2 WITH {"type": "parquet", "path": "%s"}' % sf_dir)
    assert "lineitem" in eng.sources["dyn2"].tables()
    eng.sql('ALTER SOURCE dyn2 WITH {"type": "parquet", "path": "%s"}' % sub)
    assert eng.sources["dyn2"].tables() == ["nation"]
    assert eng.sql("SELECT count(*) AS ct FROM nation").collect()[0][0] == 25


# -- distributed equivalence (SURVEY §3.2: partitioned == unpartitioned)

def test_partitioned_equals_unpartitioned(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    base = (
        li.groupBy("l_returnflag")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"), F.count("*").alias("n"))
    )
    repart = (
        li.repartition(13, "l_suppkey")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"), F.count("*").alias("n"))
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, repart.collect()))


def test_default_limit_final_vs_polyfill(spark):
    """Reference §2.5: un-LIMITed plain reads get the backend's default page
    size; the cap is lifted when a polyfill stage consumes the scan
    (sql_to_mgo.go:99-105 p.Final contract)."""
    from dataux_spark import Engine
    from dataux_spark.sources.memory import MemorySource

    eng = Engine(spark)
    rows = [(i, f"u{i % 3}") for i in range(40)]
    df = spark.createDataFrame(rows, "id: long, grp: string")
    src = MemorySource("capped", {"capped_tbl": df})
    df.createOrReplaceTempView("capped_tbl")
    src.default_limit = 5  # pretend mongo-style backend
    eng.register_source(src)

    assert eng.sql("SELECT id FROM capped_tbl").count() == 5          # capped
    assert eng.sql("SELECT id FROM capped_tbl LIMIT 2").count() == 2  # explicit wins
    # aggregation/join = non-final scan: cap lifted, full 40 rows seen
    assert eng.sql("SELECT count(*) AS ct FROM capped_tbl").collect()[0].ct == 40
    assert (
        eng.sql("SELECT grp, count(*) AS ct FROM capped_tbl GROUP BY grp").count() == 3
    )
