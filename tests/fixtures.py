"""Golden fixtures ported from the reference test harness
(/root/reference/testutil/testsetup.go:36-163): 4 `article` rows + 3 `user`
rows with deliberately tricky types (bool, array<string>, timestamps,
nullable timestamp, embedded struct, raw JSON), plus a small nested-document
`github_watch` table standing in for the ES github-archive fixture
(/root/reference/testdata/importgithub.go:24-29)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("count", T.IntegerType()),
        T.StructField("count64", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("category", T.ArrayType(T.StringType())),
        T.StructField("created", T.TimestampType()),
        T.StructField("updated", T.TimestampType(), nullable=True),
        T.StructField("f", T.DoubleType()),
        T.StructField(
            "embedded",
            T.StructType(
                [T.StructField("tag", T.StringType()), T.StructField("ict", T.IntegerType())]
            ),
        ),
        T.StructField("body", T.StringType()),
    ]
)

ARTICLE_ROWS = [
    ("article1", "aaron", 22, 75, False, ["news", "sports"], _ts("2010-10-01"), _ts("2016-01-01"), 55.5, ("tag", 1), '{"name":"morestuff"}'),
    ("qarticle2", "james", 2, 64, True, ["news", "sports"], _ts("2011-10-01"), _ts("2016-01-01"), 55.5, ("tag", 1), '{"name":"morestuff"}'),
    ("zarticle3", "bjorn", 55, 100, True, ["politics"], _ts("2012-10-01"), _ts("2016-01-01"), 21.5, ("tag", 1), '{"name":"morestuff"}'),
    ("listicle1", "bjorn", 7, 12, True, ["world"], _ts("2013-10-01"), _ts("2016-01-01"), 21.5, ("tag", 1), '{"name":"morestuff"}'),
]

USER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("roles", T.ArrayType(T.StringType())),
        T.StructField("created", T.TimestampType()),
        T.StructField("updated", T.TimestampType(), nullable=True),
    ]
)

USER_ROWS = [
    ("user123", "aaron", False, ["admin", "author"], _ts("2015-12-01"), _ts("2016-01-01")),
    ("user456", "james", True, ["admin", "author"], _ts("2015-11-27"), _ts("2016-01-01")),
    ("user789", "bjorn", True, ["author"], _ts("2015-11-22"), _ts("2016-01-01")),
]

GITHUB_SCHEMA = T.StructType(
    [
        T.StructField("actor", T.StringType()),
        T.StructField("org", T.StringType(), nullable=True),
        T.StructField("created_at", T.TimestampType()),
        T.StructField(
            "repository",
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("name", T.StringType()),
                    T.StructField("language", T.StringType()),
                    T.StructField("description", T.StringType()),
                    T.StructField("stargazers_count", T.IntegerType()),
                ]
            ),
        ),
        T.StructField(
            "actor_attributes",
            T.StructType(
                [T.StructField("login", T.StringType()), T.StructField("company", T.StringType())]
            ),
        ),
    ]
)

GITHUB_ROWS = [
    ("araddon", None, _ts("2014-12-01T10:00:00"), (765, "dateparse", "Go", "date parse library", 10), ("araddon", "lytics")),
    ("araddon", None, _ts("2014-12-01T11:00:00"), (766, "qlbridge", "Go", "sql expression vm database library", 40), ("araddon", "lytics")),
    ("mdmarek", None, _ts("2014-12-02T09:00:00"), (801, "grid", "Go", "actor grid database", 15), ("mdmarek", "lytics")),
    ("kyledj", None, _ts("2014-12-02T10:00:00"), (901, "someui", "JavaScript", "ui things", 2), ("kyledj", None)),
    ("bob", None, _ts("2014-12-02T11:00:00"), (950, "datastuff", "Go", "big database tools", 7), ("bob", None)),
]


def write_fixtures(spark: SparkSession, outdir: str) -> dict[str, str]:
    paths = {}
    for name, schema, rows in [
        ("article", ARTICLE_SCHEMA, ARTICLE_ROWS),
        ("user", USER_SCHEMA, USER_ROWS),
        ("github_watch", GITHUB_SCHEMA, GITHUB_ROWS),
    ]:
        path = f"{outdir}/{name}.parquet"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths
