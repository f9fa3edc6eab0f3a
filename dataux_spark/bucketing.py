"""Bucketed tables — co-located joins and aggregations without shuffles.

The 100 TB lever: a fact table bucketed on its join key is written once
(one shuffle at ingest) and every later equi-join or aggregation on that
key runs shuffle-free — Spark's SortMergeJoin reads co-located buckets
directly. This is how a production deployment kills the lineitem⋈orders
exchange that dominates TPC-H-style plans.

Reference parity note: dataux's analog is config-declared table partitions
with one worker per partition (/root/reference/planner/sql_master.go:75-101,
partition → native range filter at backends/mongo/sql_to_mgo.go:189-209) —
bucketing is the Spark-native, hash-based version of the same idea.

Local caveat: bucketed tables need a catalog table (saveAsTable). The
warehouse dir defaults inside CWD; callers should set
spark.sql.warehouse.dir (tests use a tmp dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    name: str,
    keys: list[str],
    buckets: int = 32,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write df as a bucketed (and optionally sorted) catalog table. The
    one-time shuffle happens here; joins/aggs on `keys` are then local.
    With `path`, the table is EXTERNAL at that location — callers that
    can't control the session's warehouse dir (a vanilla driver session
    defaults it to CWD) point it at a temp dir instead."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    # the in-memory catalog forgets tables across sessions but their
    # storage directories persist; clear an orphan location
    import shutil
    from pathlib import Path

    loc = path or ""
    if not loc:
        wh = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
        loc = str(Path(wh) / name.lower()) if wh else ""
    if loc and Path(loc).exists():
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def is_shuffle_free_join(spark: SparkSession, left: str, right: str, on: str) -> bool:
    """True if joining two bucketed tables on `on` plans without an
    Exchange on either side (the co-location check)."""
    df = spark.table(left).join(spark.table(right), on)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
