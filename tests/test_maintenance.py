"""Compaction + clustered rewrite (operators/maintenance.py)."""

from pyspark.sql import functions as F

from dataux_spark.operators import maintenance as M
from dataux_spark.queries import read_table


def test_compact_shrinks_file_count(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    read_table(spark, sf_dir, "orders").repartition(40).write.parquet(src)
    assert M.file_stats(spark, src).count() == 40

    n = M.compact(spark, src, dst, target_mb=128)
    assert n == 1  # sf0.01 orders ≪ 128 MB
    assert M.file_stats(spark, dst).count() == 1
    # rows preserved exactly
    a = spark.read.parquet(src).groupBy().agg(
        F.count("*"), F.round(F.sum("o_totalprice"), 2)
    ).collect()
    b = spark.read.parquet(dst).groupBy().agg(
        F.count("*"), F.round(F.sum("o_totalprice"), 2)
    ).collect()
    assert a == b


def test_clustered_rewrite_prunes_by_range(spark, sf_dir, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "clustered")
    read_table(spark, sf_dir, "lineitem").repartition(8).write.parquet(src)

    M.compact(spark, src, dst, target_mb=0.02, sort_cols=["l_orderkey"])
    stats = M.file_stats(spark, dst)
    assert stats.count() >= 2  # 20 KB target → several range files

    # each file covers a disjoint o_orderkey range (min/max prunable)
    ranges = (
        spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("l_orderkey").alias("lo"), F.max("l_orderkey").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev.hi <= cur.lo  # disjoint, ordered ranges
