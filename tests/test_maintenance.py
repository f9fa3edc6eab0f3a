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


def test_zorder_compact_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering: a box predicate narrow in the SECOND z-order
    column touches fewer files than a single-column sort layout (where
    every file spans the full second dimension); rows survive exactly."""
    from pyspark.sql import functions as F

    from dataux_spark.operators.maintenance import compact, zorder_compact

    src = str(tmp_path / "zsrc")
    n = 40000
    # independent dimensions: a 200x200 row-major grid (y must NOT be a
    # function of x, or an x-sort accidentally confines y as well)
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 200).cast("double").alias("x"),
        ((F.col("id") / 200).cast("bigint") % 200).cast("double").alias("y"),
    )
    df.write.parquet(src)

    lin = str(tmp_path / "lin")
    zor = str(tmp_path / "zor")
    # force many small files so layout differences are visible
    compact(spark, src, lin, target_mb=0.01, sort_cols=["x"])
    zorder_compact(spark, src, zor, ["x", "y"], target_mb=0.01, bits=6)

    # identical content
    assert spark.read.parquet(zor).count() == n
    assert (
        spark.read.parquet(zor).agg(F.sum("id")).first()[0]
        == spark.read.parquet(src).agg(F.sum("id")).first()[0]
    )

    def files_touched(path, cond):
        return (
            spark.read.parquet(path)
            .filter(cond)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    def total_files(path):
        import os

        return sum(
            1
            for f in os.listdir(path)
            if f.startswith("part-") and not f.endswith(".crc")
        )

    box = (F.col("y") >= 10) & (F.col("y") < 20)  # narrow ONLY in y
    lin_touch, zor_touch = files_touched(lin, box), files_touched(zor, box)
    # x-sorted files all span the full y range; z-order confines y cells
    assert lin_touch == total_files(lin)
    assert zor_touch < total_files(zor)
    assert zor_touch / total_files(zor) < 0.75
