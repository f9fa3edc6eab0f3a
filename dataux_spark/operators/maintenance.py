"""Table maintenance: compaction and clustered rewrite.

A 100 TB ingest pipeline produces small files continuously (one per
micro-batch per partition); scans then pay per-file open cost and lose
row-group pruning. The two standard fixes, both plain Spark jobs:

  compact()  — coalesce a table's files to a target size. The rewrite is
      executor-side (read → repartition → write); the driver only counts
      bytes. Pairs with the copy-on-write TableStore: a compaction is a
      new version with identical rows.
  compact(sort_cols=...) — additionally range-partitions and sorts within
      partitions, so each output file covers a narrow key range and parquet
      min/max statistics prune whole files for selective predicates (the
      single-dimension form of what Delta OPTIMIZE ZORDER does).

No reference counterpart (dataux mutates remote stores and never owns
files) — this is the lakehouse-operations extension of SURVEY §3.3.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    """Local-path byte count. On a cluster this is a FileSystem.listFiles
    call — same number, different API."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def plan_file_count(path: str, target_mb: float = 128) -> int:
    return max(1, math.ceil(_dir_bytes(path) / (target_mb * (1 << 20))))


def compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_mb: float = 128,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite src parquet into ~target_mb files at dest; returns the file
    count. With sort_cols, range-partition + sort-within so file-level
    min/max stats prune selective scans."""
    df = spark.read.parquet(src_path)
    n = plan_file_count(src_path, target_mb)
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dest_path)
    return n


def file_stats(spark: SparkSession, path: str) -> DataFrame:
    """(file, rows) per parquet file — the observability half of
    compaction (a files-table analog for maintenance decisions)."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .count()
        .withColumnRenamed("count", "rows")
    )


def zorder_compact(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    zorder_cols: list[str],
    target_mb: float = 128,
    bits: int = 8,
) -> int:
    """Multi-dimension clustered rewrite — the OPTIMIZE ZORDER analog:
    each z-order column is min/max-scaled to a `bits`-bit integer, the
    per-column bits are interleaved into one Morton code, and the table
    is range-partitioned + sorted by that code. Files then cover compact
    hyper-rectangles of the key space, so parquet min/max footer stats
    prune files for predicates on ANY subset of the z-order columns —
    where sort_cols clustering serves only prefix predicates.

    Fully distributed: one scalar min/max aggregate per column (folded in
    as literals), then a pure projection — no global sort, no rank
    window. Linear min/max scaling is the simplification vs Delta's
    range-id scaling: heavily skewed columns waste code space (most rows
    collapse into few cells); pre-transform such columns (log, bucket)
    or fall back to sort_cols. Returns the output file count."""
    from pyspark.sql import functions as F

    if bits * len(zorder_cols) > 63:
        # JVM shiftleft masks the shift count mod 64 — an overflowing
        # interleave would silently wrap high bits onto low positions
        # and corrupt the clustering instead of erroring
        raise ValueError(
            f"bits ({bits}) x columns ({len(zorder_cols)}) must fit a "
            "signed 64-bit code (<= 63 bits); lower bits or drop columns"
        )
    df = spark.read.parquet(src_path)
    aggs = []
    for c in zorder_cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_mx_{c}")]
    r = df.agg(*aggs).first()
    cells = (1 << bits) - 1
    scaled = []
    for c in zorder_cols:
        lo, hi = r[f"_mn_{c}"], r[f"_mx_{c}"]
        if lo is None or hi is None:
            # all-NULL column (or empty table): the dimension carries no
            # ordering information — contribute a constant cell
            scaled.append(F.lit(0).cast("bigint"))
            continue
        span = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(cells),
                F.coalesce(
                    F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * cells)
                    .cast("bigint"),
                    F.lit(0),  # NULL values sort into the lowest cell
                ),
            )
        )
    ncols = len(scaled)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, i).bitwiseAND(F.lit(1)), i * ncols + j
            ).cast("bigint")
    n = plan_file_count(src_path, target_mb)
    out = (
        df.withColumn("_z", z)
        .repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode("overwrite").parquet(dest_path)
    return n
