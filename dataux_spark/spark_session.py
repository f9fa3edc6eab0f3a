"""SparkSession factory tuned for this engine.

Local-mode defaults are sized by env:
  SPARK_GRAFT_CPUS   — cores for local[N]   (default: all)
Settings chosen for 100 TB-scale habits even though tests run local:
  - AQE on (runtime coalesce, skew-join splitting)
  - shuffle partitions ~ cores locally; on a real cluster this is
    overridden by AQE's coalescing from a high initial number
  - UTC session timezone (oracle comparison + sane semantics)
  - Arrow enabled for the pandas-UDF slow path
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "dataux_spark", extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # shuffle partitions ~ the session's ACTUAL core count: honoring
    # SPARK_GRAFT_CPUS (r13) keeps the low-core scaling run partitioned
    # like its master instead of inheriting the full machine's count —
    # on a cluster this is overridden by AQE coalescing from a high
    # initial number, exactly as before.
    shuffle_parts = cpus if cpus.isdigit() else str(os.cpu_count() or 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (e.g. the events table) is otherwise
        # unreadable; read as long and convert to µs in the source layer.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # static conf: bucketed saveAsTable target (keep out of the repo CWD)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/dataux_spark_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
