"""Event-analytics tour — run with:

    python3 examples/events_analytics.py

Drives the time-series/event surface end to end on the bundled events
table: sessionization, as-of enrichment, conversion funnel, cohort
retention, session path analysis, the continuous-aggregate rollup, and
the streaming ingest twin of the same rollup."""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataux_spark import get_spark
from dataux_spark import streaming as S
from dataux_spark.operators.timeseries import (
    cohort_retention,
    funnel_counts,
    session_paths,
    session_stats,
)
from dataux_spark.queries import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("events-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    ev = read_table(spark, SF_DIR, "events")

    print("== sessions ==")
    session_stats(ev).orderBy(F.desc("n_sessions")).show(5)

    print("== conversion funnel (view -> click -> purchase, 24h) ==")
    funnel_counts(ev, ["view", "click", "purchase"]).show()

    print("== cohort retention (first 5 cohorts) ==")
    cohort_retention(ev).orderBy("cohort_day", "age_days").show(10)

    print("== top session paths ==")
    session_paths(ev, n=2, k=8).show(truncate=False)

    print("== streaming rollup ingest (two micro-batches) ==")
    root = tempfile.mkdtemp(prefix="events_tour_")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{root}/in/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{root}/in/b.parquet")
    schema = spark.read.parquet(f"{root}/in/a.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/in/*/")
    )
    S.streaming_rollup_ingest(stream, f"{root}/rollup").awaitTermination()
    S.merged_rollup(spark, f"{root}/rollup").orderBy(F.desc("n_events")).show(5)

    print("== sketch rollups: distinct users + p95 over a range ==")
    from dataux_spark.operators.rollup import (
        build_distinct_rollup,
        build_quantile_rollup,
        distinct_over_range,
        quantile_over_range,
    )

    build_distinct_rollup(ev, f"{root}/droll")
    distinct_over_range(spark, f"{root}/droll").show()
    build_quantile_rollup(ev, f"{root}/qroll")
    quantile_over_range(spark, f"{root}/qroll", q=0.95).show()

    print("== heavy hitters: per-hour capacity-8 summaries, range-merged ==")
    from dataux_spark.operators.rollup import build_topk_rollup, topk_over_range

    build_topk_rollup(ev, f"{root}/hhroll", item_col="user_id", capacity=8)
    # [est_min, est_max] bound each user's true range count; items heavier
    # than the summed truncation line are guaranteed present
    topk_over_range(spark, f"{root}/hhroll", k=5).show()

    print("== anomalies: rolling z-score (batch) + EWMA (streaming) ==")
    from dataux_spark.operators.timeseries import rolling_zscore_anomalies

    rolling_zscore_anomalies(ev, "ts", "event_type", "value", "event_id") \
        .filter("is_anomaly = 1").show(5)
    anomalies = S.run_to_memory(
        S.streaming_ewma_anomalies(
            spark.readStream.schema(schema).parquet(f"{root}/in/*/")
        ),
        "ewma_anoms", output_mode="append",
    )
    anomalies.groupBy("is_anomaly").count().show()

    print("== engagement: DAU/WAU/stickiness; seasonal-slot anomalies ==")
    from dataux_spark.operators.timeseries import (
        active_user_stats,
        last_touch_attribution,
        seasonal_profile_anomalies,
    )

    active_user_stats(ev).show(5)
    seasonal_profile_anomalies(ev, "ts", "event_type", "value", "event_id") \
        .filter("is_anomaly = 1").show(3)

    print("== attribution: purchases credited to the last touch ==")
    last_touch_attribution(ev, "purchase", ["click", "view"]) \
        .groupBy("touch_type").count().show()
    print("events tour complete")


if __name__ == "__main__":
    main()
