"""Continuous-aggregate rollup: materialize, merge with raw tail,
incremental refresh. The invariant everything hangs on: rollup ∪ tail,
merged by re-aggregating algebraic partials, equals aggregating raw
end-to-end — for any bucket-aligned cutoff."""

import datetime

from pyspark.sql import functions as F

from dataux_spark.operators.rollup import (
    _bucket_agg,
    build_rollup,
    refresh_rollup,
    rollup_plus_tail,
)
from dataux_spark.queries import read_table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return read_table(spark, SF, "events")


def _max_hour(e):
    return e.agg(F.date_trunc("hour", F.max("ts")).alias("m")).collect()[0].m


def _as_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rollup_plus_tail_equals_direct(spark, tmp_path):
    e = _events(spark)
    cutoff = _max_hour(e) - datetime.timedelta(hours=24)
    path = str(tmp_path / "rollup")
    build_rollup(e, path, cutoff)
    merged = _as_rows(rollup_plus_tail(spark, e, path, cutoff))
    direct = _as_rows(_bucket_agg(e, "ts", "event_type", "hour"))
    assert merged == direct
    # the rollup actually carries closed buckets (not everything from raw)
    rolled = spark.read.parquet(path)
    assert 0 < rolled.count() < len(direct)
    assert rolled.agg(F.max("bucket")).collect()[0][0] < cutoff


def test_incremental_refresh_equals_rebuild(spark, tmp_path):
    e = _events(spark)
    hi = _max_hour(e)
    old_cut, new_cut = hi - datetime.timedelta(hours=48), hi - datetime.timedelta(hours=24)
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")

    build_rollup(e, inc_path, old_cut)
    appended = refresh_rollup(spark, e, inc_path, new_cut)
    assert appended > 0

    build_rollup(e, full_path, new_cut)
    assert _as_rows(spark.read.parquet(inc_path).select("bucket", "key", "n_events")) == \
        _as_rows(spark.read.parquet(full_path).select("bucket", "key", "n_events"))
    # and the merged answer is still exact after the incremental append
    assert _as_rows(rollup_plus_tail(spark, e, inc_path, new_cut)) == \
        _as_rows(_bucket_agg(e, "ts", "event_type", "hour"))


def test_rollup_partitioned_by_date(spark, tmp_path):
    e = _events(spark)
    path = str(tmp_path / "rollup")
    build_rollup(e, path, _max_hour(e))
    import os

    parts = [d for d in os.listdir(path) if d.startswith("bucket_date=")]
    assert len(parts) > 1  # listing-level pruning is real


def test_distinct_rollup_merges_across_buckets(spark, sf_dir, tmp_path):
    """HLL sketch rollup: per-key estimates within a few % of truth, and
    the cross-bucket union deduplicates returning users (estimate tracks
    the TRUE distinct, far below the sum of per-bucket distincts)."""
    from pyspark.sql import functions as F

    from dataux_spark.operators.rollup import (
        build_distinct_rollup,
        distinct_over_range,
    )
    from dataux_spark.streaming.ops import stream_events  # noqa: F401  (events reader gotcha)
    from dataux_spark.queries import read_table

    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "droll")
    build_distinct_rollup(ev, path, bucket="hour")

    est = {r.key: r.n_distinct_est for r in
           distinct_over_range(spark, path).collect()}
    true = {r.event_type: r.d for r in
            ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d")).collect()}
    assert set(est) == set(true)
    for k in true:
        assert abs(est[k] - true[k]) / true[k] < 0.05
    # the union must DEDUP across buckets: summing per-bucket distincts
    # overcounts massively (every user returns hour after hour)
    per_bucket_sum = (
        ev.groupBy(F.date_trunc("hour", "ts"), "event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .agg(F.sum("d")).first()[0]
    )
    overall = distinct_over_range(spark, path, by_key=False).first().n_distinct_est
    true_overall = ev.agg(F.countDistinct("user_id")).first()[0]
    assert abs(overall - true_overall) / true_overall < 0.05
    assert per_bucket_sum > 3 * true_overall  # the naive merge is absurd
