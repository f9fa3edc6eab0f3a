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
import pytest

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


def test_apply_cdc_delta_sequential_equals_recompute(spark, sf_dir, tmp_path):
    """IVM applied commit-by-commit from the follower sink converges to
    the same aggregate as a from-scratch recompute of the final state —
    the long-running-consumer shape (apply each feed partition as it
    lands, never rescan the table)."""
    from pyspark.sql import functions as F

    from dataux_spark import Engine
    from dataux_spark.operators.rollup import apply_cdc_delta

    src = str(tmp_path / "ivm_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_ivm", src, str(tmp_path / "ivm_work"),
                                  keys=["r_regionkey"])
    money = F.col("r_regionkey").cast("decimal(18,2)")  # any numeric works
    agg = (
        eng.store.version_of("region_ivm", 0)
        .groupBy(F.col("r_name").alias("key"))
        .agg(F.count("*").alias("n_rows"), F.sum(money).alias("value_sum"))
    )
    eng.sql("UPDATE region_ivm SET r_name = 'ZONE-A' WHERE r_regionkey <= 1")  # v1
    eng.sql("DELETE FROM region_ivm WHERE r_regionkey = 4")                    # v2
    eng.sql("INSERT INTO region_ivm (r_regionkey, r_name) VALUES (9, 'ZONE-A')")  # v3
    sink = str(tmp_path / "ivm_sink")
    assert eng.store.follow_changes("region_ivm", sink) == 3
    feed = eng.store.read_change_feed(sink).withColumn(
        "r_regionkey", F.col("r_regionkey").cast("decimal(18,2)")
    )
    for v in (1, 2, 3):  # apply each commit's partition in order
        agg = apply_cdc_delta(
            agg, feed.filter(F.col("_commit_version") == v), "r_name", "r_regionkey"
        )
    got = {r.key: (r.n_rows, float(r.value_sum)) for r in agg.collect()}
    want = {
        r.r_name: (r.n, float(r.s))
        for r in eng.store.current("region_ivm")
        .groupBy("r_name")
        .agg(F.count("*").alias("n"), F.sum(money).alias("s"))
        .collect()
    }
    assert got == want


def test_scd2_history_from_feed_reconstructs_every_version(spark, sf_dir, tmp_path):
    """SCD-2 derivation: intervals open/close at the right commits, and
    the point-in-time slice at EVERY version equals the actual snapshot
    — the dimension-history contract."""
    from pyspark.sql import functions as F

    from dataux_spark import Engine
    from dataux_spark.operators.rollup import scd2_history

    src = str(tmp_path / "scd_src")
    spark.read.parquet(f"{sf_dir}/region.parquet").write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("region_scd", src, str(tmp_path / "scd_work"),
                                  keys=["r_regionkey"])
    eng.sql("UPDATE region_scd SET r_name = 'A1' WHERE r_regionkey = 0")  # v1
    eng.sql("DELETE FROM region_scd WHERE r_regionkey = 1")               # v2
    eng.sql("INSERT INTO region_scd (r_regionkey, r_name) VALUES (9, 'NEW')")  # v3
    eng.sql("UPDATE region_scd SET r_name = 'A2' WHERE r_regionkey = 0")  # v4

    hist = scd2_history(
        eng.store.version_of("region_scd", 0),
        eng.store.changes("region_scd", 0, 4),
        ["r_regionkey"],
    )
    by_key = {}
    for r in hist.collect():
        by_key.setdefault(r.r_regionkey, []).append(
            (r.valid_from, r.valid_to, r.r_name))
    k0 = sorted(by_key[0], key=lambda t: t[0])
    assert [(a, b) for a, b, _ in k0] == [(0, 1), (1, 4), (4, None)]
    assert k0[1][2] == "A1" and k0[2][2] == "A2"
    assert [(a, b) for a, b, _ in sorted(by_key[1])] == [(0, 2)]
    assert [(a, b) for a, b, _ in sorted(by_key[9])] == [(3, None)]

    # point-in-time slices reproduce every snapshot exactly
    for v in range(5):
        snap = {(r.r_regionkey, r.r_name)
                for r in eng.store.version_of("region_scd", v)
                .select("r_regionkey", "r_name").collect()}
        asof = {
            (r.r_regionkey, r.r_name)
            for r in hist.filter(
                (F.col("valid_from") <= v)
                & (F.col("valid_to").isNull() | (F.col("valid_to") > v))
            ).collect()
        }
        assert asof == snap, v


def test_quantile_rollup_range_accuracy_and_merge(spark, sf_dir, tmp_path):
    """Windowed quantile from merged bin counts tracks the exact
    percentile within one bin width, for a sub-range of buckets."""
    from pyspark.sql import functions as F

    from dataux_spark.operators.rollup import (
        build_quantile_rollup,
        quantile_over_range,
    )
    from dataux_spark.queries import read_table

    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "qroll")
    build_quantile_rollup(ev, path, bins=128)
    mm = ev.agg(F.min(F.col("value").cast("double")),
                F.max(F.col("value").cast("double"))).first()
    bin_w = (mm[1] - mm[0]) / 128
    start, end = "2024-01-05", "2024-01-10"
    est = {r.key: r.q_est for r in
           quantile_over_range(spark, path, 0.5, start, end).collect()}
    sub = ev.filter((F.col("ts") >= start) & (F.col("ts") < end))
    true = {r.event_type: r.p for r in
            sub.groupBy("event_type")
            .agg(F.expr("percentile(value, 0.5)").alias("p")).collect()}
    assert set(est) == set(true)
    # ceil(qN) ranking vs exact percentile's (n-1)q interpolation can
    # differ by one rank, which may cross a bin boundary: 2 bin widths
    # is the honest bound for an equi-width histogram estimate
    for k in true:
        assert abs(est[k] - true[k]) <= 2 * bin_w + 1e-9, (k, est[k], true[k])


@pytest.mark.slow  # multi-10s property/soundness check — full suite only
def test_quantile_rollup_null_and_empty_inputs(spark, tmp_path):
    """NULL values are excluded from binning (they would otherwise pile
    into the top bin via least()'s NULL-skipping); an empty input builds
    a readable rollup that queries to an empty result."""
    from pyspark.sql import functions as F

    from dataux_spark.operators.rollup import (
        build_quantile_rollup,
        quantile_over_range,
    )

    rows = [(i, "2024-01-01 00:00:00", "k",
             float(i) if i < 10 else None) for i in range(100)]
    ev = spark.createDataFrame(
        rows, "event_id: long, ts_s: string, event_type: string, value: double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    path = str(tmp_path / "nq")
    build_quantile_rollup(ev, path, bins=16)
    out = quantile_over_range(spark, path, q=0.5).collect()
    # n counts only the 10 real values, and the median is near 4-5,
    # nowhere near the top bin a NULL pile-up would produce
    assert out[0].n == 10 and out[0].q_est < 7.0

    empty = ev.filter("event_id < 0")
    epath = str(tmp_path / "eq")
    build_quantile_rollup(empty, epath, bins=16)
    assert quantile_over_range(spark, epath, q=0.5).count() == 0


def test_distinct_rollup_nonempty_guard(spark, tmp_path):
    """The opt-in check_nonempty flag fails fast on an empty events frame
    (whose partitioned write would otherwise land an unreadable rollup),
    and stays out of the way for non-empty builds."""
    import pytest
    from pyspark.sql import functions as F

    from dataux_spark.operators.rollup import build_distinct_rollup

    ev = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00", "view", 7)],
        "event_id: long, ts_s: string, event_type: string, user_id: long",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    path = str(tmp_path / "ok")
    build_distinct_rollup(ev, path, check_nonempty=True)
    assert spark.read.parquet(path).count() == 1

    with pytest.raises(ValueError, match="empty"):
        build_distinct_rollup(
            ev.filter("event_id < 0"), str(tmp_path / "bad"), check_nonempty=True
        )


@pytest.mark.slow  # multi-10s property/soundness check — full suite only
def test_topk_rollup_bounds_are_sound(spark, sf_dir, tmp_path):
    """Heavy-hitters rollup soundness: for EVERY item in the summary the
    true range count sits inside [est_min, est_max]; est_min is exact
    for items kept in every bucket; and any item whose true count
    exceeds the summed dropped bound is guaranteed present in the
    merged top-k input (the mergeable-summary guarantee)."""
    from dataux_spark.operators.rollup import build_topk_rollup, topk_over_range
    from dataux_spark.queries import read_table

    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "hh")
    build_topk_rollup(ev, path, item_col="user_id", capacity=4)  # truncate hard
    merged = topk_over_range(spark, path, k=10**9).collect()  # all summary items
    truth = {r.user_id: r.cnt for r in
             ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert merged, "summary is empty"
    tight = 0
    for r in merged:
        assert r.est_min <= truth[r.item] <= r.est_max, (r, truth[r.item])
        tight += int(r.est_min == truth[r.item])
    # capacity-4 truncation is real: not every bound can be tight
    total_dmax = max(r.est_max - r.est_min for r in merged)
    assert total_dmax > 0
    # guarantee: items heavier than the total dropped bound are present
    present = {r.item for r in merged}
    for item, cnt in truth.items():
        if cnt > total_dmax:
            assert item in present, (item, cnt, total_dmax)


def test_cms_probe_named_params_and_edge_items(spark, sf_dir, tmp_path):
    """The probe's item spine binds items as NAMED sql parameters (r14):
    (a) estimates are identical to the old literal spelling (pinned by
    recomputing md5 buckets in Python for a present item), (b) items
    containing quotes/backslashes survive any parser mode, (c) an empty
    item list returns the documented empty (item, est) frame, (d) the
    positional-`?` spelling this replaced MISBINDS in inline VALUES
    tables on this Spark — kept as a canary so an upstream fix or
    regression is visible."""
    from dataux_spark.operators.rollup import build_cms_rollup, cms_estimates

    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "cms_np")
    build_cms_rollup(ev, path, item_col="user_id", depth=4, width=64)
    some = str(ev.select("user_id").first()[0])
    items = [some, "o'brien\\x", ""]
    est = {r.item: r.est for r in
           cms_estimates(spark, path, items, depth=4, width=64).collect()}
    assert set(est) == set(items)
    true_cnt = ev.filter(F.col("user_id").cast("string") == some).count()
    assert est[some] >= true_cnt > 0
    assert est["o'brien\\x"] == 0
    empty = cms_estimates(spark, path, [], depth=4, width=64)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["item", "est"]
    # the positional-parameter canary: repeated ? slots in one inline
    # VALUES table bind wrong (duplicated/swapped adjacent literals)
    try:
        rows = spark.sql(
            "SELECT a, b FROM (VALUES " + ", ".join(["(?, ?)"] * 16) + ") t(a, b)",
            args=[v for i in range(16) for v in (str(i), i)],
        )
        ok = sorted(map(tuple, rows.collect())) == sorted(
            (str(i), i) for i in range(16)
        )
    except Exception:
        ok = False
    assert not ok, "positional VALUES binding fixed upstream — revisit the named-param note"


@pytest.mark.slow  # multi-10s property/soundness check — full suite only
def test_cms_one_sided_error_and_range_merge(spark, sf_dir, tmp_path):
    """Count-min soundness: every estimate >= the true count (never
    under), overestimation bounded by the sketch contract, and a range
    merge over a bucket subset equals a sketch built from only that
    subset's events (cell-wise-sum mergeability)."""
    from dataux_spark.operators.rollup import build_cms_rollup, cms_estimates

    ev = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "cms")
    build_cms_rollup(ev, path, item_col="user_id", depth=4, width=64)  # narrow: force collisions
    truth = {str(r.user_id): r.cnt for r in
             ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    items = sorted(truth)[:10] + ["999999", "888888"]  # present + absent
    est = {r.item: r.est for r in
           cms_estimates(spark, path, items, depth=4, width=64).collect()}
    total = sum(truth.values())
    for it in items:
        true_cnt = truth.get(it, 0)
        assert est[it] >= true_cnt, (it, est[it], true_cnt)
        # CMS bound: overshoot <= e/width * total with high probability;
        # allow 4x slack — the guarantee under test is one-sidedness
        assert est[it] - true_cnt <= 4 * 2.72 / 64 * total, (it, est[it], true_cnt)
    # mergeability: estimates over [t0, t1) == sketch built from that slice
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    sliced = str(tmp_path / "cms_slice")
    build_cms_rollup(ev.filter(F.col("ts") < mid), sliced, item_col="user_id",
                     depth=4, width=64)
    a = {r.item: r.est for r in
         cms_estimates(spark, path, items, end=mid, depth=4, width=64).collect()}
    b = {r.item: r.est for r in
         cms_estimates(spark, sliced, items, depth=4, width=64).collect()}
    assert a == b
