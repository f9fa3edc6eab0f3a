"""Structured Streaming tests: stream results must equal the batch
computation over the same data (the fundamental streaming-correctness
property), plus stateful-op behavior."""

import pytest
from pyspark.sql import functions as F

from dataux_spark import streaming as S
from dataux_spark.queries import read_table

# multi-minute suite (micro-batch harness / no-broadcast scale properties):
# excluded from the inner-loop fast path (`pytest -m "not slow"`);
# the full unmarked run remains the gate
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def stream(spark, sf_dir):
    return S.stream_events(spark, sf_dir)


@pytest.fixture(scope="module")
def batch(spark, sf_dir):
    return read_table(spark, sf_dir, "events").cache()


def test_windowed_agg_equals_batch(spark, stream, batch):
    # complete mode: append would (correctly) withhold windows newer than
    # the final watermark — equivalence needs every window emitted
    out = S.run_to_memory(S.windowed_agg(stream, "1 hour"), "win_counts", "complete")
    got = {
        (r.win_start, r.event_type): (r.ct, r.total)
        for r in out.collect()
    }
    expect = {
        (r.h, r.event_type): (r.ct, r.total)
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count("*").alias("ct"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == expect
    # window bounds are exactly one hour
    for r in out.collect():
        assert (r.win_end - r.win_start).total_seconds() == 3600


def test_state_partitions_follow_declared_cardinality(spark, stream):
    """State-store count derives from the DECLARED expected-state-keys
    conf (the data knob), never from cores; run_to_memory restores the
    session's batch shuffle setting afterwards; and the partition count
    provably does not change results."""
    assert S.ops._state_partitions(spark) == 8  # 2048 keys / 256 per store
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(S.ops._STATE_KEYS_CONF, str(1024 * 1024))
    try:
        assert S.ops._state_partitions(spark) == 4096
        spark.conf.set(S.ops._STATE_KEYS_CONF, "1")
        assert S.ops._state_partitions(spark) == 1
        out = S.run_to_memory(
            S.windowed_agg(stream, "1 hour"), "win_one_store", "complete"
        )
        rows_one = sorted(map(tuple, out.collect()))
    finally:
        spark.conf.unset(S.ops._STATE_KEYS_CONF)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    out = S.run_to_memory(
        S.windowed_agg(stream, "1 hour"), "win_default_stores", "complete"
    )
    assert sorted(map(tuple, out.collect())) == rows_one


def test_append_mode_withholds_open_windows(spark, stream, batch):
    """Append emits only windows the final watermark has passed — the
    correct late-data contract: everything emitted is final."""
    out = S.run_to_memory(S.windowed_agg(stream, "1 hour", watermark="2 hours"), "win_append")
    max_ts = batch.agg(F.max("ts")).first()[0]
    emitted = out.collect()
    assert emitted, "old windows must emit"
    import datetime as dt
    horizon = max_ts - dt.timedelta(hours=2)
    for r in emitted:
        assert r.win_end <= horizon + dt.timedelta(hours=1), r


def test_session_window_agg_equals_batch_sessionize(spark, stream, batch):
    from dataux_spark.operators.timeseries import sessionize

    out = S.run_to_memory(S.session_window_agg(stream, gap="30 minutes"), "sess_win", "complete")
    stream_sessions = {
        (r.user_id, r.sess_start): r.n_events for r in out.collect()
    }
    b = (
        sessionize(batch, "user_id", "ts", 30.0)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start"), F.count("*").alias("n_events"))
    )
    batch_sessions = {(r.user_id, r.start): r.n_events for r in b.collect()}
    assert stream_sessions == batch_sessions


def test_stream_stream_join_equals_batch(spark, stream, batch):
    """Stream-stream join (clicks × errors within 1h lookback) must equal
    the same join computed in batch."""
    clicks_s = stream.filter(F.col("event_type") == "click")
    errors_s = stream.filter(F.col("event_type") == "error")
    out = S.run_to_memory(
        S.stream_stream_join(clicks_s, errors_s, lookback="1 hour"), "ssj"
    )
    got = {(r.left_id, r.right_id) for r in out.collect()}

    c = batch.filter(F.col("event_type") == "click").alias("l")
    e = batch.filter(F.col("event_type") == "error").alias("r")
    b = c.join(
        e,
        F.expr("l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts"),
    ).select(F.col("l.event_id").alias("li"), F.col("r.event_id").alias("ri"))
    expect = {(r.li, r.ri) for r in b.collect()}
    # append-mode may withhold pairs newer than the final watermark;
    # everything emitted must be correct and the stable region complete
    assert got <= expect
    max_ts = batch.agg(F.max("ts")).first()[0]
    import datetime as dt

    horizon = max_ts - dt.timedelta(hours=3)  # watermark 2h + lookback 1h
    stable = {
        (r.li, r.ri)
        for r in c.join(
            e,
            F.expr(
                "l.user_id = r.user_id AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts"
            ),
        )
        .filter(F.col("l.ts") < F.lit(horizon))
        .select(F.col("l.event_id").alias("li"), F.col("r.event_id").alias("ri"))
        .collect()
    }
    assert stable <= got


def test_stateful_counter_totals(spark, stream, batch):
    out = S.run_to_memory(
        S.stateful_user_counter(stream), "user_totals", output_mode="update"
    )
    # one micro-batch (availableNow over one file) → final state per user
    got = {r.user_id: (r.n_events, r.total) for r in out.collect()}
    expect = {
        r.user_id: (r.n, r.total)
        for r in batch.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == expect


def test_streaming_dedup_removes_duplicates(spark, stream, batch):
    """Self-union doubles every event; watermarked dropDuplicates restores
    exactly the distinct set (state bounded by the watermark horizon)."""
    doubled = stream.union(stream)
    out = S.run_to_memory(
        S.streaming_dedup(doubled, ["event_id"]), "dedup_sink", "append"
    )
    assert out.count() == batch.count()  # event_id is unique in the table
    assert out.select("event_id").distinct().count() == batch.count()


def test_streaming_dedup_within_watermark(spark, stream, batch):
    out = S.run_to_memory(
        S.streaming_dedup(stream.union(stream), ["event_id"], within_watermark=True),
        "dedup_ww_sink",
        "append",
    )
    assert out.select("event_id").distinct().count() == batch.count()


def test_streaming_incremental_neardup_matches_batch(spark, sf_dir, tmp_path):
    """Two micro-batches probed against a persisted store must flag
    exactly the cross-"earlier" pairs a batch recompute finds: batch1 x
    history, batch2 x history, AND batch2 x batch1 (possible only because
    each micro-batch commits its signatures before the next probes)."""
    from dataux_spark.operators import dedup
    from dataux_spark.queries import read_table

    docs = read_table(spark, sf_dir, "documents")
    store = str(tmp_path / "store")
    pairs = str(tmp_path / "pairs")
    stream_dir = str(tmp_path / "incoming")
    dedup.build_minhash_store(
        docs.filter(F.col("doc_id") <= 200), "text", "doc_id", store
    )
    b1 = docs.filter((F.col("doc_id") > 200) & (F.col("doc_id") <= 250))
    b2 = docs.filter(F.col("doc_id") > 250)
    b1.coalesce(1).write.parquet(f"{stream_dir}/f1.parquet")
    b2.coalesce(1).write.parquet(f"{stream_dir}/f2.parquet")
    schema = spark.read.parquet(f"{stream_dir}/f1.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*/")
    )
    q = S.streaming_incremental_neardup(
        stream, "text", "doc_id", store, pairs, threshold=0.5
    )
    q.awaitTermination()
    got = {
        (r.batch_id, r.store_id, r.jaccard)
        for r in spark.read.parquet(pairs).collect()
    }
    full = dedup.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    # batch mode finds unordered pairs; the streaming probe reports
    # (newer doc, older doc) for every pair whose sides arrived in
    # different ingest units OR different micro-batches of this stream
    def unit(i):
        return 0 if i <= 200 else (1 if i <= 250 else 2)
    want = {
        (max(r.id_a, r.id_b), min(r.id_a, r.id_b), r.jaccard)
        for r in full.collect()
        if unit(r.id_a) != unit(r.id_b)
    }
    assert got == want
    assert any(unit(b) == 2 and unit(s) == 1 for b, s, _ in got), (
        "no batch2 x batch1 pair — the per-micro-batch store commit "
        "is not taking effect"
    )


def test_streaming_rollup_replay_is_idempotent(spark, sf_dir, tmp_path):
    """An at-least-once foreachBatch retry must not double-count: replaying
    a batch overwrites its own ingest_batch partition, leaving the merged
    rollup identical. Also pins merged == raw end-to-end aggregation when
    every bucket is split across micro-batches."""
    from dataux_spark.operators.rollup import _bucket_agg
    from dataux_spark.queries import read_table

    ev = read_table(spark, sf_dir, "events")
    incoming, store = str(tmp_path / "in"), str(tmp_path / "rollup")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/b.parquet")
    schema = spark.read.parquet(f"{incoming}/a.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_rollup_ingest(stream, store).awaitTermination()
    want = {
        (r.bucket, r.key, r.n_events, round(r.value_sum, 2))
        for r in _bucket_agg(ev, "ts", "event_type", "hour").collect()
    }
    got = {
        (r.bucket, r.key, r.n_events, r.value_sum)
        for r in S.merged_rollup(spark, store).collect()
    }
    assert got == want
    # simulate a retry of batch 0: identical partials land in the same
    # partition directory; the merged result must not change
    (
        _bucket_agg(
            spark.read.parquet(f"{incoming}/a.parquet"), "ts", "event_type", "hour"
        )
        .withColumn("bucket_date", F.to_date("bucket"))
        .write.mode("overwrite")
        .parquet(f"{store}/ingest_batch=0")
    )
    again = {
        (r.bucket, r.key, r.n_events, r.value_sum)
        for r in S.merged_rollup(spark, store).collect()
    }
    assert again == got


def test_streaming_url_dedup_ingest(spark, tmp_path):
    """Crawl-frontier dedup across micro-batches: within-batch duplicate
    canonical keys collapse to the min id, keys accepted by an earlier
    micro-batch are dropped by later ones (store commit takes effect),
    unparseable URLs never enter the store."""
    stream_dir = str(tmp_path / "urls_in")
    store = str(tmp_path / "url_store")
    accepted = str(tmp_path / "accepted")
    b1 = spark.createDataFrame(
        [
            (1, "https://www.siteA.com/x/?utm_source=m"),
            (2, "HTTP://SITEA.COM/x"),            # same canon as 1 -> collapse
            (3, "https://siteB.org/y/"),
            (4, "not a url"),                      # unparseable -> dropped
        ],
        "id long, url string",
    )
    b2 = spark.createDataFrame(
        [
            (5, "http://sitea.com/x?fbclid=z"),    # already accepted in b1
            (6, "https://siteC.net/z"),            # new
            (7, "https://www.siteC.net/z"),        # same canon as 6 -> collapse
        ],
        "id long, url string",
    )
    b1.coalesce(1).write.parquet(f"{stream_dir}/f1.parquet")
    b2.coalesce(1).write.parquet(f"{stream_dir}/f2.parquet")
    schema = spark.read.parquet(f"{stream_dir}/f1.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stream_dir}/*/")
    )
    q = S.streaming_url_dedup_ingest(stream, "url", "id", store, accepted)
    q.awaitTermination()
    acc = {(r.id, r.url_canon) for r in spark.read.parquet(accepted).collect()}
    assert acc == {
        (1, "sitea.com/x"),
        (3, "siteb.org/y"),
        (6, "sitec.net/z"),
    }
    keys = {r.url_canon for r in spark.read.parquet(store).collect()}
    assert keys == {"sitea.com/x", "siteb.org/y", "sitec.net/z"}


def test_streaming_ewma_anomalies_flags_planted_outlier(spark, tmp_path):
    """A planted far outlier is flagged once the key has a baseline;
    early rows (cold state) are unscored; state persists across rows."""
    import pandas as pd

    rows = []
    for i in range(40):
        rows.append((i, "click", 10.0 + (i % 3)))  # tight baseline 10-12
    rows.append((100, "click", 500.0))  # the outlier, id orders it last
    pdf = pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
    src = str(tmp_path / "ewma_src")
    spark.createDataFrame(pdf).write.parquet(src)
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .parquet(src)
    )
    out = S.run_to_memory(
        S.streaming_ewma_anomalies(stream), "ewma_out", output_mode="append"
    )
    got = {r.event_id: (r.z, r.is_anomaly) for r in out.collect()}
    assert len(got) == 41
    # cold start: first 10 rows unscored
    assert all(got[i][0] is None for i in range(10))
    # baseline rows after warmup: not anomalous
    assert all(got[i][1] == 0 for i in range(10, 40))
    # the planted outlier is flagged
    assert got[100][1] == 1 and abs(got[100][0]) > 3


def test_streaming_ewma_constant_baseline_flags_deviation(spark, tmp_path):
    """var == 0 after warmup: any deviating value is the most extreme
    possible anomaly — flagged with z NULL, not silently unscored."""
    import pandas as pd

    rows = [(i, "tick", 5.0) for i in range(20)] + [(99, "tick", 6.0)]
    src = str(tmp_path / "cewma")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "event_type", "value"])
    ).write.parquet(src)
    out = S.run_to_memory(
        S.streaming_ewma_anomalies(
            spark.readStream.schema("event_id long, event_type string, value double")
            .parquet(src)
        ),
        "cewma_out", output_mode="append",
    )
    got = {r.event_id: (r.z, r.is_anomaly) for r in out.collect()}
    assert got[99] == (None, 1)
    assert all(got[i] == (None, 0) for i in range(10, 20))  # constant, warm
    # column-name collision guard
    import pytest as _pt

    with _pt.raises(ValueError, match="distinct"):
        S.streaming_ewma_anomalies(
            spark.readStream.schema("event_id long, event_type string, value double")
            .parquet(src),
            value_col="z",
        )


def test_streaming_match_sequence_equals_batch(spark, sf_dir):
    """Replaying the bounded event set through the stateful streaming
    matcher yields exactly the batch window-fold's matches."""
    from dataux_spark.operators.timeseries import match_sequence
    from dataux_spark.queries import read_table

    pattern = ["view", "click", "purchase"]
    batch = sorted(
        (r.user, r.start_ts, r.end_ts, r.duration_sec)
        for r in match_sequence(
            read_table(spark, sf_dir, "events"), pattern, within_hours=24.0
        ).collect()
    )
    stream = S.stream_events(spark, sf_dir)
    out = S.run_to_memory(
        S.streaming_match_sequence(stream, pattern, within_hours=24.0),
        "seq_out",
        output_mode="append",
    )
    got = sorted(
        (r.user, r.start_ts, r.end_ts, r.duration_sec) for r in out.collect()
    )
    assert got == batch and len(got) > 0


def test_streaming_match_sequence_state_carries_across_batches(spark, tmp_path):
    """A chain opened in one micro-batch completes in a later one (file
    source: one file = one micro-batch); expired chains are dropped."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "seq_src")
    b1 = pd.DataFrame(
        [
            (1, base, 1, "view"),
            (2, base + dt.timedelta(seconds=10), 1, "click"),
            # user 2 opens a chain whose deadline will pass
            (3, base, 2, "view"),
        ],
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    b2 = pd.DataFrame(
        [
            (4, base + dt.timedelta(seconds=20), 1, "purchase"),
            # beyond user 2's 1h window: the chain must NOT complete
            (5, base + dt.timedelta(hours=2), 2, "click"),
            (6, base + dt.timedelta(hours=2, seconds=5), 2, "purchase"),
        ],
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = S.run_to_memory(
        S.streaming_match_sequence(
            stream, ["view", "click", "purchase"], within_hours=1.0
        ),
        "seq_carry",
        output_mode="append",
    )
    rows = out.collect()
    assert [(r.user, r.duration_sec) for r in rows] == [(1, 20.0)]


def test_streaming_ewma_state_survives_multiple_batches(spark, tmp_path):
    """Regression: GroupState.get is a PROPERTY in pyspark — calling it
    crashed every stateful op on the first micro-batch where state
    already existed (single-batch tests never reached that path)."""
    import pandas as pd

    src = str(tmp_path / "ewma_mb")
    schema = "event_id long, event_type string, value double"
    b1 = pd.DataFrame([(i, "click", 10.0 + (i % 3)) for i in range(20)],
                      columns=["event_id", "event_type", "value"])
    b2 = pd.DataFrame([(100 + i, "click", 10.0 + ((100 + i) % 3)) for i in range(20)]
                      + [(999, "click", 500.0)],
                      columns=["event_id", "event_type", "value"])
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = S.run_to_memory(
        S.streaming_ewma_anomalies(stream), "ewma_mb_out", output_mode="append"
    )
    got = {r.event_id: r.is_anomaly for r in out.collect()}
    assert len(got) == 41
    assert got[999] == 1  # scored against state carried from batch 1
    assert sum(got.values()) == 1


def test_streaming_topk_bounds_and_replay(spark, sf_dir, tmp_path):
    """Streaming heavy-hitters: (1) every merged item's true count sits
    inside [est_min, est_max] and items heavier than the summed dropped
    bound are guaranteed present (the mergeable-summary guarantee,
    surviving the widened bucket x micro-batch sketch grain); (2) an
    at-least-once retry of a batch overwrites its own ingest_batch
    partition, leaving the merged result identical."""
    from dataux_spark.operators.rollup import truncate_topk

    ev = read_table(spark, sf_dir, "events")
    incoming, store = str(tmp_path / "in"), str(tmp_path / "topk")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/b.parquet")
    schema = spark.read.parquet(f"{incoming}/a.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_topk_ingest(stream, store, capacity=2).awaitTermination()  # truncate hard
    merged = S.merged_topk(spark, store, k=10**9).collect()  # all summary items
    truth = {r.user_id: r.cnt for r in
             ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert merged, "summary is empty"
    for r in merged:
        assert r.est_min <= truth[r.item] <= r.est_max, (r, truth[r.item])
    total_dmax = max(r.est_max - r.est_min for r in merged)
    assert total_dmax > 0, "capacity-2 truncation never fired"
    present = {r.item for r in merged}
    for item, cnt in truth.items():
        if cnt > total_dmax:
            assert item in present, (item, cnt, total_dmax)
    # retry batch 0: the identical sketch lands in the same partition dir
    counts = (
        spark.read.parquet(f"{incoming}/a.parquet")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"),
                 F.col("user_id").alias("item"))
        .agg(F.count("*").alias("cnt"))
    )
    truncate_topk(counts, 2).write.mode("overwrite").parquet(f"{store}/ingest_batch=0")
    again = S.merged_topk(spark, store, k=10**9).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, merged))


def test_streaming_cms_equals_batch_build(spark, sf_dir, tmp_path):
    """Count-min merge is cell-wise addition, so a store streamed in two
    micro-batches must answer point estimates identically to one batch
    build over all events — the equivalence the whole design leans on.
    A replayed batch overwrites its own partition and changes nothing."""
    from dataux_spark.operators.rollup import build_cms_rollup, cms_estimates

    ev = read_table(spark, sf_dir, "events")
    incoming, store = str(tmp_path / "in"), str(tmp_path / "cms")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/b.parquet")
    schema = spark.read.parquet(f"{incoming}/a.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_cms_ingest(stream, store, depth=4, width=64).awaitTermination()
    batch_store = str(tmp_path / "cms_batch")
    build_cms_rollup(ev, batch_store, item_col="user_id", depth=4, width=64)
    items = [str(i) for i in range(30)]
    streamed = {r.item: r.est for r in
                cms_estimates(spark, store, items, depth=4, width=64).collect()}
    batch = {r.item: r.est for r in
             cms_estimates(spark, batch_store, items, depth=4, width=64).collect()}
    assert streamed == batch
    # replay batch 0: same sketch lands in the same partition dir
    build_cms_rollup(
        spark.read.parquet(f"{incoming}/a.parquet"),
        f"{store}/ingest_batch=0", item_col="user_id", depth=4, width=64,
    )
    again = {r.item: r.est for r in
             cms_estimates(spark, store, items, depth=4, width=64).collect()}
    assert again == streamed


def test_streaming_quantile_equals_batch_and_clamps(spark, sf_dir, tmp_path):
    """Histogram merge is bin addition: a streamed store answers p95
    identically to the batch build when edges are frozen from the same
    range; values OUTSIDE the frozen range clamp into edge bins instead
    of corrupting bin arithmetic (the PSI fold rule the batch builder
    never needs)."""
    from dataux_spark.operators.rollup import (
        build_quantile_rollup,
        quantile_over_range,
    )

    ev = read_table(spark, sf_dir, "events")
    mm = ev.agg(F.min(F.col("value").cast("double")),
                F.max(F.col("value").cast("double"))).first()
    incoming, store = str(tmp_path / "in"), str(tmp_path / "qtl")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/b.parquet")
    schema = spark.read.parquet(f"{incoming}/a.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_quantile_ingest(
        stream, store, vmin=mm[0], vmax=mm[1], bins=64
    ).awaitTermination()
    batch_store = str(tmp_path / "qtl_batch")
    build_quantile_rollup(ev, batch_store, bins=64)
    a = sorted(map(tuple, quantile_over_range(spark, store, 0.95).collect()))
    b = sorted(map(tuple, quantile_over_range(spark, batch_store, 0.95).collect()))
    assert a == b
    # clamp: stream a frame with values far outside the frozen range
    wild = ev.withColumn("value", F.col("value") * 1000 - 500000)
    incoming2, store2 = str(tmp_path / "in2"), str(tmp_path / "qtl2")
    wild.coalesce(1).write.parquet(f"{incoming2}/a.parquet")
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming2}/*/")
    )
    S.streaming_quantile_ingest(
        stream2, store2, vmin=mm[0], vmax=mm[1], bins=64
    ).awaitTermination()
    hist = spark.read.parquet(f"{store2}/hist")
    bins_seen = {r.bin for r in hist.select("bin").distinct().collect()}
    assert bins_seen <= {0, 63}  # everything folded into the edge bins


def test_streaming_distinct_union_dedupes_and_replays(spark, sf_dir, tmp_path):
    """HLL twins: a store streamed in two parity batches, read with the
    unchanged union reader, must estimate per-key distincts within the
    sketch tolerance of truth (returning users NOT double-counted across
    batches — the naive per-batch sum would be), and a replayed batch
    changes nothing."""
    from dataux_spark.operators.rollup import (
        build_distinct_rollup,
        distinct_over_range,
    )

    ev = read_table(spark, sf_dir, "events")
    incoming, store = str(tmp_path / "in"), str(tmp_path / "hll")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{incoming}/a.parquet")
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{incoming}/b.parquet")
    schema = spark.read.parquet(f"{incoming}/a.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{incoming}/*/")
    )
    S.streaming_distinct_ingest(stream, store).awaitTermination()
    est = {r.key: r.n_distinct_est for r in
           distinct_over_range(spark, store).collect()}
    truth = {r.event_type: r.d for r in
             ev.groupBy("event_type")
               .agg(F.countDistinct("user_id").alias("d")).collect()}
    for k, t in truth.items():
        assert abs(est[k] - t) <= max(2, 0.05 * t), (k, est[k], t)
    # a user active in BOTH parity batches must not be double-counted:
    # the union estimate stays near truth, while summing per-batch
    # estimates would roughly double it (every user hits both parities)
    assert sum(est.values()) < 1.5 * sum(truth.values())
    # replay batch 0 in place: merged estimates unchanged
    build_distinct_rollup(
        spark.read.parquet(f"{incoming}/a.parquet"), f"{store}/ingest_batch=0"
    )
    again = {r.key: r.n_distinct_est for r in
             distinct_over_range(spark, store).collect()}
    assert again == est
