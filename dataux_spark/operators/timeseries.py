"""Time-series operators Spark lacks natively: as-of join, range join,
sessionization.

The reference has none of these (SURVEY §2.3: inner equi-join only) — they
are beyond-reference extensions, but they're table stakes for an events
pipeline at 100 TB, so each is built as a composition of DataFrame ops with
exactly one keyed shuffle (never a cross join, never applyInPandas):

  asof_join    — union + keyed window + last(ignorenulls). The classic
                 scalable as-of: both sides shuffle once on the join key,
                 the window is a single sort within each key partition.
                 (pd.merge_asof per group would ship data to Python; the
                 union trick stays in Tungsten.)
  range_join   — equi-join on overlapping buckets + exact residual filter.
                 Turns an O(n·m) theta join into a bucketed hash join;
                 bucket width tunes duplication vs selectivity.
  sessionize   — lag + gap-flag + running sum (two windows over one
                 shuffle): the standard sessionization idiom.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _us(c: Column | str) -> Column:
    """Epoch micros of a timestamp column, tolerant of TIMESTAMP_NTZ.

    Parquet tz-less timestamps load as TIMESTAMP_NTZ under Spark 4's
    inferTimestampNTZ default, and unix_micros() rejects NTZ input; the
    cast is a no-op for plain TIMESTAMP and a UTC-session reinterpretation
    for NTZ (session tz is pinned to UTC in get_spark)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tolerance_sec: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row (right.ts ≤
    left.ts) within the same `on` key — NULLs if none (left outer as-of).

    Plan: tag both sides, unionByName, one window partitioned by `on`
    ordered by (ts, tag) — right rows sort before left rows at equal ts so
    the match is inclusive — then last(col, ignorenulls=True) carries the
    latest right values forward. One shuffle total, linear in rows.
    tolerance_sec: matches older than this are nulled out (pandas
    merge_asof tolerance semantics)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    l_tag = left.withColumn("_tag", F.lit(1))
    for c in right_cols:
        l_tag = l_tag.withColumn(f"{prefix}{c}", F.lit(None).cast(dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn("_rts", F.lit(None).cast("timestamp"))
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.col(ts).alias("_rts"),
    )
    for c in left.columns:
        if c not in (on, ts) and c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = W.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_tag").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    carried = unioned.select(
        "*",
        *[F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in right_cols],
        F.last("_rts", ignorenulls=True).over(w).alias("_c_rts"),
    )
    out = carried.filter(F.col("_tag") == 1)
    keep = [F.col(c) for c in left.columns]
    within = (
        F.lit(True)
        if tolerance_sec is None
        else (_us(ts) - _us("_c_rts"))
        <= int(tolerance_sec * 1_000_000)
    )
    for c in right_cols:
        keep.append(F.when(within, F.col(f"_c_{c}")).alias(f"{prefix}{c}"))
    keep.append(F.when(within, F.col("_c_rts")).alias(f"{prefix}{ts}"))
    return out.select(*keep)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Join left rows to right ranges [lo, hi) containing left_val.

    Plan: explode each right range into the buckets it overlaps, bucket the
    left value, equi-join on bucket, exact residual filter. The shuffle key
    is the bucket id — pick bucket_width ≈ typical range width so each
    range lands in O(1) buckets.

    broadcast_ranges pins the build side to the (exploded) range table —
    range lists are dimension-like at any scale, and without the hint
    Catalyst may broadcast the FACT side instead when the range side has
    unknown stats (e.g. a local-relation VALUES list) while the fact scan
    happens to sit under the size threshold at test scale. Set False when
    both sides are large; the bucket equi-join then shuffles on _bkt."""
    lb = left.withColumn("_bkt", F.floor(F.col(left_val) / bucket_width).cast("long"))
    rb = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / bucket_width).cast("long"),
                F.floor((F.col(right_hi) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    cond = (
        (lb["_bkt"] == rb["_bkt"])
        & (lb[left_val] >= rb[right_lo])
        & (lb[left_val] < rb[right_hi])
    )
    if broadcast_ranges:
        rb = F.broadcast(rb)
    return lb.join(rb, cond, how).drop("_bkt")


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds gap_minutes.

    Plan: one shuffle on key; lag + conditional flag + running sum inside
    the same window sort. Returns the input plus `session_id` (per-key,
    1-based)."""
    w = W.partitionBy(key).orderBy(F.col(ts).asc())
    gap_us = int(gap_minutes * 60 * 1_000_000)
    prev = F.lag(F.col(ts)).over(w)
    new_flag = F.when(
        prev.isNull() | ((_us(ts) - _us(prev)) > gap_us), 1
    ).otherwise(0)
    return df.withColumn("_new", new_flag).withColumn(
        "session_id", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    ).drop("_new")


def session_stats(
    df: DataFrame, key: str = "user_id", ts: str = "ts", gap_minutes: float = 30.0
) -> DataFrame:
    """Per-key session summary: session count, max events in a session,
    mean session duration (seconds, rounded)."""
    s = sessionize(df, key, ts, gap_minutes)
    per_session = s.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        (_us(F.max(ts)) - _us(F.min(ts))).alias("dur_us"),
    )
    return per_session.groupBy(key).agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.avg(F.col("dur_us") / 1_000_000.0), 4).alias("avg_session_sec"),
    )


def gap_fill_hourly(
    df: DataFrame,
    ts: str = "ts",
    group: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """Dense hourly series per group with zero-filled gaps — the
    continuous-aggregate companion (TimescaleDB's time_bucket_gapfill
    shape): hours in which a group has no events appear as (ct=0,
    total=0.0) rows instead of being absent.

    Spark-first plan: aggregate to sparse hourly buckets (one shuffle),
    compute the GLOBAL hour span as a 1-row scalar, build the dense spine
    with sequence()+explode of hour timestamps CROSS JOINED against the
    distinct group keys (spine size = hours x groups, data-independent
    and tiny relative to the events), then left-join sparse onto the
    spine with coalesce-to-zero. The spine side is broadcast; the fact
    table is shuffled once on (hour, group) — no per-row Python, no
    driver loop. Returns (hour, <group>, ct, total)."""
    hour = F.date_trunc("hour", F.col(ts))
    sparse = (
        df.groupBy(hour.alias("hour"), F.col(group))
        .agg(F.count("*").alias("ct"), F.round(F.sum(value), 2).alias("total"))
    )
    span = df.agg(
        F.date_trunc("hour", F.min(ts)).alias("lo"),
        F.date_trunc("hour", F.max(ts)).alias("hi"),
    )
    spine_hours = span.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    groups = df.select(F.col(group)).distinct()
    spine = spine_hours.crossJoin(groups)
    return (
        spine.join(sparse, ["hour", group], "left")
        .select(
            "hour",
            group,
            F.coalesce(F.col("ct"), F.lit(0)).cast("long").alias("ct"),
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_hours: float = 24.0,
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step i when an event of
    that type occurs AFTER their step-(i-1) reach time, all within
    `within_hours` of their FIRST step-0 event. Reach time of each step
    is the earliest qualifying event (the standard product-analytics
    funnel definition), so the result is deterministic.

    Plan: one filtered per-user min-aggregate per step, each followed by
    an equi-join on the user id — len(steps) small keyed shuffles, no
    window over the full event stream and nothing pairwise. At 100 TB
    the per-step frames are user-cardinality-sized after their first
    aggregate, so later stages never rescan raw events beyond the one
    filtered pass each step needs. Returns (step, step_name, n_users)
    with step 0-indexed and counts non-increasing."""
    u, t = F.col(user_col), F.col(ts_col)
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
        .withColumn("_t0", F.col("_t"))
    )
    rows = [(0, steps[0], cur)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = events.filter(F.col(type_col) == step).select(
            u.alias(user_col), t.alias("_ts")
        )
        cur = (
            cur.join(nxt, user_col)
            .filter(
                (F.col("_ts") > F.col("_t"))
                & (
                    F.col("_ts")
                    <= F.col("_t0") + F.expr(f"INTERVAL {int(within_hours * 3600)} SECONDS")
                )
            )
            .groupBy(user_col, "_t0")
            .agg(F.min("_ts").alias("_t"))
            .select(user_col, "_t", "_t0")
        )
        rows.append((i, step, cur))
    out = None
    for i, name, frame in rows:
        part = frame.agg(F.count("*").cast("bigint").alias("n_users")).select(
            F.lit(i).alias("step"), F.lit(name).alias("step_name"), "n_users"
        )
        out = part if out is None else out.unionByName(part)
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort-retention triangle: a user's cohort is the day of
    their first event; for each (cohort_day, age_days) count the distinct
    users active again that day. Two keyed shuffles (per-user first-day,
    then the (cohort, age) roll-up over the distinct user-day activity) —
    the small-output analytics query every event warehouse fronts with.
    Returns (cohort_day, age_days, n_users), age 0 = the cohort's size."""
    day = F.to_date(F.col(ts_col))
    firsts = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    activity = events.select(F.col(user_col), day.alias("_d")).distinct()
    return (
        activity.join(firsts, user_col)
        .select(
            F.col("cohort_day"),
            F.datediff(F.col("_d"), F.col("cohort_day")).alias("age_days"),
            F.col(user_col),
        )
        .groupBy("cohort_day", "age_days")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


def session_paths(
    events: DataFrame,
    n: int = 2,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Top event-type paths: sessionize, order each session's events
    totally (ts, then id — deterministic under timestamp ties), slide an
    n-gram window over the type sequence, count occurrences corpus-wide,
    top-k. The classic navigation-path analysis; one session shuffle +
    one path roll-up, the n-gram expansion all higher-order functions.
    Returns (path, ct, rank) with 'a>b' path strings."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    seqs = (
        s.groupBy(user_col, "session_id")
        .agg(
            F.expr(
                f"transform(array_sort(collect_list(struct({ts_col}, {id_col}, "
                f"{type_col} AS t))), x -> x.t)"
            ).alias("_types")
        )
        .filter(F.size("_types") >= n)
    )
    grams = seqs.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_types) - {n - 1}), "
                f"i -> concat_ws('>', slice(_types, i, {n})))"
            )
        ).alias("path")
    )
    topk = (
        grams.groupBy("path")
        .agg(F.count("*").alias("ct"))
        .orderBy(F.col("ct").desc(), F.col("path"))
        .limit(k)
    )
    w = W.orderBy(F.col("ct").desc(), F.col("path"))
    return topk.withColumn("rank", F.row_number().over(w))


def rolling_zscore_anomalies(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    id_col: str,
    window: int = 50,
    min_n: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly flags — the standard metric-monitoring
    pass: each event's value is scored against the mean/stddev of its
    key's `window` PRECEDING events (strictly before the current row, so
    an outlier never masks itself), flagged when |z| > threshold. Rows
    with fewer than `min_n` prior observations are unscored (z NULL) —
    a cold key has no baseline.

    Scale: ONE keyed window (shuffle on key_col, per-partition sort) —
    the sessionization shape; stddev is the population form over the
    frame and z is rounded to 6dp before the threshold compare so the
    flag set reproduces on any engine. Ordering ties break by id.
    Returns (id, key, ts, value, z, is_anomaly)."""
    w = (
        W.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-window, -1)
    )
    mean = F.avg(F.col(value_col)).over(w)
    sd = F.stddev_pop(F.col(value_col)).over(w)
    n_prev = F.count(F.col(value_col)).over(w)
    z = F.when(
        (n_prev >= min_n) & (sd > 0),
        F.round((F.col(value_col) - mean) / sd, 6),
    )
    return events.select(
        F.col(id_col),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
        z.alias("z"),
        # unscored rows flag 0, not NULL — the output is a total labeling
        F.coalesce((F.abs(z) > threshold).cast("int"), F.lit(0)).alias("is_anomaly"),
    )


def seasonal_profile_anomalies(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    id_col: str,
    min_n: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Seasonal-baseline anomaly flags — the complement of
    rolling_zscore_anomalies above: instead of "unusual vs the last N
    observations", each value is scored against its key's PROFILE for
    that hour-of-day ("traffic is always low at 4am"), so a metric that
    is normal in absolute terms but wrong for its seasonal slot flags,
    and a daily peak that would trip a rolling window does not.

    Baseline = mean/stddev_pop per (key, hour-of-day) over the whole
    frame — one map-side-combined groupBy to keys x 24 rows, joined back
    on the same compound key (bounded aggregate: AQE broadcasts it at
    runtime; not hinted, since key cardinality is data-dependent). A
    slot with fewer than `min_n` observations gives no baseline (z NULL,
    flag 0 — total labeling, same contract as the rolling scorer). z is
    rounded to 6dp before the |z| > threshold compare so the flag set
    reproduces on any engine.

    Note the self-inclusion asymmetry vs the rolling scorer: the profile
    INCLUDES the scored value (a population baseline over the whole
    history), where the rolling frame excludes it. At profile n >> 1 the
    dilution is negligible; min_n keeps the degenerate n=1 slot (z = 0/0)
    out by construction.

    Returns (id, key, hod, value, z, is_anomaly)."""
    hod = F.hour(F.col(ts_col))
    prof = (
        events.groupBy(F.col(key_col).alias("key"), hod.alias("hod"))
        .agg(
            F.avg(value_col).alias("_m"),
            F.stddev_pop(value_col).alias("_sd"),
            F.count(value_col).alias("_n"),
        )
    )
    scored = events.select(
        F.col(id_col),
        F.col(key_col).alias("key"),
        hod.alias("hod"),
        F.col(value_col).alias("value"),
    ).join(prof, ["key", "hod"])
    z = F.when(
        (F.col("_n") >= min_n) & (F.col("_sd") > 0),
        F.round((F.col("value") - F.col("_m")) / F.col("_sd"), 6),
    )
    return scored.select(
        F.col(id_col),
        "key",
        "hod",
        "value",
        z.alias("z"),
        F.coalesce((F.abs(z) > threshold).cast("int"), F.lit(0)).alias("is_anomaly"),
    )


def match_sequence(
    events: DataFrame,
    pattern: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_hours: float = 24.0,
) -> DataFrame:
    """MATCH_RECOGNIZE-lite ordered sequence detection: one match per
    pattern[0] anchor event, chained GREEDILY — stage i+1 binds to the
    FIRST event of that type strictly after the bound stage-i event
    (first-next, the funnel_counts step rule, not earliest-feasible), and
    the match survives if the whole chain completes within
    `within_hours` of the anchor. Overlapping matches are allowed (each
    anchor reports its own chain); repeated types in the pattern bind to
    distinct events because each hop is strictly-after.

    Plan: ONE shuffle (user_col) + one per-partition sort, then a
    backward fold over the pattern — each stage is a min-of-struct over
    the UNBOUNDED FOLLOWING frame (the struct's first field is the sort
    key, so min() picks the earliest following stage event and its
    already-computed chain tail rides along in the second field). No
    self-joins, no state machine in Python: pattern length k costs k
    window aggregates over the same sorted partition, and Spark plans
    them in one Window node run. "Strictly after" is the lexicographic
    (ts, id) order, so equal-timestamp events still chain
    deterministically and an oracle can spell the identical row-value
    comparison.

    Returns (user, start_ts, end_ts, duration_sec) per match, one row
    per completed anchor. 100 TB: cost is the sessionize shape — a
    single keyed exchange; the window state per partition is O(1) per
    row per stage.
    """
    if len(pattern) < 2:
        raise ValueError("pattern needs at least two stages")
    u, t, ty = F.col(user_col), F.col(ts_col), F.col(type_col)
    rid = F.col(id_col)
    w = (
        W.partitionBy(u)
        .orderBy(t, rid)
        .rowsBetween(1, W.unboundedFollowing)
    )
    # backward fold: e = chain-end ts, defined exactly on rows of the
    # current stage's type. Membership in the min-of-struct frame is
    # gated on the TYPE alone (not e IS NOT NULL): greedy first-next
    # must bind to the earliest following stage event even when that
    # event's own tail is incomplete — the null tail then fails THIS
    # anchor, exactly like the funnel rule and the lateral-join oracle.
    # The struct's (ts, id) head fields are never null, so min() never
    # compares the nullable tail.
    nxt = pattern[-1]
    e = F.when(ty == nxt, t)
    for stage in reversed(pattern[:-1]):
        later = F.when(ty == nxt, F.struct(t.alias("s"), rid.alias("i"), e.alias("e")))
        first_later = F.min(later).over(w)
        e = F.when(ty == stage, first_later["e"])
        nxt = stage
    out = events.withColumn("__end", e).filter(
        (ty == pattern[0])
        & F.col("__end").isNotNull()
        & (
            F.unix_micros(F.col("__end").cast("timestamp")) - F.unix_micros(t.cast("timestamp"))
            <= int(within_hours * 3600) * 1_000_000
        )
    )
    dur = (
        F.unix_micros(F.col("__end").cast("timestamp")) - F.unix_micros(t.cast("timestamp"))
    ) / 1_000_000.0
    return out.select(
        u.alias("user"),
        t.alias("start_ts"),
        F.col("__end").alias("end_ts"),
        F.round(dur, 6).alias("duration_sec"),
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    lookback_hours: float = 72.0,
) -> DataFrame:
    """Last-touch attribution: every conversion event is credited to the
    user's most recent PRECEDING touch event (strictly before in the
    (ts, id) total order, so an equal-timestamp tie is decided by id,
    never nondeterministically), or labeled 'direct' when no touch falls
    inside the lookback window. The funnel/retention family's
    revenue-side sibling.

    Plan: ONE user-keyed sort window over the touch∪conversion subset —
    the carried last-touch is an ignorenulls last() over the preceding
    frame, so there is no per-conversion as-of join, no range join, and
    no second pass; cost is the sessionize shape regardless of how many
    conversions a user has. Output is a TOTAL labeling of conversions
    (the attribution-report contract: direct rows are rows, not gaps).

    Returns (id, user, ts, touch_type, touch_id, hours_since_touch) —
    touch_type 'direct' / touch_id NULL / hours NULL when unattributed."""
    keep = [conversion_type] + list(touch_types)
    sub = events.filter(F.col(type_col).isin(keep))
    w = (
        W.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    tid = F.last(F.when(is_touch, F.col(id_col)), ignorenulls=True).over(w)
    tts = F.last(F.when(is_touch, F.col(ts_col)), ignorenulls=True).over(w)
    ttype = F.last(F.when(is_touch, F.col(type_col)), ignorenulls=True).over(w)
    carried = sub.select(
        F.col(id_col),
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("_t"),
        tid.alias("_tid"),
        tts.alias("_tts"),
        ttype.alias("_ttype"),
    ).filter(F.col("_t") == conversion_type)
    hrs = F.round(
        (F.unix_timestamp(F.col("ts")) - F.unix_timestamp(F.col("_tts"))) / 3600.0,
        6,
    )
    attributed = F.col("_tid").isNotNull() & (hrs <= lookback_hours)
    return carried.select(
        F.col(id_col),
        "user",
        "ts",
        F.when(attributed, F.col("_ttype")).otherwise(F.lit("direct"))
        .alias("touch_type"),
        F.when(attributed, F.col("_tid")).alias("touch_id"),
        F.when(attributed, hrs).alias("hours_since_touch"),
    )


def active_user_stats(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """DAU / WAU / stickiness per calendar day — the engagement report
    every events pipeline ships. WAU(d) = distinct users active in the
    trailing `window_days` ending at d, computed WITHOUT a per-day
    distinct-over-range pass: the corpus reduces once to distinct
    (user, day) rows, each row then CONTRIBUTES itself to the
    window_days days it keeps a user active in (an explode of a
    day-sequence — bounded fan-out of window_days on the already-reduced
    frame, the rollup trick), and one countDistinct per day finishes it.
    Days with no events at all are absent (a report over observed days,
    not a gap-filled spine — compose with gap_fill_hourly's pattern if a
    dense spine is needed). Trailing windows that extend past the
    observed range are dropped by the dau join, so every reported day is
    a real day. stickiness = DAU/WAU rounded 6dp — the DAU/MAU-family
    ratio at the weekly grain.

    Scale: one (user, day) distinct shuffle over the raw events, then
    everything is user-day-sized; the explode multiplies by window_days
    (constant), never by traffic. Returns (day, dau, wau, stickiness)."""
    ud = events.select(
        F.to_date(F.col(ts_col)).alias("_d"), F.col(user_col).alias("_u")
    ).distinct()
    dau = ud.groupBy(F.col("_d").alias("day")).agg(F.count("*").alias("dau"))
    contrib = ud.select(
        F.explode(
            F.sequence(
                F.col("_d"), F.date_add(F.col("_d"), window_days - 1)
            )
        ).alias("day"),
        "_u",
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("_u").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day", "dau", "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )
