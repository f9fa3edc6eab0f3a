"""Time-series operator tests: as-of join edge semantics, range join
boundary behavior, sessionization gap logic."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from dataux_spark.operators import timeseries as TS


def _t(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(user_id=1, ts=_t("2024-01-01T10:00:00"), trade="t1"),
            Row(user_id=1, ts=_t("2024-01-01T10:05:00"), trade="t2"),
            Row(user_id=2, ts=_t("2024-01-01T09:00:00"), trade="t3"),
        ]
    )


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            Row(user_id=1, ts=_t("2024-01-01T09:59:00"), px=10.0),
            Row(user_id=1, ts=_t("2024-01-01T10:05:00"), px=11.0),  # equal-ts match
            Row(user_id=2, ts=_t("2024-01-01T09:30:00"), px=99.0),  # after t3 only
        ]
    )


def test_asof_basic_and_equal_ts_inclusive(trades, quotes):
    out = {r.trade: (r.asof_px, r.asof_ts) for r in
           TS.asof_join(trades, quotes, on="user_id", ts="ts", right_cols=["px"]).collect()}
    assert out["t1"] == (10.0, _t("2024-01-01T09:59:00"))
    assert out["t2"] == (11.0, _t("2024-01-01T10:05:00"))  # ts-equal is a match
    assert out["t3"] == (None, None)  # no quote at or before → NULLs


def test_asof_tolerance(trades, quotes):
    out = {r.trade: r.asof_px for r in
           TS.asof_join(trades, quotes, on="user_id", ts="ts",
                        right_cols=["px"], tolerance_sec=30).collect()}
    assert out["t1"] is None      # 60s-old quote > 30s tolerance
    assert out["t2"] == 11.0      # same-instant quote within tolerance


def test_range_join_boundaries(spark):
    vals = spark.createDataFrame([Row(v=float(x)) for x in (0.0, 24.9, 25.0, 49.9, 50.0)])
    ranges = spark.createDataFrame(
        [Row(name="lo", lo=0.0, hi=25.0), Row(name="hi", lo=25.0, hi=50.0)]
    )
    out = sorted((r.v, r.name) for r in
                 TS.range_join(vals, ranges, "v", "lo", "hi", bucket_width=10.0).collect())
    # [lo, hi) semantics: 25.0 belongs to the upper band, 50.0 to none
    assert out == [(0.0, "lo"), (24.9, "lo"), (25.0, "hi"), (49.9, "hi")]


def test_sessionize_gap_logic(spark):
    rows = [
        Row(user_id=1, ts=_t("2024-01-01T10:00:00")),
        Row(user_id=1, ts=_t("2024-01-01T10:10:00")),  # same session (10m)
        Row(user_id=1, ts=_t("2024-01-01T11:00:00")),  # 50m gap → new session
        Row(user_id=2, ts=_t("2024-01-01T08:00:00")),
    ]
    out = TS.sessionize(spark.createDataFrame(rows), gap_minutes=30.0).collect()
    sess = {(r.user_id, r.ts.isoformat()): r.session_id for r in out}
    assert sess[(1, "2024-01-01T10:00:00")] == 1
    assert sess[(1, "2024-01-01T10:10:00")] == 1
    assert sess[(1, "2024-01-01T11:00:00")] == 2
    assert sess[(2, "2024-01-01T08:00:00")] == 1


def test_session_stats(spark):
    rows = [
        Row(user_id=1, ts=_t("2024-01-01T10:00:00")),
        Row(user_id=1, ts=_t("2024-01-01T10:10:00")),
        Row(user_id=1, ts=_t("2024-01-01T11:00:00")),
    ]
    out = TS.session_stats(spark.createDataFrame(rows), gap_minutes=30.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_sessions, r.max_session_events) == (2, 2)
    assert r.avg_session_sec == 300.0  # sessions: 600s and 0s → avg 300


def test_gap_fill_hourly_dense_and_lossless(spark, sf_dir):
    """The filled series is dense (hours x types everywhere in the span)
    and lossless (non-zero buckets equal the sparse aggregation; totals
    sum to the raw total)."""
    from dataux_spark.operators.timeseries import gap_fill_hourly
    from dataux_spark.queries import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    filled = gap_fill_hourly(ev).cache()
    n_hours = filled.select("hour").distinct().count()
    n_types = ev.select("event_type").distinct().count()
    assert filled.count() == n_hours * n_types
    assert filled.groupBy("hour", "event_type").count().agg(
        F.max("count")).first()[0] == 1
    raw_ct = ev.count()
    assert filled.agg(F.sum("ct")).first()[0] == raw_ct
    assert filled.filter(F.col("ct") == 0).count() > 0  # gaps existed and were filled


def test_funnel_counts_monotone_and_ordered(spark):
    """Funnel sanity on a hand-built stream: counts are non-increasing,
    the order requirement is enforced (B before A does not count), and
    the within-window bound applies from the FIRST step's time."""
    import datetime as dt

    from dataux_spark.operators.timeseries import funnel_counts

    t = dt.datetime(2026, 1, 1)

    def ev(uid, typ, minutes):
        return (uid, typ, t + dt.timedelta(minutes=minutes))

    rows = [
        ev(1, "A", 0), ev(1, "B", 10), ev(1, "C", 20),      # full conversion
        ev(2, "A", 0), ev(2, "B", 5),                        # stops at B
        ev(3, "B", 0), ev(3, "A", 10), ev(3, "C", 20),      # B BEFORE A: no B reach
        ev(4, "A", 0), ev(4, "B", 30 * 60),                  # B outside 24h
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {r.step_name: r.n_users for r in funnel_counts(
        df, ["A", "B", "C"], within_hours=24.0).collect()}
    assert out == {"A": 4, "B": 2, "C": 1}


def test_cohort_retention_hand_built(spark):
    import datetime as dt

    from dataux_spark.operators.timeseries import cohort_retention

    t = dt.datetime(2026, 3, 1)
    rows = [
        (1, t), (1, t + dt.timedelta(days=1)),              # day0 + day1
        (2, t), (2, t),                                      # same-day dup: one activity
        (3, t + dt.timedelta(days=1)),                       # later cohort
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r.cohort_day), r.age_days): r.n_users
           for r in cohort_retention(df).collect()}
    assert got == {
        ("2026-03-01", 0): 2,
        ("2026-03-01", 1): 1,
        ("2026-03-02", 0): 1,
    }


def test_session_paths_hand_built(spark):
    import datetime as dt

    from dataux_spark.operators.timeseries import session_paths

    t = dt.datetime(2026, 4, 1)

    def ev(uid, eid, typ, minutes):
        return (uid, eid, typ, t + dt.timedelta(minutes=minutes))

    rows = [
        # session 1 of user 1: A > B > C
        ev(1, 1, "A", 0), ev(1, 2, "B", 5), ev(1, 3, "C", 10),
        # new session (gap > 30): A > B
        ev(1, 4, "A", 120), ev(1, 5, "B", 125),
        # user 2: single-event session contributes nothing
        ev(2, 6, "Z", 0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    got = {(r.path, r.ct) for r in session_paths(df, n=2, k=10).collect()}
    assert got == {("A>B", 2), ("B>C", 1)}


def test_sessionize_matches_python_model_under_random_streams(spark):
    """Random event streams and random gap thresholds: Spark's
    lag+flag+cumsum sessionization must equal a straightforward Python
    scan over the per-user time-sorted events."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from dataux_spark.operators.timeseries import sessionize

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture,
                                     HealthCheck.too_slow])
    @given(
        offsets=st.lists(
            st.tuples(st.integers(1, 3), st.integers(0, 500)),
            min_size=1, max_size=25, unique=True,
        ),
        gap=st.integers(5, 120),
    )
    def run(offsets, gap):
        t0 = dt.datetime(2026, 5, 1)
        rows = [
            (uid, i, t0 + dt.timedelta(minutes=m))
            for i, (uid, m) in enumerate(sorted(set(offsets)))
        ]
        df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
        got = {
            (r.user_id, r.event_id): r.session_id
            for r in sessionize(df, gap_minutes=float(gap)).collect()
        }
        model = {}
        by_user = {}
        for uid, eid, ts in rows:
            by_user.setdefault(uid, []).append((ts, eid))
        for uid, evs in by_user.items():
            evs.sort()
            sid, prev = 0, None
            for ts, eid in evs:
                if prev is None or (ts - prev).total_seconds() > gap * 60:
                    sid += 1
                model[(uid, eid)] = sid
                prev = ts
        assert got == model, (offsets, gap)

    run()


def _ev(spark, rows):
    # rows: (event_id, second_offset, user_id, event_type)
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=base + dt.timedelta(seconds=s),
                user_id=u,
                event_type=t,
            )
            for i, s, u, t in rows
        ]
    )


def test_match_sequence_greedy_first_next(spark):
    # user 1: view@0, click@10, click@20, purchase@30 -> ONE match per
    # anchor; greedy binds click@10, then first purchase after it
    df = _ev(
        spark,
        [(1, 0, 1, "view"), (2, 10, 1, "click"), (3, 20, 1, "click"), (4, 30, 1, "purchase")],
    )
    out = TS.match_sequence(df, ["view", "click", "purchase"], within_hours=1.0).collect()
    assert len(out) == 1
    assert out[0].duration_sec == 30.0


def test_match_sequence_greedy_binding_controls_window(spark):
    # first-next click is EARLY, making the chain end late vs the window
    # measured from the anchor; a feasible later click would not rescue
    # it under greedy (here both fail; asserts the greedy end, not a
    # feasible one, decides)
    df = _ev(
        spark,
        [(1, 0, 1, "view"), (2, 1, 1, "click"), (3, 5000, 1, "purchase")],
    )
    # within 1h: purchase at 5000s > 3600s after anchor -> no match
    assert TS.match_sequence(df, ["view", "click", "purchase"], within_hours=1.0).count() == 0
    # within 2h it completes
    out = TS.match_sequence(df, ["view", "click", "purchase"], within_hours=2.0).collect()
    assert len(out) == 1 and out[0].duration_sec == 5000.0


def test_match_sequence_overlapping_anchors_share_tail(spark):
    df = _ev(
        spark,
        [(1, 0, 1, "view"), (2, 5, 1, "view"), (3, 10, 1, "click"), (4, 20, 1, "purchase")],
    )
    out = TS.match_sequence(df, ["view", "click", "purchase"], within_hours=1.0)
    assert sorted(r.duration_sec for r in out.collect()) == [15.0, 20.0]


def test_match_sequence_repeated_types_bind_distinct_events(spark):
    df = _ev(spark, [(1, 0, 1, "click"), (2, 10, 1, "click")])
    out = TS.match_sequence(df, ["click", "click"], within_hours=1.0).collect()
    # anchor@0 chains to click@10; anchor@10 has no later click
    assert len(out) == 1 and out[0].duration_sec == 10.0


def test_match_sequence_equal_ts_ties_break_by_id(spark):
    # click shares the anchor's timestamp but has a LARGER id -> it is
    # strictly-after in (ts, id) order and the chain completes
    df = _ev(spark, [(1, 0, 1, "view"), (2, 0, 1, "click"), (3, 5, 1, "purchase")])
    out = TS.match_sequence(df, ["view", "click", "purchase"], within_hours=1.0).collect()
    assert len(out) == 1 and out[0].duration_sec == 5.0
    # reversed ids: the click is before the anchor in (ts, id) -> no match
    df2 = _ev(spark, [(2, 0, 1, "view"), (1, 0, 1, "click"), (3, 5, 1, "purchase")])
    assert TS.match_sequence(df2, ["view", "click", "purchase"], within_hours=1.0).count() == 0


def test_match_sequence_users_isolated(spark):
    df = _ev(spark, [(1, 0, 1, "view"), (2, 10, 2, "click"), (3, 20, 1, "purchase")])
    assert TS.match_sequence(df, ["view", "click", "purchase"], within_hours=1.0).count() == 0


def test_match_sequence_single_shuffle_plan(spark):
    df = _ev(spark, [(1, 0, 1, "view"), (2, 10, 1, "click"), (3, 20, 1, "purchase")])
    plan = (
        TS.match_sequence(df, ["view", "click", "purchase"], within_hours=1.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1 and "Join" not in plan


def test_seasonal_profile_flags_wrong_for_slot_value(spark):
    """A value that is normal in absolute terms but wrong for its
    hour-of-day slot flags; the same value in a slot where it IS the norm
    does not. Thin slots (<min_n) are unscored with flag 0."""
    rows = []
    # hour 3: tight baseline around 10.0 (20 obs); hour 14: around 100.0
    for i in range(20):
        rows.append((i, dt.datetime(2024, 1, 1 + i % 5, 3, 0, 0), "m", 10.0 + (i % 3 - 1) * 0.1))
        rows.append((100 + i, dt.datetime(2024, 1, 1 + i % 5, 14, 0, 0), "m", 100.0 + (i % 3 - 1) * 1.0))
    # planted: 100.0 at hour 3 — fine at hour 14, wild at hour 3
    rows.append((999, dt.datetime(2024, 1, 3, 3, 30, 0), "m", 100.0))
    # thin slot: single observation at hour 20 — unscored
    rows.append((555, dt.datetime(2024, 1, 2, 20, 0, 0), "m", 1e9))
    df = spark.createDataFrame(rows, ["event_id", "ts", "key", "value"])
    got = {
        r.event_id: (r.z, r.is_anomaly)
        for r in TS.seasonal_profile_anomalies(
            df, "ts", "key", "value", "event_id", min_n=10, threshold=3.0
        ).collect()
    }
    assert got[999][1] == 1 and got[999][0] > 3.0
    assert got[555] == (None, 0)  # thin slot: unscored, flag 0
    # every in-profile hour-14 value (100-ish baseline) stays unflagged
    assert all(got[100 + i][1] == 0 for i in range(20))


def test_last_touch_attribution_hand_built(spark):
    """Purchase credited to the most recent preceding touch within the
    lookback; outside-lookback and touchless purchases are 'direct';
    equal-ts touch with lower id counts as preceding."""
    rows = [
        # user 1: click -> view -> purchase (credit view), then a
        # purchase 100h later (outside 72h -> direct)
        (1, dt.datetime(2024, 1, 1, 0, 0), 1, "click"),
        (2, dt.datetime(2024, 1, 1, 1, 0), 1, "view"),
        (3, dt.datetime(2024, 1, 1, 2, 0), 1, "purchase"),
        (4, dt.datetime(2024, 1, 5, 6, 0), 1, "purchase"),
        # user 2: purchase with no touches at all
        (5, dt.datetime(2024, 1, 1, 0, 0), 2, "purchase"),
        # user 3: touch at the SAME ts as the purchase, lower id — counts
        (6, dt.datetime(2024, 1, 2, 0, 0), 3, "click"),
        (7, dt.datetime(2024, 1, 2, 0, 0), 3, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {r.event_id: (r.touch_type, r.touch_id, r.hours_since_touch)
           for r in TS.last_touch_attribution(
               df, "purchase", ["click", "view"], lookback_hours=72.0
           ).collect()}
    assert got[3] == ("view", 2, 1.0)
    assert got[4] == ("direct", None, None)  # 101h > 72h lookback
    assert got[5] == ("direct", None, None)
    assert got[6 + 1] == ("click", 6, 0.0)
    assert set(got) == {3, 4, 5, 7}  # total labeling of purchases only


def test_active_user_stats_hand_built(spark):
    """Three days of activity: WAU on day d counts every user active in
    [d-6, d]; stickiness = DAU/WAU; days without events are absent."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 10),
        (2, dt.datetime(2024, 1, 1, 10), 20),
        (3, dt.datetime(2024, 1, 3, 9), 10),       # u10 returns on day 3
        (4, dt.datetime(2024, 1, 20, 9), 30),      # isolated much later
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id"])
    got = {str(r.day): (r.dau, r.wau, r.stickiness)
           for r in TS.active_user_stats(df, "ts", "user_id", 7).collect()}
    assert got["2024-01-01"] == (2, 2, 1.0)
    # day 3: only u10 active; trailing week saw u10 and u20
    assert got["2024-01-03"] == (1, 2, 0.5)
    assert got["2024-01-20"] == (1, 1, 1.0)
    assert "2024-01-02" not in got  # no events that day -> absent
