"""Profiling operator tests: column stats and histogram invariants on a
frame with known nulls / duplicates / constant and varying columns."""

from pyspark.sql import functions as F

from dataux_spark.operators.profile import (
    column_profile,
    distribution_drift_psi,
    equi_width_histogram,
)
from dataux_spark.queries import read_table


def test_column_profile_known_frame(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, None, "a"), (3, 30.0, None), (3, 10.0, "b")],
        "k: long, v: double, s: string",
    )
    rows = {r.col_name: r for r in column_profile(df, ["k", "v", "s"]).collect()}
    assert rows["k"].n_rows == 4 and rows["k"].n_nulls == 0
    assert rows["k"].n_distinct == 3
    assert rows["k"].min_val == 1.0 and rows["k"].max_val == 3.0
    assert rows["v"].n_nulls == 1 and rows["v"].n_distinct == 2
    assert rows["v"].min_val == 10.0 and rows["v"].max_val == 30.0
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_val is None and rows["s"].max_val is None


def test_histogram_partitions_all_rows(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    out = equi_width_histogram(d, "n_chars", 10).collect()
    n = d.filter(F.col("n_chars").isNotNull()).count()
    assert sum(r.ct for r in out) == n
    assert all(1 <= r.bucket <= 10 for r in out)
    assert [r.bucket for r in out] == sorted(r.bucket for r in out)
    # contiguous equal-width bounds; max folds into the top bucket
    lo = min(r.lo for r in out)
    hi = max(r.hi for r in out)
    stats = d.agg(F.min("n_chars"), F.max("n_chars")).first()
    assert lo == float(stats[0]) and abs(hi - float(stats[1])) < 1e-6
    widths = {round(r.hi - r.lo, 4) for r in out}
    assert len(widths) == 1


def test_histogram_constant_column_single_bucket(spark):
    """min == max (zero bucket width) is a defined single bucket
    [lo, lo] with the full non-null count — not 0/0 NaN fallout."""
    df = spark.createDataFrame([(7.5,), (7.5,), (7.5,), (None,)], "x double")
    out = equi_width_histogram(df, "x", 10).collect()
    assert len(out) == 1
    b = out[0]
    assert (b.bucket, b.lo, b.hi, b.ct) == (1, 7.5, 7.5, 3)


def test_column_profile_hostile_column_names(spark):
    """Quotes, spaces, dots, and backticks in column names survive the
    stack() interpolation as both identifiers and labels."""
    df = spark.createDataFrame([(1, 2.0), (3, None)], ["o'brien col", "a.b c"])
    rows = {r.col_name: r for r in column_profile(df, ["o'brien col", "a.b c"]).collect()}
    assert rows["o'brien col"].n_distinct == 2
    assert rows["a.b c"].n_nulls == 1
    assert rows["a.b c"].max_val == 2.0

def test_psi_identical_halves_near_zero(spark):
    """Same distribution on both sides → every term 0 (after the eps
    smoothing both p' and q' are equal per bucket)."""
    import math

    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    out = distribution_drift_psi(df, df, "x", bins=10).collect()
    assert len(out) == 10
    assert all(r.psi_term == 0.0 for r in out)
    assert math.isclose(sum(r.p_ref for r in out), 1.0, abs_tol=1e-4)


def test_psi_dense_spine_and_clamping(spark):
    """Buckets empty on one side still appear (dense spine), and current
    values outside the reference range clamp into the edge buckets
    instead of vanishing — both are where drift is LARGEST."""
    ref = spark.createDataFrame([(float(x),) for x in range(0, 100)], "x double")
    # current: everything far above the reference max, plus one below min
    cur = spark.createDataFrame([(500.0,)] * 9 + [(-50.0,)], "x double")
    out = {r.bucket: r for r in distribution_drift_psi(ref, cur, "x", bins=10).collect()}
    assert set(out) == set(range(1, 11))          # dense 1..10 spine
    assert out[10].n_cur == 9 and out[1].n_cur == 1  # clamped to edges
    assert sum(r.n_cur for r in out.values()) == 10  # nothing vanished
    # middle buckets: ref mass present, cur empty → positive PSI terms
    assert all(out[b].psi_term > 0 for b in range(2, 10))
    total = sum(r.psi_term for r in out.values())
    assert total > 0.25  # reads as "drifted" on the standard rule


def test_psi_constant_reference_defined(spark):
    """Zero-width reference range folds everything into bucket 1 on both
    sides — defined output, not 0/0 NaN."""
    ref = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    cur = spark.createDataFrame([(5.0,), (9.0,)], "x double")
    out = {r.bucket: r for r in distribution_drift_psi(ref, cur, "x", bins=10).collect()}
    assert out[1].n_ref == 2 and out[1].n_cur == 2
    assert out[1].psi_term == 0.0


def test_embedding_profile_counts_planted_defects(spark):
    from dataux_spark.operators.profile import embedding_profile

    rows = [
        (1, [3.0, 4.0]),          # norm 5
        (2, [1.0, 0.0]),          # norm 1
        (3, [0.0, 0.0]),          # zero vector
        (4, [float("nan"), 1.0]), # NaN — excluded from norm stats
        (5, [1.0, 2.0, 2.0]),     # wrong dim (norm 3 still computed)
        (6, None),                # null vector
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = embedding_profile(df, "embedding", expected_dim=2).first()
    assert (r.n_vectors, r.wrong_dim, r.null_vectors, r.nan_vectors,
            r.zero_vectors) == (6, 1, 1, 1, 1)
    assert (r.norm_min, r.norm_max) == (0.0, 5.0)


def test_embedding_profile_infers_dim_from_first_vector(spark):
    from dataux_spark.operators.profile import embedding_profile

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    r = embedding_profile(df, "embedding").first()
    assert r.wrong_dim == 1


def test_equi_depth_histogram_balanced_and_total(spark):
    from dataux_spark.operators.profile import equi_depth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["v"])
    rows = equi_depth_histogram(df, "v", bins=4).collect()
    assert [r.bucket for r in rows] == [1, 2, 3, 4]
    assert [r.ct for r in rows] == [25, 25, 25, 25]  # equi-DEPTH
    assert sum(r.ct for r in rows) == 100
    assert rows[0].lo == 1.0 and rows[-1].hi == 100.0
    # edges are contiguous: each bucket's hi is the next one's lo
    for a, b in zip(rows, rows[1:]):
        assert a.hi == b.lo


def test_equi_depth_histogram_skew_beats_width(spark):
    """99 small values + one huge outlier: equi-width crams everything
    into bucket 1; equi-depth still spreads rows across buckets."""
    from dataux_spark.operators.profile import (
        equi_depth_histogram,
        equi_width_histogram,
    )

    vals = [(float(i % 10),) for i in range(99)] + [(1e9,)]
    df = spark.createDataFrame(vals, ["v"])
    width = {r.bucket: r.ct for r in equi_width_histogram(df, "v", bins=4).collect()}
    depth = {r.bucket: r.ct for r in equi_depth_histogram(df, "v", bins=4).collect()}
    assert width[1] == 99  # all mass in one width bucket
    assert len(depth) >= 3 and max(depth.values()) < 99


def test_robust_means_resist_planted_outlier(spark):
    from dataux_spark.operators.profile import robust_mean_report

    base = [("m", float(v)) for v in range(1, 100)]          # mean ~50
    spiked = base + [("m", 1e9)]                             # one bad row
    df = spark.createDataFrame(spiked, ["k", "v"])
    r = robust_mean_report(df, "v", "k", trim=0.05).first()
    assert r.n == 100
    assert r.mean > 1e6                                      # mean destroyed
    assert 40 < r.trimmed_mean < 60                          # robust pair holds
    assert 40 < r.winsorized_mean < 120
    # clean data: all three agree
    clean = robust_mean_report(
        spark.createDataFrame(base, ["k", "v"]), "v", "k", trim=0.05).first()
    assert abs(clean.mean - clean.trimmed_mean) < 3
    assert abs(clean.mean - clean.winsorized_mean) < 3
