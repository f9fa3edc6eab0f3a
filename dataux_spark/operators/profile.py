"""Table / corpus profiling operators — the ANALYZE-style statistics pass
a pipeline runs before planning a clean (column health, value ranges,
distribution shape). Beyond-reference extension: the reference exposes
schema introspection (SHOW/DESCRIBE) but no data statistics.

Both operators are single-scan, shuffle-light by construction:
  column_profile     — ONE pass over the table computing every column's
                       measures as parallel aggregates (Spark plans
                       multi-distinct aggs via one Expand), then pivots
                       the 1-row result into per-column rows with stack().
                       The only exchange is the 1-row final aggregate.
  equi_width_histogram — bucket = width_bucket over a (lo, hi) range; the
                       range comes from a 1-row min/max aggregate joined
                       back lazily (no driver action), buckets roll up
                       map-side. Two tiny exchanges, both O(bins).
  distribution_drift_psi — population-stability index between a reference
                       and a current slice: one census groupBy per side
                       over a shared fixed bucketing, joined onto a dense
                       O(bins) spine. Two linear scans; everything after
                       the censuses is O(bins) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column health stats in one scan: row count, nulls, exact
    distinct count, and (numeric columns only) min/max as doubles.
    Returns (column, n_rows, n_nulls, n_distinct, min_val, max_val),
    one row per requested column, in the requested order."""
    dtypes = dict(df.dtypes)
    # column names are interpolated into column refs and the stack() SQL
    # string: every reference is backticked (a bare string would be
    # parsed as a dotted path) and the label is a quote-escaped literal,
    # so names with quotes/spaces/dots/backticks survive as both
    # identifiers and labels
    esc = lambda s: s.replace("\\", "\\\\").replace("'", "\\'")  # noqa: E731
    bt = lambda s: "`" + s.replace("`", "``") + "`"  # noqa: E731
    aggs = [F.count("*").alias("__n_rows")]
    for c in cols:
        base = dtypes[c].split("(")[0]
        col = F.col(bt(c))
        aggs.append(F.count(col).alias(f"__{c}__nn"))
        aggs.append(F.countDistinct(col).alias(f"__{c}__nd"))
        if base in _NUMERIC:
            aggs.append(F.min(col).cast("double").alias(f"__{c}__mn"))
            aggs.append(F.max(col).cast("double").alias(f"__{c}__mx"))
    one = df.agg(*aggs)
    parts = []
    for c in cols:
        base = dtypes[c].split("(")[0]
        mn = bt(f"__{c}__mn") if base in _NUMERIC else "CAST(NULL AS DOUBLE)"
        mx = bt(f"__{c}__mx") if base in _NUMERIC else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{esc(c)}', {bt(f'__{c}__nn')}, {bt(f'__{c}__nd')}, {mn}, {mx}")
    stacked = one.select(
        "__n_rows",
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) "
            "AS (col_name, __nn, n_distinct, min_val, max_val)"
        ),
    )
    return stacked.select(
        "col_name",
        F.col("__n_rows").alias("n_rows"),
        (F.col("__n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_val",
        "max_val",
    )


def equi_width_histogram(
    df: DataFrame, col: str, bins: int = 10
) -> DataFrame:
    """Equi-width histogram over [min, max] — the distribution-shape
    profile (length distributions, score spreads). Bucket membership uses
    the explicit floor formula least(bins, 1 + floor((x-lo)/w)) rather
    than width_bucket, so an oracle on any engine can reproduce the exact
    boundary behavior by spelling the identical double arithmetic. The
    max value folds into the top bucket; empty buckets are absent (no
    dense spine needed for a profile). A constant column (min == max,
    zero bucket width) is a defined single bucket [lo, lo] holding the
    full non-null count, not the engine-dependent 0/0 fallout. Returns
    (bucket, lo, hi, ct) ordered by bucket."""
    rng = df.agg(
        F.min(F.col(col)).cast("double").alias("__lo"),
        F.max(F.col(col)).cast("double").alias("__hi"),
    )
    x = F.col(col).cast("double")
    w = (F.col("__hi") - F.col("__lo")) / bins
    bucket = F.when(F.col("__hi") == F.col("__lo"), F.lit(1).cast("bigint")).otherwise(
        F.least(F.lit(bins).cast("bigint"), (F.lit(1) + F.floor((x - F.col("__lo")) / w)).cast("bigint"))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .join(F.broadcast(rng))
        .select(bucket.alias("bucket"), "__lo", "__hi")
        .groupBy("bucket", "__lo", "__hi")
        .agg(F.count("*").alias("ct"))
        .select(
            "bucket",
            F.round(F.col("__lo") + (F.col("bucket") - 1) * w, 6).alias("lo"),
            F.round(F.col("__lo") + F.col("bucket") * w, 6).alias("hi"),
            "ct",
        )
        .orderBy("bucket")
    )


def distribution_drift_psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference corpus slice and a
    current one — the drift monitor a training-data pipeline runs when a
    new crawl batch lands (did the length/quality/score distribution
    move?). Bucket edges are FIXED from the reference frame's min/max
    (the deployed binning), both sides are bucketed with the identical
    clamped floor formula least(bins, greatest(1, 1+floor((x-lo)/w))) —
    current values outside the reference range fold into the edge
    buckets — and per-bucket proportions are smoothed with `eps` before
    the log so empty buckets contribute a finite term. PSI term per
    bucket = (p'-q')*ln(p'/q') with p' = max(p, eps); sum the column for
    the headline index (rule of thumb: <0.1 stable, >0.25 drifted).

    A dense 1..bins spine (explode(sequence) on the 1-row range frame)
    carries buckets absent from either side: dropping them would
    silently under-report drift exactly when it is largest.

    Plan shape: 1-row min/max aggregate on ref, broadcast into both
    census scans; one groupBy per side on the bucket key; spine join and
    proportion window all run on O(bins) rows. Nothing downstream of the
    two linear scans depends on data size.

    Returns (bucket, n_ref, n_cur, p_ref, q_cur, psi_term) ordered by
    bucket, proportions and terms rounded to 6dp."""
    from pyspark.sql import Window

    rng = ref.agg(
        F.min(F.col(col)).cast("double").alias("__lo"),
        F.max(F.col(col)).cast("double").alias("__hi"),
    )
    w = (F.col("__hi") - F.col("__lo")) / bins

    def census(df: DataFrame, out: str) -> DataFrame:
        x = F.col(col).cast("double")
        bucket = F.when(
            F.col("__hi") == F.col("__lo"), F.lit(1).cast("bigint")
        ).otherwise(
            F.least(
                F.lit(bins).cast("bigint"),
                F.greatest(
                    F.lit(1).cast("bigint"),
                    (F.lit(1) + F.floor((x - F.col("__lo")) / w)).cast("bigint"),
                ),
            )
        )
        return (
            df.filter(F.col(col).isNotNull())
            .join(F.broadcast(rng))
            .groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias(out))
        )

    spine = rng.select(
        F.explode(F.sequence(F.lit(1).cast("bigint"), F.lit(bins).cast("bigint"))).alias("bucket")
    )
    joined = (
        spine.join(census(ref, "__nr"), "bucket", "left")
        .join(census(cur, "__nc"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("__nr", F.lit(0)).alias("n_ref"),
            F.coalesce("__nc", F.lit(0)).alias("n_cur"),
        )
    )
    all_rows = Window.partitionBy()
    p = F.col("n_ref") / F.sum("n_ref").over(all_rows)
    q = F.col("n_cur") / F.sum("n_cur").over(all_rows)
    ps, qs = F.greatest(p, F.lit(eps)), F.greatest(q, F.lit(eps))
    return (
        joined.select(
            "bucket",
            "n_ref",
            "n_cur",
            F.round(p, 6).alias("p_ref"),
            F.round(q, 6).alias("q_cur"),
            F.round((ps - qs) * F.log(ps / qs), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


def embedding_profile(
    df: DataFrame,
    vec_col: str = "embedding",
    expected_dim: int | None = None,
) -> DataFrame:
    """Vector-column QA — the gate an embeddings table passes BEFORE any
    ANN/cluster/dedup run spends a shuffle on it: counts of wrong-
    dimension, NULL, NaN-bearing, and zero-norm vectors, plus the norm
    range (an un-normalized batch from a different encoder shows up as a
    norm_max excursion long before it poisons cosine math downstream).

    One scan, zero shuffles until the final 1-row aggregate: dim/NaN/norm
    are JVM higher-order expressions (size / exists / aggregate) in the
    scan projection. Per-vector norms round to 6dp so the report is
    engine-reproducible. expected_dim=None takes wrong_dim from the
    FIRST vector's dimension via a 1-row broadcast instead of a constant
    — at 100 TB prefer passing the known constant and saving that pass.

    Returns one row: (n_vectors, wrong_dim, null_vectors, nan_vectors,
    zero_vectors, norm_min, norm_avg, norm_max)."""
    v = F.col(vec_col)
    norm = F.round(
        F.sqrt(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
        ),
        6,
    )
    has_nan = F.exists(v, lambda x: F.isnan(x))
    per = df.select(
        v.isNull().cast("int").alias("_null"),
        F.when(v.isNull(), None).otherwise(F.size(v)).alias("_dim"),
        F.when(v.isNull(), None).otherwise(has_nan.cast("int")).alias("_nan"),
        F.when(v.isNull() | has_nan, None).otherwise(norm).alias("_norm"),
    )
    if expected_dim is None:
        first = per.filter(F.col("_dim").isNotNull()).select(
            F.col("_dim").alias("_exp")
        ).limit(1)
        per = per.crossJoin(F.broadcast(first))
    else:
        per = per.withColumn("_exp", F.lit(int(expected_dim)))
    return per.agg(
        F.count("*").alias("n_vectors"),
        F.coalesce(
            F.sum((F.col("_dim") != F.col("_exp")).cast("int")), F.lit(0)
        ).alias("wrong_dim"),
        F.sum("_null").alias("null_vectors"),
        F.coalesce(F.sum("_nan"), F.lit(0)).alias("nan_vectors"),
        F.coalesce(
            F.sum((F.col("_norm") == 0.0).cast("int")), F.lit(0)
        ).alias("zero_vectors"),
        F.round(F.min("_norm"), 6).alias("norm_min"),
        F.round(F.avg("_norm"), 6).alias("norm_avg"),
        F.round(F.max("_norm"), 6).alias("norm_max"),
    )


def equi_depth_histogram(
    df: DataFrame, col: str, bins: int = 10
) -> DataFrame:
    """Equi-DEPTH histogram — quantile-edge bins, each holding ~1/bins of
    the rows: the binning a feature pipeline wants when the distribution
    is skewed and equi-width above would put 98% of rows in one bucket.
    This is also the optimizer's histogram of choice (equi-depth is what
    engines keep in table stats) and the curriculum-binning primitive
    (difficulty deciles).

    Edges are EXACT interpolated percentiles (Spark percentile ==
    DuckDB quantile_cont, the parity quality_quantile_filter already
    pins), computed in ONE 1-row aggregate pass and broadcast back —
    never an ntile window, which would globally sort every row through
    a single partition. Bucket i (1-based) spans [edge_{i-1}, edge_i);
    membership = count of edges <= x among the interior edges, so a row
    equal to an interior edge belongs to the bucket ABOVE it and the max
    row folds into the top bucket. Edges round 9dp before compare so
    assignment is engine-exact. Duplicate-valued edges (heavy ties)
    leave earlier buckets empty rather than redistributing — absent rows
    in the output, same contract as equi-width. Returns
    (bucket, lo, hi, ct) ordered by bucket, non-null rows only."""
    pcts = [i / bins for i in range(bins + 1)]
    edges = df.agg(
        F.percentile(F.col(col).cast("double"), F.lit(pcts)).alias("__e")
    ).select(F.transform(F.col("__e"), lambda e: F.round(e, 9)).alias("__e"))
    x = F.round(F.col(col).cast("double"), 9)
    # interior edges only: edges 1..bins-1; membership = 1 + #{e_i <= x}
    interior = F.slice(F.col("__e"), 2, bins - 1)
    bucket = (
        F.lit(1)
        + F.aggregate(
            interior,
            F.lit(0),
            lambda acc, e: acc + F.when(x >= e, 1).otherwise(0),
        )
    ).cast("bigint")
    return (
        df.filter(F.col(col).isNotNull())
        .join(F.broadcast(edges))
        .select(bucket.alias("bucket"), "__e")
        .groupBy("bucket", "__e")
        .agg(F.count("*").alias("ct"))
        .select(
            "bucket",
            F.element_at(F.col("__e"), F.col("bucket").cast("int")).alias("lo"),
            F.element_at(F.col("__e"), (F.col("bucket") + 1).cast("int")).alias("hi"),
            "ct",
        )
        .orderBy("bucket")
    )


def robust_mean_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    trim: float = 0.05,
) -> DataFrame:
    """Outlier-robust per-group location report — plain mean, TRIMMED
    mean (rows outside the [trim, 1-trim] quantile band dropped), and
    WINSORIZED mean (the same rows clamped to the band edges) — the
    metric triple a monitoring pipeline reports when a value column
    carries fat tails (a single bad sensor/scraper row moves the mean;
    it cannot move the trimmed or winsorized one by more than the band).

    Per-group band edges come from ONE grouped exact-percentile
    aggregate (the quantile_cont == percentile parity the equi-depth
    histogram already pins) joined back on the group key — bounded by
    group cardinality, never an ntile sort; the second pass is plain
    conditional aggregation in the scan projection. Edges round 9dp
    before the compare, means 6dp, so the report is engine-exact.
    Returns (group, n, mean, trimmed_mean, winsorized_mean)."""
    v = F.col(value_col).cast("double")
    edges = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.round(F.percentile(v, F.lit(float(trim))), 9).alias("_lo"),
        F.round(F.percentile(v, F.lit(1.0 - float(trim))), 9).alias("_hi"),
    )
    x = F.round(v, 9)
    inside = (x >= F.col("_lo")) & (x <= F.col("_hi"))
    clamped = F.least(F.greatest(x, F.col("_lo")), F.col("_hi"))
    return (
        df.filter(v.isNotNull())
        .join(edges, F.col(group_col) == F.col("_g"))
        .groupBy(F.col(group_col).alias("group"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(v), 6).alias("mean"),
            F.round(F.avg(F.when(inside, x)), 6).alias("trimmed_mean"),
            F.round(F.avg(clamped), 6).alias("winsorized_mean"),
        )
    )
