"""Inferential statistics over distributed frames — the analysis passes a
data team runs on the SAME engine that built the corpus (trend detection,
experiment readouts, retrieval-quality eval). Beyond-reference extension:
the reference stops at descriptive aggregates (min/max/avg/sum,
cardinality); these are the closed-form inferential counterparts.

Every operator here is AGGREGATE-ONLY by design: the sufficient
statistics (Σx, Σy, Σxy, Σx², counts, variances) are algebraic, so Spark
computes map-side partials and each operator costs exactly one
group-key shuffle of O(groups) rows — no iteration, no driver math, no
UDF. That is what makes them 100 TB-safe: the scan dominates, the
statistics ride for free.

  trend_per_group  — per-group OLS slope/intercept/R² of y over x via the
                     closed-form normal equations. The "is quality
                     drifting per source" / "is volume growing per type"
                     primitive.
  welch_ttest      — two-sample unequal-variance t statistic with
                     Welch-Satterthwaite df, variants assigned by a
                     deterministic hash of the unit key (the standard
                     cluster-safe A/B split).
  ranking_metrics  — retrieval-quality eval (recall@k, MRR@k, nDCG@k) of
                     a ranked result frame against a relevance frame;
                     per-query join + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def trend_per_group(
    df: DataFrame,
    group_cols: list[str],
    x_col,
    y_col,
) -> DataFrame:
    """Per-group simple linear regression by the closed-form normal
    equations: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), intercept = ȳ − b·x̄,
    R² = corr². `x_col`/`y_col` are column expressions (cast numerics —
    e.g. a timestamp as epoch seconds for a time trend).

    One map-side-combined shuffle on the group key; output is O(groups).
    Degenerate groups (n < 2 or zero x-variance) yield NULL slope rather
    than a division error. Returns (group_cols..., n, slope, intercept,
    r2), 6dp-rounded for engine-exact comparison."""
    x = x_col.cast("double").alias("_x")
    y = y_col.cast("double").alias("_y")
    d = df.select(*group_cols, x, y)
    agg = d.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    den_x = n * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = n * F.col("syy") - F.col("sy") * F.col("sy")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(den_x > 0, num / den_x)
    intercept = F.when(den_x > 0, (F.col("sy") - slope * F.col("sx")) / n)
    r2 = F.when((den_x > 0) & (den_y > 0), (num * num) / (den_x * den_y))
    return agg.select(
        *group_cols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def welch_ttest(
    df: DataFrame,
    group_cols: list[str],
    unit_col: str,
    value_col: str,
    salt: str = "exp1",
) -> DataFrame:
    """Per-group two-sample Welch t-test between deterministic hash-split
    variants: unit → arm = md5 bucket of (unit, salt) mod 2 — the
    cluster-safe, replay-stable assignment (same unit, same arm, any
    executor; sampling.py's md5 spelling so any engine — and the driver
    oracle — replays it bit-exactly). t = (m1−m0)/sqrt(v1/n1 + v0/n0)
    with Welch-Satterthwaite degrees of freedom; variances are SAMPLE
    variances.

    One shuffle on (group, variant) sized O(groups·2), then a pivot-style
    conditional aggregate to one row per group. Returns (group_cols...,
    n0, n1, mean0, mean1, t_stat, df), 6dp-rounded."""
    h = F.md5(F.concat(F.col(unit_col).cast("string"), F.lit(f":{salt}")))
    v = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(2)
    ).alias("_arm")
    d = df.select(*group_cols, v, F.col(value_col).cast("double").alias("_val"))
    arm = d.groupBy(*group_cols, "_arm").agg(
        F.count("*").alias("n"),
        F.avg("_val").alias("m"),
        F.var_samp("_val").alias("s2"),
    )
    one = arm.groupBy(*group_cols).agg(
        F.max(F.when(F.col("_arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("_arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("_arm") == 0, F.col("m"))).alias("m0"),
        F.max(F.when(F.col("_arm") == 1, F.col("m"))).alias("m1"),
        F.max(F.when(F.col("_arm") == 0, F.col("s2"))).alias("s20"),
        F.max(F.when(F.col("_arm") == 1, F.col("s2"))).alias("s21"),
    )
    se0 = F.col("s20") / F.col("n0")
    se1 = F.col("s21") / F.col("n1")
    t = (F.col("m1") - F.col("m0")) / F.sqrt(se0 + se1)
    dof = (se0 + se1) * (se0 + se1) / (
        se0 * se0 / (F.col("n0") - 1) + se1 * se1 / (F.col("n1") - 1)
    )
    return one.select(
        *group_cols,
        "n0",
        "n1",
        F.round("m0", 6).alias("mean0"),
        F.round("m1", 6).alias("mean1"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("df"),
    )


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Retrieval-quality eval: `ranked` is (query_id, doc_id, rank)
    (rank 1-based, ≤ k rows per query), `relevant` is the ground-truth
    (query_id, doc_id) set. Per query:

      recall_at_k = |ranked∩relevant| / |relevant|
      mrr_at_k    = 1 / first relevant rank (0 if none)
      ndcg_at_k   = Σ_hit 1/log2(rank+1)  /  Σ_{i=1..min(|rel|,k)} 1/log2(i+1)

    (binary relevance, standard ideal-DCG normalization). One outer join
    on (query_id, doc_id) + two small aggregates — O(queries·k) rows
    throughout, so eval cost is independent of corpus size. Returns
    (query_id, n_rel, recall_at_k, mrr_at_k, ndcg_at_k), 6dp-rounded."""
    rel_n = relevant.groupBy("query_id").agg(F.count("*").alias("n_rel"))
    hits = ranked.filter(F.col("rank") <= k).join(
        relevant.withColumn("_rel", F.lit(1)), ["query_id", "doc_id"], "left"
    )
    per_q = hits.groupBy("query_id").agg(
        F.sum(F.when(F.col("_rel") == 1, 1).otherwise(0)).alias("n_hit"),
        F.min(F.when(F.col("_rel") == 1, F.col("rank"))).alias("first_rank"),
        F.sum(
            F.when(F.col("_rel") == 1, 1.0 / F.log2(F.col("rank") + 1)).otherwise(0.0)
        ).alias("dcg"),
    )
    out = per_q.join(rel_n, "query_id")
    ideal = F.expr(
        f"aggregate(sequence(1, int(least(n_rel, {k}))), cast(0 as double), "
        "(acc, i) -> acc + 1.0 / log2(i + 1))"
    )
    return out.select(
        "query_id",
        "n_rel",
        F.round(F.col("n_hit") / F.col("n_rel"), 6).alias("recall_at_k"),
        F.round(
            F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)), 6
        ).alias("mrr_at_k"),
        F.round(F.col("dcg") / ideal, 6).alias("ndcg_at_k"),
    )
