"""Inferential-stats operators vs straightforward Python replays."""

import math

import pytest
from pyspark.sql import functions as F

from dataux_spark.operators import stats
from dataux_spark.queries import read_table


def test_trend_per_group_matches_numpy(spark):
    """Closed-form OLS must match numpy lstsq on a planted frame with a
    known slope per group."""
    import numpy as np

    rows = []
    for g, (a, b) in {"up": (2.0, 1.0), "down": (-0.5, 10.0)}.items():
        for i in range(50):
            x = float(i)
            rows.append((g, x, a * x + b + (0.1 * ((i * 7) % 5 - 2))))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {
        r.g: r for r in stats.trend_per_group(df, ["g"], F.col("x"), F.col("y")).collect()
    }
    for g in ("up", "down"):
        xs = np.array([r[1] for r in rows if r[0] == g])
        ys = np.array([r[2] for r in rows if r[0] == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert out[g].n == 50
        assert abs(out[g].slope - slope) < 1e-6
        assert abs(out[g].intercept - intercept) < 1e-6
        assert abs(out[g].r2 - r * r) < 1e-6


def test_trend_degenerate_groups_null_not_error(spark):
    df = spark.createDataFrame(
        [("one", 1.0, 5.0), ("flat", 3.0, 1.0), ("flat", 3.0, 2.0)],
        "g string, x double, y double",
    )
    out = {r.g: r for r in stats.trend_per_group(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert out["one"].slope is None and out["flat"].slope is None


def test_welch_ttest_matches_python_model(spark, sf_dir):
    """t statistic and Satterthwaite df recomputed in Python from the same
    md5 arm assignment must match exactly (6dp)."""
    import hashlib

    e = read_table(spark, sf_dir, "events")
    out = {r.event_type: r for r in
           stats.welch_ttest(e, ["event_type"], "user_id", "value").collect()}
    rows = e.select("event_type", "user_id", "value").collect()
    arms = {}
    for r in rows:
        arm = int(hashlib.md5(f"{r.user_id}:exp1".encode()).hexdigest()[:8], 16) % 2
        arms.setdefault((r.event_type, arm), []).append(float(r.value))
    for et, got in out.items():
        a0, a1 = arms[(et, 0)], arms[(et, 1)]
        n0, n1 = len(a0), len(a1)
        m0, m1 = sum(a0) / n0, sum(a1) / n1
        s20 = sum((x - m0) ** 2 for x in a0) / (n0 - 1)
        s21 = sum((x - m1) ** 2 for x in a1) / (n1 - 1)
        t = (m1 - m0) / math.sqrt(s20 / n0 + s21 / n1)
        assert (got.n0, got.n1) == (n0, n1)
        assert abs(got.t_stat - t) < 1e-5
        # null split of an iid column: |t| should be unexceptional
        assert abs(got.t_stat) < 4.0


def test_ranking_metrics_hand_example(spark):
    """Known-answer check: 2 queries with hand-computable metrics."""
    ranked = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "x", 1), ("q2", "y", 2)],
        "query_id string, doc_id string, rank int",
    )
    relevant = spark.createDataFrame(
        [("q1", "b"), ("q1", "z"), ("q2", "x"), ("q2", "y")],
        "query_id string, doc_id string",
    )
    out = {r.query_id: r for r in stats.ranking_metrics(ranked, relevant, k=3).collect()}
    # q1: 1 of 2 relevant found, first at rank 2
    assert out["q1"].recall_at_k == 0.5
    assert out["q1"].mrr_at_k == 0.5
    ideal_q1 = 1 / math.log2(2) + 1 / math.log2(3)
    assert abs(out["q1"].ndcg_at_k - (1 / math.log2(3)) / ideal_q1) < 1e-6
    # q2: perfect ranking
    assert out["q2"].recall_at_k == 1.0
    assert out["q2"].mrr_at_k == 1.0
    assert out["q2"].ndcg_at_k == 1.0


def test_ranking_metrics_grades_ann_vs_exact(spark, sf_dir):
    """The intended use: grade an approximate ANN ranking against the
    exact brute-force top-k as ground truth."""
    from dataux_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, q, "embedding", "vec_id", k=5)
    approx = similarity.signband_topk(emb, q, "embedding", "vec_id", k=5)
    ranked = approx.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("neighbor_id").cast("string").alias("doc_id"),
        "rank",
    )
    truth = exact.select(
        F.col("query_id").cast("string").alias("query_id"),
        F.col("neighbor_id").cast("string").alias("doc_id"),
    )
    out = stats.ranking_metrics(ranked, truth, k=5).collect()
    assert len(out) == 10
    mean_recall = sum(r.recall_at_k for r in out) / len(out)
    assert 0.0 < mean_recall <= 1.0
    for r in out:
        assert r.n_rel == 5
