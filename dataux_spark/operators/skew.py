"""Skew mitigation — the knobs a 100 TB job needs when AQE isn't enough.

Spark's AQE (enabled in get_spark: skewJoin + coalescePartitions) handles
moderate skew by splitting oversized partitions at runtime. These helpers
cover the cases it can't:

  salted_join       — a join key so hot one key exceeds a single task's
                      memory: salt the skewed (large) side N ways, replicate
                      the small side N times. Shuffle becomes uniform at the
                      cost of N× the small side (which must be the SMALL
                      side — if both sides are huge AND skewed on the same
                      hot keys, pre-aggregate or isolate the hot keys first).
  two_stage_agg     — high-cardinality aggregation whose partial-agg hash
                      map thrashes on a hot group: pre-aggregate on
                      (key, salt), then final-aggregate on key. Only valid
                      for algebraic aggs (sum/count/min/max — mergeable
                      partials).

The salt is deterministic (hash of a uniquifying column, not rand()) so
retries/speculative tasks stay consistent — rand() in a shuffle key breaks
exactly-once recomputation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, salt_n: int, uniquifier: str) -> DataFrame:
    """Deterministic salt column in [0, salt_n) from an existing column."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(uniquifier)), F.lit(salt_n)))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_n: int = 8,
    uniquifier: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where `large` is skewed on `on`: salt large, explode-
    replicate small across all salts, join on (key, salt)."""
    uniquifier = uniquifier or large.columns[0]
    lg = with_salt(large, salt_n, uniquifier)
    sm = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    out = lg.join(sm, [on, "_salt"], how)
    return out.drop("_salt")


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str] | None = None,
    count: bool = True,
    salt_n: int = 16,
    uniquifier: str | None = None,
) -> DataFrame:
    """Salted two-stage aggregation for algebraic aggs: stage 1 groups on
    (keys, salt) — hot keys split across salt_n reducers — stage 2 merges
    partials on keys. Output: keys + sum_<c> per sum col + ct if count."""
    sum_cols = sum_cols or []
    uniquifier = uniquifier or df.columns[0]
    salted = with_salt(df, salt_n, uniquifier)
    partial_aggs = [F.sum(c).alias(f"_p_sum_{c}") for c in sum_cols]
    if count:
        partial_aggs.append(F.count("*").alias("_p_ct"))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"_p_sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count:
        final_aggs.append(F.sum("_p_ct").cast("long").alias("ct"))
    return partial.groupBy(*keys).agg(*final_aggs)


def bloom_reduced_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    buckets: int = 1 << 22,
    how: str = "inner",
) -> DataFrame:
    """Semi-join (Bloom-filter) reduction: pre-filter the fact side by the
    dim side's DISTINCT hashed key buckets before the real join — the
    classic distributed-join optimization (Bloomjoin, Mackert & Lohman
    VLDB'86), spelled with one hash function and an exact bucket set.

    Why it matters at 100 TB: a selective dim filter leaves most fact rows
    joinless, yet they all pay the shuffle before the join drops them. The
    bucket set `pmod(xxhash64(key), buckets)` is (a) deduplicated — its
    row count is min(distinct dim keys, buckets), bounded by the literal
    modulus, never by data size, so the broadcast is provably safe (the
    Deduplicate node is the hint audit's boundedness witness) — and (b)
    integers, ~8 bytes/row, broadcastable even when the dim frame itself
    is not. Fact rows whose bucket misses never enter the shuffle; false
    positives (~dim_keys/buckets per fact row) are dropped by the real
    join, so the result is EXACTLY the plain join's. AQE's runtime bloom
    filter does this opportunistically; this spelling is deterministic,
    works under every join strategy, and composes with salted_join.
    """
    kb = F.pmod(F.xxhash64(F.col(on)), F.lit(buckets))
    dim_buckets = dim.select(kb.alias("_kb")).distinct()
    reduced = (
        fact.withColumn("_kb", kb)
        .join(F.broadcast(dim_buckets), "_kb", "leftsemi")
        .drop("_kb")
    )
    return reduced.join(dim, on, how)


def join_cardinality_preflight(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top: int = 10,
) -> DataFrame:
    """Pre-flight skew diagnostic for a planned equi-join: the EXACT
    output cardinality and the keys that dominate it, computed from two
    key censuses instead of running the join — |A ⋈ B| = Σ_k cntA(k) ·
    cntB(k), so the answer costs two map-side-combined censuses plus a
    census-sized key join, never the join's own (possibly exploding)
    output. This is the "should I salt this?" question answered with
    numbers BEFORE the shuffle is paid: a key whose pair product is a
    large share of the total is exactly the key salted_join exists for.

    Returns the top `top` keys by pair contribution:
    (key, n_left, n_right, pairs, share) with share = pairs/total
    rounded 6dp — ordered by (pairs desc, key), deterministic. The total
    is recoverable as pairs/share (or sum the censuses upstream)."""
    la = left.groupBy(F.col(left_key).alias("key")).agg(
        F.count("*").alias("n_left")
    )
    rb = right.groupBy(F.col(right_key).alias("key")).agg(
        F.count("*").alias("n_right")
    )
    pairs = la.join(rb, "key").select(
        "key", "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("pairs"),
    )
    total = pairs.agg(F.sum("pairs").alias("_total"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "key", "n_left", "n_right", "pairs",
            F.round(F.col("pairs") / F.col("_total"), 6).alias("share"),
        )
        .orderBy(F.desc("pairs"), "key")
        .limit(top)
    )
