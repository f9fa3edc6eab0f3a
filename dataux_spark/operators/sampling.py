"""Deterministic sampling & mixture operators for training-data pipelines —
beyond-reference extensions (the reference has no sampling surface).

Everything here is HASH-based, not RNG-based, on purpose:
  - Reproducible: the same (id, seed) always lands in the same split/sample
    on any cluster size, executor count, or retry — rand() cannot promise
    that across task re-execution.
  - Stable under data growth: adding documents never reassigns existing
    ones (the property training pipelines need for incremental ingest).
  - Zero shuffle: split/sample assignment is a pure map over the scan; the
    only exchange in temperature resampling is one tiny per-group count.

The bucket function is the first 8 hex chars of md5(id || ':' || seed)
scaled to [0,1) — exactly expressible in DuckDB for the oracle gate
(Spark `conv(substr(md5(..)...),16,10)` == DuckDB `('0x'||substr(..))::UBIGINT`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = float(2**32)


def hash_frac(id_col: str | Column, seed: int | str = 42) -> Column:
    """Uniform [0,1) fraction from a stable md5 bucket of (id, seed).
    md5 needs an explicit string cast (Spark won't coerce non-strings)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(c.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_BUCKETS)


def hash_frac_sql(id_expr: str, seed: int | str = 42) -> str:
    """The DuckDB spelling of hash_frac — kept adjacent so the two can
    never drift apart silently."""
    return (
        f"(('0x' || substr(md5(CAST({id_expr} AS VARCHAR) || ':{seed}'), 1, 8))::UBIGINT"
        f" / {_BUCKETS:.1f})"
    )


def hash_sample(df: DataFrame, id_col: str, rate: float, seed: int | str = 42) -> DataFrame:
    """Keep ~rate of rows, deterministically. Pure map — no shuffle, and
    the parquet scan's pushed filters/pruning are untouched."""
    return df.filter(hash_frac(id_col, seed) < rate)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: int | str = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative weight bands over the
    hash fraction (train/val/test by default). Weights must sum to 1."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    frac = hash_frac(id_col, seed)
    expr = None
    hi = 0.0
    names = list(weights)
    for name in names[:-1]:
        hi += weights[name]
        expr = F.when(frac < hi, name) if expr is None else expr.when(frac < hi, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int | str = 0,
    n_shards: int = 16,
    shard_col: str = "shard",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global shuffle into training shards — the epoch
    reordering step of a training-data serving pipeline. Each row gets a
    pseudo-random sort key md5(id:seed); shard = its hash-fraction band
    (so shards are contiguous key ranges — a range partition by
    construction, no sampled boundaries) and shard_pos = the row's rank
    within its shard. A new seed is a fresh, reproducible permutation of
    the whole corpus (epoch 0, 1, ...); hash-determinism means task
    retries and cluster resizes can never change the order, unlike
    rand()-keyed shuffles.

    Plan shape: shard assignment is a pure map over the scan; the single
    exchange is the row_number window keyed on the uniform shard id, and
    the within-shard sort is exactly the sort a shard writer needs anyway
    (sortWithinPartitions before write). Cost: one shuffle + one
    O(rows/shard · log) sort, independent of seed.

    Returns df + (shard, shard_pos) — write with
    .repartition(shard_col).sortWithinPartitions(pos_col) to materialize
    epoch files."""
    from pyspark.sql import Window as W

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(c.cast("string"), F.lit(f":{seed}")))
    out = df.withColumn("_h", h).withColumn(
        shard_col,
        F.floor(
            (F.conv(F.substring("_h", 1, 8), 16, 10).cast("bigint") / F.lit(_BUCKETS))
            * F.lit(n_shards)
        ).cast("int"),
    )
    w = W.partitionBy(shard_col).orderBy(F.col("_h"), c)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("_h")


def temperature_resample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    tau: float = 0.5,
    seed: int | str = 42,
) -> DataFrame:
    """Downsample toward a temperature-flattened group mixture (the
    multilingual-corpus balancing move: target share ∝ count^τ, τ<1 lifts
    low-resource groups). Per-group keep probability is count^(τ-1)
    normalized so the rarest group keeps everything — downsampling only,
    never duplication. Selection is hash-deterministic per id.

    Plan shape: one tiny groupBy for counts (group cardinality rows),
    broadcast back; the fact scan is filtered in place — no fact shuffle."""
    c = df.groupBy(group_col).agg(F.count("*").alias("_c"))
    c = c.withColumn("_r", F.pow(F.col("_c").cast("double"), F.lit(tau - 1.0)))
    rmax = c.agg(F.max("_r").alias("_rmax"))
    probs = (
        c.crossJoin(F.broadcast(rmax))
        .select(group_col, (F.col("_r") / F.col("_rmax")).alias("_keep_p"))
    )
    return (
        df.join(F.broadcast(probs), group_col)
        .filter(hash_frac(id_col, seed) < F.col("_keep_p"))
        .drop("_keep_p")
    )


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: int | str = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the language/source-rebalancing
    pass of a corpus mix (e.g. downsample English to 30%, keep all minority
    languages): keep a row iff its hash fraction is below its stratum's
    rate. The rate table rides into the plan as a CASE chain, so this is a
    pure map over the scan like hash_sample — zero shuffle, reproducible,
    append-stable; strata not listed get default_rate (0 = drop)."""
    frac = hash_frac(id_col, seed)
    expr = None
    for name, rate in rates.items():
        cond = F.col(strata_col) == name
        expr = F.when(cond, F.lit(float(rate))) if expr is None else expr.when(cond, F.lit(float(rate)))
    rate_col = F.lit(float(default_rate)) if expr is None else expr.otherwise(F.lit(float(default_rate)))
    return df.filter(frac < rate_col)


def grouped_hash_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float] | None = None,
    seed: int | str = 42,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-controlled split: the hash band is computed on the GROUP
    (source / domain / cluster id), not the row — every row of a group
    lands in the same split, so near-duplicate documents from one source
    cannot straddle train and test (the classic eval-leakage bug a
    row-level split invites). Same zero-shuffle CASE-band mechanics as
    hash_split; weights apply to groups, so realized row proportions
    track group sizes. Mechanically this IS hash_split banded on the
    group column — one band implementation, two key semantics."""
    return hash_split(df, group_col, weights, seed, split_col)


def token_budget_select(
    df: DataFrame,
    token_col: str,
    budgets: dict[str, int],
    group_col: str,
    id_col: str,
    order_col: str | None = None,
    default_budget: int = 0,
) -> DataFrame:
    """Exact data-mixture curation: per group, keep the best documents
    until the group's TOKEN budget is spent (the way pretraining mixtures
    are specified — "30B tokens of code, 5B of forum text" — as opposed
    to the RATE-specified mixes temperature_resample/stratified_hash_sample
    build). Docs are ranked by (order_col DESC, id) — quality-first,
    deterministic tie-break — and a doc is kept iff the running token
    total INCLUDING it stays within budget (so one oversized top doc
    cannot overshoot; groups with budget 0 drop entirely).

    One shuffle on the group key + a per-group running sum. The
    within-group ordered cumsum is the cost at corpus scale — use this
    for exact curation of bounded mixtures; rate-based hash sampling
    (zero shuffle) remains the path when groups are petabyte-sized and
    an approximate mixture suffices.

    Returns the kept rows with `_cum_tokens` (running total) attached.
    """
    from pyspark.sql import Window as W

    order = (
        [F.col(order_col).desc(), F.col(id_col)] if order_col else [F.col(id_col)]
    )
    w = (
        W.partitionBy(group_col)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    budget = F.coalesce(
        *( [F.when(F.col(group_col) == k, F.lit(v)) for k, v in budgets.items()]
           + [F.lit(default_budget)] )
    )
    return (
        df.withColumn("_cum_tokens", F.sum(F.col(token_col)).over(w))
        .filter(F.col("_cum_tokens") <= budget)
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    by: str | None = None,
    seed: int | str = 42,
    priority_col: str = "_priority",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministically — the
    Efraimidis–Spirakis A-ES scheme: each row draws the stable uniform
    u = hash_frac(id, seed) and takes priority u^(1/w); the k largest
    priorities ARE a weighted sample without replacement (their proof:
    P(row i first) = w_i / Σw). Quality-weighted corpus subsetting with
    every hash-based guarantee of this module — reproducible across
    cluster sizes and retries, stable under corpus growth (a new doc
    never changes an existing doc's priority, only the cutoff), and
    streaming-mergeable (top-k of a union = top-k of per-shard top-ks).

    Weights must be > 0 (clamp upstream: greatest(w, 1e-9)).

    Scale shape: priorities are a pure scan projection. Global top-k
    (by=None) plans as TakeOrderedAndProject — per-partition heaps, no
    full sort, no shuffle beyond the k-row gather. Per-group top-k plans
    as one shuffle on the group key + row_number window. The A-ES merge
    property is what makes this the 100 TB weighted sampler: each of
    1000 executors keeps a k-heap; the driver-side merge never sees more
    than 1000·k rows.
    """
    from pyspark.sql import Window as W

    w_ = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    pri = F.pow(hash_frac(id_col, seed), F.lit(1.0) / w_)
    scored = df.withColumn(priority_col, pri)
    if by is None:
        return scored.orderBy(F.col(priority_col).desc(), F.col(id_col)).limit(k)
    rn = F.row_number().over(
        W.partitionBy(by).orderBy(F.col(priority_col).desc(), F.col(id_col))
    )
    return (
        scored.withColumn("_rn", rn)
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str | Column,
    id_col: str,
    k: int,
    seed: int | str = 42,
) -> DataFrame:
    """Per-group diversity cap: keep at most k rows per group, selected
    by the stable md5 order (hash_frac asc, id tiebreak) — the standard
    web-corpus "no domain dominates" pass. Deterministic and
    growth-stable like every sampler here: a new row never evicts an
    existing keeper unless it hashes into the group's top-k. ONE
    shuffle on the group key; Spark plans the rank filter as
    WindowGroupLimit (per-partition partial top-k before the exchange),
    so a hot group never materializes beyond k per map partition."""
    from pyspark.sql import Window as W

    g = F.col(group_col) if isinstance(group_col, str) else group_col
    rn = F.row_number().over(
        W.partitionBy(g).orderBy(hash_frac(id_col, seed), F.col(id_col))
    )
    return df.withColumn("_rn", rn).filter(F.col("_rn") <= k).drop("_rn")


def kfold_assign(
    df: DataFrame, id_col: str, k: int = 5, seed: int | str = 42,
    fold_col: str = "fold",
) -> DataFrame:
    """K-fold cross-validation assignment: fold = the md5 hash band of
    the row id — the same primitive as hash_split, spelled as the CV
    contract (folds 0..k-1, each ~1/k). Deterministic, retry-stable, and
    growth-stable (a new row never moves an old row between folds, so
    fold-i models remain comparable across corpus refreshes — the
    property a random ntile assignment loses). Pure map, no shuffle;
    train/test for fold i = filter(fold != i) / filter(fold == i)."""
    return df.withColumn(
        fold_col, F.floor(hash_frac(id_col, seed) * k).cast("int")
    )


def percentile_rank_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str,
    out_col: str = "pctl",
) -> DataFrame:
    """Quantile-normalize a quality score WITHIN each group — the step
    that makes scores comparable ACROSS corpora before a global
    threshold or mixture weight is applied: a fastText quality of 0.6
    means different things on web crawl vs books, but "top 10% of its
    source" means the same thing everywhere (the cross-corpus
    calibration move quality-filtering pipelines standardize on).

    percent_rank over (group, score, id): the id tie-break makes equal
    scores rank deterministically, so the output is engine-exact rather
    than partition-luck. One group-keyed shuffle; groups rank
    independently, so no global sort exists anywhere. Returns the input
    plus `out_col` in [0, 1] rounded 6dp."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(F.col(score_col), F.col(id_col))
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 6))
