"""Deterministic sampling: the properties training pipelines rely on —
reproducibility, stability under data growth, downsample-only mixtures."""

from pyspark.sql import functions as F

from dataux_spark.operators.sampling import (
    hash_frac,
    hash_sample,
    hash_split,
    temperature_resample,
)
from dataux_spark.queries import read_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return read_table(spark, SF, "documents")


def test_split_deterministic_and_exhaustive(spark):
    d = _docs(spark)
    a = {r.doc_id: r.split for r in hash_split(d, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(d, "doc_id").collect()}
    assert a == b  # same seed → identical assignment
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == d.count()  # every row assigned exactly once


def test_split_stable_under_growth(spark):
    """Adding rows never reassigns existing ones — the hash property rand()
    lacks."""
    d = _docs(spark)
    half = d.filter(F.col("doc_id") % 2 == 0)
    full_assign = {r.doc_id: r.split for r in hash_split(d, "doc_id").collect()}
    half_assign = {r.doc_id: r.split for r in hash_split(half, "doc_id").collect()}
    assert all(full_assign[k] == v for k, v in half_assign.items())


def test_seed_changes_assignment(spark):
    d = _docs(spark)
    a = {r.doc_id: r.split for r in hash_split(d, "doc_id", seed=1).collect()}
    b = {r.doc_id: r.split for r in hash_split(d, "doc_id", seed=2).collect()}
    assert a != b


def test_hash_sample_rate_and_subset(spark):
    d = _docs(spark)
    n = d.count()
    s10 = hash_sample(d, "doc_id", 0.10)
    s50 = hash_sample(d, "doc_id", 0.50)
    assert 0 < s10.count() < s50.count() < n
    # nested rates: the 10% sample is a strict subset of the 50% sample
    ids10 = {r.doc_id for r in s10.select("doc_id").collect()}
    ids50 = {r.doc_id for r in s50.select("doc_id").collect()}
    assert ids10 <= ids50


def test_temperature_downsamples_toward_flat(spark):
    d = _docs(spark)
    before = {r.lang: r.ct for r in d.groupBy("lang").agg(F.count("*").alias("ct")).collect()}
    after = {
        r.lang: r.ct
        for r in temperature_resample(d, "doc_id", "lang", tau=0.5)
        .groupBy("lang")
        .agg(F.count("*").alias("ct"))
        .collect()
    }
    assert set(after) == set(before)
    assert all(after[g] <= before[g] for g in before)  # never upsamples
    rare = min(before, key=before.get)
    assert after[rare] == before[rare]  # rarest group keeps everything
    # imbalance strictly shrinks
    ratio = lambda c: max(c.values()) / min(c.values())  # noqa: E731
    assert ratio(after) < ratio(before)


def test_hash_frac_in_unit_interval(spark):
    d = _docs(spark)
    row = d.select(
        F.min(hash_frac("doc_id")).alias("lo"), F.max(hash_frac("doc_id")).alias("hi")
    ).collect()[0]
    assert 0.0 <= row.lo and row.hi < 1.0


def test_epoch_shuffle_is_a_permutation_and_seed_sensitive(spark):
    """Every row appears exactly once; shard_pos is 1..k dense per shard;
    different seeds give different orders, same seed is stable."""
    from dataux_spark.operators.sampling import epoch_shuffle

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, "doc_id", seed=0, n_shards=4).collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # stable under recomputation, different under a new seed
    again = epoch_shuffle(df, "doc_id", seed=0, n_shards=4).collect()
    assert {(r.doc_id, r.shard, r.shard_pos) for r in again} == {
        (r.doc_id, r.shard, r.shard_pos) for r in out
    }
    other = epoch_shuffle(df, "doc_id", seed=1, n_shards=4).collect()
    assert {(r.doc_id, r.shard, r.shard_pos) for r in other} != {
        (r.doc_id, r.shard, r.shard_pos) for r in out
    }


def test_stratified_hash_sample_membership_rule(spark, sf_dir):
    """Membership must follow the per-stratum hash rule exactly: a kept
    row's fraction is below its stratum rate, a dropped row's is not; an
    unlisted stratum uses default_rate."""
    from dataux_spark.operators.sampling import hash_frac, stratified_hash_sample

    d = read_table(spark, sf_dir, "documents")
    rates = {"en": 0.3, "de": 1.0, "zh": 0.5}
    kept = stratified_hash_sample(d, "lang", rates, "doc_id", default_rate=0.1)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    rows = d.select("doc_id", "lang", hash_frac("doc_id").alias("f")).collect()
    for r in rows:
        want = r.f < rates.get(r.lang, 0.1)
        assert (r.doc_id in kept_ids) == want, (r.doc_id, r.lang, r.f)
    # de keeps everything; en is visibly downsampled
    n_de = d.filter(F.col("lang") == "de").count()
    assert kept.filter(F.col("lang") == "de").count() == n_de
    n_en = d.filter(F.col("lang") == "en").count()
    assert kept.filter(F.col("lang") == "en").count() < n_en


def test_grouped_split_no_group_straddles(spark, sf_dir):
    """Every group must land wholly in one split — the leakage guarantee —
    and the assignment must be the group-keyed hash band."""
    from dataux_spark.operators.sampling import grouped_hash_split, hash_frac

    d = read_table(spark, sf_dir, "documents")
    out = grouped_hash_split(d, "source")
    per_group = out.groupBy("source").agg(
        F.countDistinct("split").alias("n_splits")
    ).collect()
    assert per_group and all(r.n_splits == 1 for r in per_group)
    fr = {r.source: r.f for r in d.select("source").distinct()
          .withColumn("f", hash_frac("source")).collect()}
    for r in out.select("source", "split").distinct().collect():
        want = "train" if fr[r.source] < 0.9 else ("val" if fr[r.source] < 0.95 else "test")
        assert r.split == want


def test_token_budget_select_exact_boundary(spark):
    """Keep-while-cumsum-fits semantics: the doc that would overshoot the
    budget is dropped even if later smaller docs would have fit (ranked
    prefix, not knapsack); zero-budget groups drop entirely; tie-break on
    id is deterministic."""
    from dataux_spark.operators.sampling import token_budget_select

    rows = [
        # lang, id, quality(order), tokens
        ("en", 1, 9.0, 50),
        ("en", 2, 8.0, 40),
        ("en", 3, 7.0, 30),   # cum 120 > 100 -> dropped
        ("en", 4, 6.0, 5),    # later + smaller, still dropped (prefix rule)
        ("de", 5, 5.0, 10),
        ("zh", 6, 5.0, 10),   # default budget 0 -> dropped
    ]
    df = spark.createDataFrame(rows, "lang string, id long, q double, tok long")
    got = {
        r.id: r._cum_tokens
        for r in token_budget_select(
            df, "tok", {"en": 100, "de": 10}, "lang", "id", order_col="q"
        ).collect()
    }
    assert got == {1: 50, 2: 90, 5: 10}
    # equal quality -> smaller id wins the remaining budget
    tie = spark.createDataFrame(
        [("en", 1, 1.0, 60), ("en", 2, 1.0, 60)], "lang string, id long, q double, tok long"
    )
    kept = [r.id for r in token_budget_select(
        tie, "tok", {"en": 60}, "lang", "id", order_col="q").collect()]
    assert kept == [1]


def test_weighted_priority_sample_properties(spark):
    """A-ES weighted sampling: (a) priorities are stable under corpus
    growth — new rows never change an existing row's priority, only the
    cutoff; (b) weight bias is real — heavily-weighted rows are sampled
    far more often than light ones; (c) the shard-merge property holds —
    top-k of the union equals top-k of the per-shard top-ks."""
    from dataux_spark.operators.sampling import weighted_priority_sample

    rows = [(i, 10.0 if i % 10 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id: long, w: double")

    # (a) growth stability: same ids keep identical priorities
    small = weighted_priority_sample(df.filter("id < 500"), "id", "w", 500)
    big = weighted_priority_sample(df, "id", "w", 1000)
    p_small = {r.id: r._priority for r in small.collect()}
    p_big = {r.id: r._priority for r in big.collect()}
    assert all(p_big[i] == p for i, p in p_small.items())

    # (b) weight bias: 10%% of rows carry 10x weight => they hold far
    # more than 10%% of a k=200 sample (expected share w/(w+9) ~ 53%%)
    top = weighted_priority_sample(df, "id", "w", 200).collect()
    heavy = sum(1 for r in top if r.w == 10.0)
    assert heavy > 60  # 3x their population share; far above noise

    # (c) merge property: union top-k == top-k of per-shard top-ks
    shards = [df.filter(f"id % 4 = {s}") for s in range(4)]
    merged_input = shards[0].sparkSession.createDataFrame(
        [r for s in shards
         for r in weighted_priority_sample(s, "id", "w", 50).collect()],
        weighted_priority_sample(shards[0], "id", "w", 50).schema,
    )
    from_merge = {r.id for r in
                  merged_input.orderBy(F.col("_priority").desc(), "id")
                  .limit(50).collect()}
    direct = {r.id for r in weighted_priority_sample(df, "id", "w", 50).collect()}
    assert from_merge == direct

    # global top-k path plans as a sort-limit (TakeOrderedAndProject),
    # never a full sort
    plan = weighted_priority_sample(df, "id", "w", 50)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_kfold_partition_and_growth_stability(spark):
    from dataux_spark.operators.sampling import kfold_assign

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    folds = kfold_assign(df, "doc_id", k=5)
    got = {r.fold: r.ct for r in
           folds.groupBy("fold").agg(F.count("*").alias("ct")).collect()}
    assert set(got) == {0, 1, 2, 3, 4}          # every fold populated
    assert sum(got.values()) == 1000            # a partition, not a sample
    assert max(got.values()) < 2 * min(got.values())  # roughly balanced
    # growth-stable: assignments on a subset are identical
    sub = kfold_assign(df.filter("doc_id < 500"), "doc_id", k=5)
    full = {r.doc_id: r.fold for r in folds.filter("doc_id < 500").collect()}
    assert {r.doc_id: r.fold for r in sub.collect()} == full


def test_percentile_rank_normalize_cross_group_comparable(spark):
    from dataux_spark.operators.sampling import percentile_rank_normalize

    # two groups with wildly different score scales: the top item of each
    # lands at pctl 1.0, making one global threshold meaningful
    rows = [(1, "web", 0.1), (2, "web", 0.2), (3, "web", 0.3),
            (4, "books", 100.0), (5, "books", 200.0), (6, "books", 300.0)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "score"])
    got = {r.doc_id: r.pctl for r in percentile_rank_normalize(
        df, "score", "source", "doc_id").collect()}
    assert got[3] == got[6] == 1.0
    assert got[1] == got[4] == 0.0
    assert got[2] == got[5] == 0.5
    # deterministic tie order: equal scores rank by id
    tie = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 5.0), (3, "g", 5.0)], ["doc_id", "source", "score"])
    t = {r.doc_id: r.pctl for r in percentile_rank_normalize(
        tie, "score", "source", "doc_id").collect()}
    assert t == {1: 0.0, 2: 0.5, 3: 1.0}
