"""Skew utilities (results identical to unsalted) and the custom-function
registry (reference 'Hackable Functions', README.md:40 / expr.FuncAdd)."""

import pandas as pd
import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql import types as T

from dataux_spark import Engine
from dataux_spark.operators import skew
from dataux_spark.queries import read_table


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows on one hot key, a few hundred elsewhere
    hot = spark.range(10000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(300).select((F.col("id") % 7 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_two_stage_agg_equals_plain(skewed):
    plain = {
        (r.k,): (r.s, r.n)
        for r in skewed.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n")).collect()
    }
    salted = {
        (r.k,): (r.sum_v, r.ct)
        for r in skew.two_stage_agg(skewed, ["k"], sum_cols=["v"], uniquifier="v").collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame([Row(k=k, name=f"dim{k}") for k in range(1, 9)])
    plain = sorted((r.k, r.v, r.name) for r in skewed.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.name) for r in
                    skew.salted_join(skewed, dim, "k", salt_n=8, uniquifier="v").collect())
    assert plain == salted


def test_salt_deterministic(skewed):
    a = skew.with_salt(skewed, 8, "v").select("k", "v", "_salt").collect()
    b = skew.with_salt(skewed, 8, "v").select("k", "v", "_salt").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    salts = {r._salt for r in a}
    assert salts == set(range(8))  # hot key actually spreads across salts


def test_custom_scalar_udf(spark):
    eng = Engine(spark)
    eng.register_memory("u", {"tt": spark.createDataFrame([Row(x=3), Row(x=4)])})
    eng.add_function("triple", lambda x: x * 3 if x is not None else None, T.LongType())
    out = {r[0] for r in eng.sql("SELECT triple(x) AS v FROM tt").collect()}
    assert out == {9, 12}


def test_custom_pandas_udaf(spark, sf_dir):
    eng = Engine(spark)

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v[v > 0]).mean()))

    eng.add_function("geomean", geomean)
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_udaf")
    out = eng.sql(
        "SELECT l_returnflag, round(geomean(l_quantity), 4) AS g FROM li_udaf GROUP BY l_returnflag"
    ).collect()
    assert len(out) == 3
    for r in out:
        assert 1.0 < r.g < 50.0


def test_custom_table_function_lateral(spark, sf_dir):
    """Python UDTF through the engine registry, consumed via LATERAL —
    the table-function completion of §2.9 (reference's only multi-row fn
    is the engine-internal terms() decode)."""
    eng = Engine(spark)

    class WordLens:
        def eval(self, text: str):
            if text:
                for w in sorted(set(text.lower().split()))[:3]:
                    yield w, len(w)

    eng.add_table_function("word_lens", WordLens, "word: string, wlen: int")
    read_table(spark, sf_dir, "documents").limit(5).createOrReplaceTempView("docs_udtf")
    out = eng.sql(
        "SELECT d.doc_id, w.word, w.wlen FROM docs_udtf d, LATERAL word_lens(d.text) w"
    ).collect()
    assert len(out) == 15  # 5 docs × 3 words
    assert all(r.wlen == len(r.word) for r in out)


def test_bloom_reduced_join_equals_plain_join(spark, sf_dir):
    """Bloom reduction must be answer-preserving, must actually reduce the
    fact side pre-shuffle, and its broadcast must sit above a Deduplicate
    (the audit's boundedness witness)."""
    from dataux_spark.operators.skew import bloom_reduced_join
    from dataux_spark.queries import read_table
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice"
    )
    pa = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select(F.col("p_partkey").alias("partkey"), "p_size")
    )
    got = bloom_reduced_join(li, pa, "partkey")
    want = li.join(pa, "partkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() < li.count()  # the filter genuinely dropped fact rows
    analyzed = got._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in analyzed and "Deduplicate" in analyzed


def test_join_preflight_predicts_exact_cardinality(spark):
    from dataux_spark.operators.skew import join_cardinality_preflight

    left = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 3 + [3] * 2], ["lk"])
    right = spark.createDataFrame(
        [(k,) for k in [1] * 4 + [2] * 5 + [9]], ["rk"])
    rows = join_cardinality_preflight(left, right, "lk", "rk").collect()
    got = {r.key: (r.n_left, r.n_right, r.pairs, r.share) for r in rows}
    # exact products; key 9 (right-only) and 3 (left-only) never pair
    assert got[1][:3] == (50, 4, 200) and got[2][:3] == (3, 5, 15)
    assert set(got) == {1, 2}
    # predicted total == the join's actual output cardinality
    predicted = sum(v[2] for v in got.values())
    actual = left.join(right, left.lk == right.rk).count()
    assert predicted == actual == 215
    assert abs(got[1][3] - 200 / 215) < 1e-6  # hottest-key share
