"""Round-9 scale gates: the key-cardinality growth rule and the
combination-blocking hamming join.

Background (SCALE.md rounds 8-9): a candidate-generation equi-join whose
key space does not grow with the data is quadratic at corpus scale no
matter how linear it probes at test scale — the key space dwarfs the test
corpus, so wall-clock ratios cannot see it. These tests pin (a) the gate
rule itself, (b) that the gate catches a deliberately re-broken
fixed-cardinality blocking call, and (c) that the WWW'07 combination
blocking that replaced the fixed single-chunk hamming banding is complete
(bit-identical to brute force) while its key space actually grows.
"""

import pytest
from pyspark.sql import functions as F

from dataux_spark.operators import dedup
from dataux_spark.queries import read_table
from tools.scale_probe import KEY_FRAMES, growth_ok, key_growth_report, repeat_docs

# multi-minute suite: excluded from the inner-loop fast path
# (`pytest -m "not slow"`); the full unmarked run remains the gate
pytestmark = pytest.mark.slow


def test_growth_rule_boundaries():
    # fixed key space under 10x data growth: fail
    assert not growth_ok(256, 256, 500, 5000)
    # linear key growth: pass
    assert growth_ok(1000, 10000, 500, 5000)
    # sqrt growth (IVF cell sizing) under 4x data: pass
    assert growth_ok(23, 45, 500, 2000)
    # sub-sqrt growth under 10x data: fail
    assert not growth_ok(1000, 1500, 500, 5000)
    # no meaningful data growth: nothing to measure, pass
    assert growth_ok(10, 10, 500, 600)


def test_gate_catches_rebroken_linkage(spark):
    """The r8 linkage fix replaced nation-only blocking (25 fixed keys)
    with (nation, symmetric-delete key) blocking. Re-break it on purpose —
    key = the block column alone — and the gate must flag it, while the
    shipped symdelete frame passes."""

    def rebroken(spark_, sf_dir):
        return read_table(spark_, sf_dir, "customer").select(
            F.col("c_nationkey").alias("key")
        )

    frames = {
        "rebroken_nation_block": rebroken,
        "linkage_symdelete_keys": KEY_FRAMES["linkage_symdelete_keys"],
    }
    rep = {
        r["frame"]: r
        for r in key_growth_report(
            spark, "/root/testdata/sf0.001", "/root/testdata/sf0.01", frames
        )
    }
    assert not rep["rebroken_nation_block"]["ok"]
    assert rep["linkage_symdelete_keys"]["ok"]


def test_hamming_combination_blocking_complete_vs_bruteforce(spark):
    """Completeness pin: combination blocking (chunks=8, d=3) must return
    EXACTLY the brute-force pair set — the WWW'07 guarantee (a pair with
    ≤ d dirty bits has ≥ chunks−d clean chunks, so some combination
    matches) composed with the exact bit_count verify. Hashes are crafted
    so pairs exist at every distance 0..5, straddling the threshold."""
    base = 0x5A5A_1234_ABCD_0F0F
    rows = [(0, base)]
    flips = [1, 7, 13, 21, 33, 47]  # cumulative bit flips: distance 1..6 from base
    h = base
    for i, b in enumerate(flips, start=1):
        h = h ^ (1 << b)
        rows.append((i, h))
    # plus far-away noise rows
    rows += [(100 + i, (base * (i + 3)) & ((1 << 64) - 1)) for i in range(20)]
    df = spark.createDataFrame(
        [(i, v - (1 << 64) if v >= (1 << 63) else v) for i, v in rows],
        ["_id", "h"],
    )
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.hamming_pairs(df, "h", max_hamming=3, chunks=8).collect()
    }
    assert got == brute
    assert brute, "fixture must actually contain pairs within distance 3"


@pytest.mark.parametrize("chunks,d", [(4, 3), (8, 3), (8, 1), (8, 0), (16, 3)])
def test_hamming_completeness_across_configs(spark, chunks, d):
    """The WWW'07 guarantee must hold for EVERY (chunks, max_hamming)
    the API admits — including the degenerate single-combination d=0
    (join on the whole hash) and the old 4-chunk granularity: the pair
    set always equals brute force at distance ≤ d."""
    import random

    rng = random.Random(chunks * 100 + d)
    base = rng.getrandbits(63)
    rows = [(0, base)]
    h = base
    for i in range(1, 6):  # chain of single-bit flips: distances 1..5
        h ^= 1 << rng.randrange(64)
        rows.append((i, h & ((1 << 63) - 1)))
    rows += [(100 + i, rng.getrandbits(63)) for i in range(15)]
    df = spark.createDataFrame(rows, ["_id", "h"])
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h"))).alias("hm"),
        )
        .filter(F.col("hm") <= d)
        .collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in dedup.hamming_pairs(df, "h", max_hamming=d, chunks=chunks).collect()
    }
    assert got == brute


def test_hamming_invalid_configs_raise(spark):
    df = spark.createDataFrame([(1, 5)], ["_id", "h"])
    with pytest.raises(ValueError, match="must exceed max_hamming"):
        dedup.hamming_pairs(df, "h", max_hamming=4, chunks=4)
    with pytest.raises(ValueError, match="must divide 64"):
        dedup.hamming_pairs(df, "h", max_hamming=3, chunks=7)


def test_hamming_keyspace_grows_where_single_chunk_saturates(spark):
    """The shrunk-keyspace probe (VERDICT r8 item 1), as a pinned test:
    with 8-bit chunks the OLD single-chunk pigeonhole key space is
    chunks·2^8 = 2048 — saturated by a few thousand rows, where the NEW
    (chunks−d)-chunk combination keys keep growing. Measured on the same
    random-hash frames at n and 4n: the old scheme's distinct keys
    plateau (growth rule fails) while candidate pairs grow ~quadratic;
    the new scheme's keys grow ~linearly and candidates stay ~flat."""
    chunks, width, d = 8, 8, 3

    def frame(n, seed):
        return spark.range(n).select(
            F.col("id").alias("_id"), F.xxhash64(F.col("id") + seed).alias("h")
        )

    def old_single_chunk_keys(df):
        mask = (1 << width) - 1
        return df.select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.lit(c * (1 << width))
                        + F.shiftright(F.col("h"), c * width).bitwiseAND(F.lit(mask))
                        for c in range(chunks)
                    ]
                )
            ).alias("key"),
        )

    def stats(keys):
        # one row per distinct key after the groupBy, so count(*) = k
        r = keys.groupBy("key").agg(F.count("*").alias("p")).agg(
            F.count("*").alias("k"),
            F.sum(F.expr("p*(p-1)/2")).alias("cand"),
        ).collect()[0]
        return int(r.k), int(r.cand)

    n_small, n_big = 2000, 8000
    ok_small = stats(old_single_chunk_keys(frame(n_small, 1)))
    ok_big = stats(old_single_chunk_keys(frame(n_big, 1)))
    nk_small = stats(
        dedup.hamming_candidate_keys(frame(n_small, 1), "h", d, chunks).select("key")
    )
    nk_big = stats(
        dedup.hamming_candidate_keys(frame(n_big, 1), "h", d, chunks).select("key")
    )
    # old: keys saturate at ~2048 -> growth rule FAILS, candidates ~16x (quadratic)
    assert not growth_ok(ok_small[0], ok_big[0], n_small, n_big)
    assert ok_big[1] / ok_small[1] > 8
    # new: keys grow ~linearly -> rule passes; accidental candidates stay tiny
    assert growth_ok(nk_small[0], nk_big[0], n_small, n_big)
    assert nk_big[1] < ok_big[1] / 100


def test_rademacher_signs_deterministic_and_engine_free():
    """The sign matrix must be a pure function of (seed, band, bit, dim
    index) via md5 — pinned against an independent recomputation so
    neither engine's replay can drift."""
    import hashlib

    m1 = dedup.rademacher_signs(1, 2, 3, 8)
    m2 = dedup.rademacher_signs(1, 2, 3, 8)
    assert m1 == m2
    for b in range(2):
        for j in range(3):
            for i in range(8):
                exp = 1 if int(hashlib.md5(f"1:{b}:{j}:{i}".encode()).hexdigest()[0], 16) % 2 else -1
                assert m1[b][j][i] == exp
    # different seeds must differ somewhere
    assert dedup.rademacher_signs(2, 2, 3, 8) != m1


def test_signband_signature_matches_numpy(spark):
    """The Spark signature (integer-quantized, JVM fold) must equal an
    independent numpy recomputation bit-for-bit — the determinism the
    oracle replay relies on."""
    import math

    import numpy as np

    vecs = [
        (0, [0.3, -0.7, 0.01, 0.0, -0.25, 1.5, -0.9, 0.4]),
        (1, [-0.3, 0.7, -0.01, 0.2, 0.25, -1.5, 0.9, -0.4]),
        (2, [1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0]),
    ]
    n_bands, band_bits, seed, dim = 3, 5, 7, 8
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = {
        (r._id, r.band): r.bv
        for r in dedup.signband_signature(
            df, "embedding", "vec_id", n_bands, band_bits, seed, dim
        ).collect()
    }
    signs = dedup.rademacher_signs(seed, n_bands, band_bits, dim)
    for vid, v in vecs:
        q = np.array([math.floor(x * 1_000_000) for x in v], dtype=np.int64)
        for b in range(n_bands):
            bv = 0
            for j in range(band_bits):
                if int(np.dot(q, np.array(signs[b][j], dtype=np.int64))) > 0:
                    bv |= 1 << j
            assert got[(vid, b)] == bv


def test_signband_arrow_twin_bit_identical(spark):
    """The Arrow numpy-matmul signature path must equal the JVM
    expression path on every (id, band) — exact int64 arithmetic on the
    same quantization makes them bit-identical by construction; this
    pins it on real embeddings at the adaptive width."""
    # deterministic subset: LIMIT without a sort may pick different rows
    # per execution, and the two paths below are independent plans
    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") < 200
    )
    n_bands, band_bits, seed, dim = 8, 14, 1, 64
    expr = dedup.signband_signature(
        emb, "embedding", "vec_id", n_bands, band_bits, seed, dim
    )
    arrow = dedup.signband_signature_arrow(
        emb, "embedding", "vec_id", n_bands, band_bits, seed, dim
    )
    e = {(r._id, r.band): r.bv for r in expr.collect()}
    a = {(r._id, r.band): r.bv for r in arrow.collect()}
    assert e == a and len(e) == 200 * n_bands


def test_signband_signature_property_vs_numpy(spark):
    """Property sweep of the signature determinism on adversarial
    vectors — negatives, exact zeros, tiny magnitudes, values near the
    quantization boundary — both engine paths must equal the independent
    numpy recomputation on every (id, band). One batched Spark round for
    all cases (hypothesis-style coverage without per-example jobs)."""
    import math

    import numpy as np

    n_bands, band_bits, seed, dim = 4, 6, 3, 8
    cases = [
        [0.0] * 8,                                  # all-zero vector
        [-1e-7, 1e-7, -0.5, 0.5, 0.0, -0.0, 1.0, -1.0],
        [1e-6, -1e-6, 2e-6, -2e-6, 0.9999995, -0.9999995, 0.1, -0.1],
        [3.5, -3.5, 0.25, -0.25, 7.0, -7.0, 0.001, -0.001],
        [0.123456, 0.1234565, -0.123456, -0.1234565, 0.5, 0.5, -0.5, -0.5],
        [1e3, -1e3, 1e-3, -1e-3, 42.0, -42.0, 0.0, 1.0],
    ]
    df = spark.createDataFrame(list(enumerate(cases)), ["vec_id", "embedding"])
    signs = dedup.rademacher_signs(seed, n_bands, band_bits, dim)

    def expected(v):
        q = np.array([math.floor(x * 1_000_000) for x in v], dtype=np.int64)
        out = []
        for b in range(n_bands):
            bv = 0
            for j in range(band_bits):
                if int(q @ np.array(signs[b][j], dtype=np.int64)) > 0:
                    bv |= 1 << j
            out.append(bv)
        return out

    want = {(i, b): expected(v)[b] for i, v in enumerate(cases) for b in range(n_bands)}
    for fn in (dedup.signband_signature, dedup.signband_signature_arrow):
        got = {
            (r._id, r.band): r.bv
            for r in fn(df, "embedding", "vec_id", n_bands, band_bits, seed, dim).collect()
        }
        assert got == want, fn.__name__


def test_adaptive_band_bits_growth():
    assert dedup.adaptive_band_bits(500) == 17
    assert dedup.adaptive_band_bits(525) == 18
    assert dedup.adaptive_band_bits(10**9) == 38  # keeps growing with n
    assert dedup.adaptive_band_bits(1) >= 4


def test_lsh_recall_bands_amplification():
    """Pin the Charikar amplification math: bands needed grow as bands
    widen (the n^rho trade), shrink as pairs get more similar, and the
    closed form actually delivers the target recall."""
    import math

    b1 = dedup.lsh_recall_bands(4, 0.9, 0.99)
    b2 = dedup.lsh_recall_bands(18, 0.9, 0.99)
    b3 = dedup.lsh_recall_bands(38, 0.9, 0.99)
    assert b1 <= b2 <= b3 and b3 > b1  # wider bands -> more bands needed
    assert dedup.lsh_recall_bands(18, 0.9, 0.999) < b2  # nearer pairs: fewer
    # the returned count actually achieves the recall
    for bits, cos in ((18, 0.99), (24, 0.95)):
        p = 1 - math.acos(cos) / math.pi
        bands = dedup.lsh_recall_bands(bits, 0.9, cos)
        assert 1 - (1 - p**bits) ** bands >= 0.9
    with pytest.raises(ValueError):
        dedup.lsh_recall_bands(18, 1.5, 0.99)


# ------------------------------------------- adaptive candidate routing
# VERDICT r9 item 1: the saturated-corpus prescription must be a code
# path. These pin (a) the census decision on unsaturated vs saturated
# corpora, (b) output equality of both routes where the exact answer is
# computable, so driver oracles stay green regardless of which route the
# census picks.

def _repeat_docs(docs, k):
    return repeat_docs(docs, k)


def test_adaptive_route_census_decision(spark):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    # driver-scale corpus: unsaturated — exact prefix scheme, so the
    # four adaptive driver entries replay their all-pairs oracles
    assert dedup.choose_jaccard_route(docs, "text", "doc_id", 0.5) == "prefix"
    assert (
        dedup.choose_jaccard_route(docs, "text", "doc_id", 0.5, block_cols=["lang"])
        == "prefix"
    )
    # saturated by construction (vocabulary pinned, corpus doubled):
    # the census must flip to minhash-LSH candidates
    doubled = _repeat_docs(docs, 2)
    assert dedup.choose_jaccard_route(doubled, "text", "doc_id", 0.5) == "minhash"
    assert (
        dedup.choose_jaccard_route(doubled, "text", "doc_id", 0.5, block_cols=["lang"])
        == "minhash"
    )
    # the corpus the r9 gate measured as saturated (keys 1.72x for 10x
    # docs, candidates n²/|vocab|) must route minhash
    big = read_table(spark, "/root/testdata/sf0.1", "documents")
    assert dedup.choose_jaccard_route(big, "text", "doc_id", 0.5) == "minhash"


def test_adaptive_minhash_route_equals_exact_on_saturated_corpus(spark):
    """On the doubled (saturated) corpus the router picks minhash — its
    output must equal the exact prefix-route answer pair-for-pair,
    jaccard-for-jaccard: the LSH recall contract made concrete on this
    corpus family (every exact copy shares all 16 bands; organic
    near-dups at j >= 0.5 are caught per the pinned dedup_minhash_lsh
    oracle equality)."""
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    doubled = _repeat_docs(docs, 2)
    for blocks in (None, ["lang"]):
        exact = dedup.adaptive_jaccard_pairs(
            doubled, "text", "doc_id", 0.5, block_cols=blocks, route="prefix"
        )
        auto = dedup.adaptive_jaccard_pairs(
            doubled, "text", "doc_id", 0.5, block_cols=blocks
        )
        e = {(r.id_a, r.id_b, r.jaccard) for r in exact.collect()}
        a = {(r.id_a, r.id_b, r.jaccard) for r in auto.collect()}
        assert a == e
        # every doc pairs its exact twin at j = 1.0 (+ organic near-dups)
        assert len(e) >= 500


def test_minhash_recall_bands_identity():
    # 1 - (1 - j^r)^b >= recall at the returned b, and b-1 misses it
    import math

    for r, recall, j in ((4, 0.9, 0.5), (4, 0.999, 0.7), (2, 0.95, 0.4)):
        b = dedup.minhash_recall_bands(r, recall, j)
        p = j ** r
        assert 1 - (1 - p) ** b >= recall
        if b > 1:
            assert 1 - (1 - p) ** (b - 1) < recall
    # proven 64/16 config: near-dups at j >= 0.8 effectively certain
    assert 1 - (1 - 0.8 ** 4) ** 16 > 0.9996


def test_signband_default_sizing_recall_at_two_sizes(spark):
    """VERDICT r9 item 4: with n_bands unpinned the operator sizes the
    band count from (band_bits, target_recall, recall_cos) via
    lsh_recall_bands — planted near-identical duplicates (cos ≈ 0.9999)
    must all be caught at BOTH corpus sizes even though band_bits (and
    with it the per-band miss rate) grows with the corpus."""
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb = read_table(spark, sf, "embeddings").select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
        )
        planted = emb.filter(F.col("vec_id") < 25).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.expr("transform(embedding, x -> x + 0.001D)").alias("embedding"),
        )
        got = dedup.embedding_signband_neardup(
            emb.unionByName(planted), "embedding", "vec_id",
            threshold=0.4, seed=1, dim=64,
        )
        pairs = {(r.id_a, r.id_b) for r in got.collect()}
        missing = {(i, i + 1_000_000) for i in range(25)} - pairs
        assert not missing, f"{sf}: planted dups missed by sized default: {missing}"


def test_lsh_recall_bands_grows_with_width():
    # the sized default must grow with band_bits (the n^rho amplification
    # shape) — a fixed count would silently lose recall at corpus scale
    widths = [14, 18, 22, 30, 38]
    sized = [dedup.lsh_recall_bands(b, 0.9, 0.99) for b in widths]
    assert sized == sorted(sized) and sized[-1] > sized[0]


def test_plan_audit_route_shapes(spark):
    """The r10 plan audit resolves the adaptive router's census decision
    and pins the MATCHING candidate stage (tools/explain_audit.py
    ROUTED_CHECKS — the old unconditional prefix-window rule
    false-failed the correct minhash plan at sf0.1). Pin both shape
    predicates against both routes' actual physical plans, including
    mutual exclusion, so an audit-rule drift cannot silently stop
    checking either branch."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "explain_audit",
        os.path.join(os.path.dirname(__file__), "..", "tools", "explain_audit.py"),
    )
    audit = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(audit)

    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    plan_prefix = audit.plan_of(
        dedup.adaptive_jaccard_pairs(docs, "text", "doc_id", 0.5, route="prefix")
    )
    plan_minhash = audit.plan_of(
        dedup.adaptive_jaccard_pairs(docs, "text", "doc_id", 0.5, route="minhash")
    )
    _, prefix_pred = audit._PREFIX_SHAPE
    _, minhash_pred = audit._MINHASH_SHAPE
    assert prefix_pred(plan_prefix) and not prefix_pred(plan_minhash)
    assert minhash_pred(plan_minhash) and not minhash_pred(plan_prefix)
    # the containment router's two routes must satisfy the SAME shape
    # predicates (the audit shares them across both router kinds)
    plan_cprefix = audit.plan_of(
        dedup.adaptive_containment_pairs(docs, "text", "doc_id", 0.8, route="prefix")
    )
    plan_cminhash = audit.plan_of(
        dedup.adaptive_containment_pairs(docs, "text", "doc_id", 0.8, route="minhash")
    )
    assert prefix_pred(plan_cprefix) and not prefix_pred(plan_cminhash)
    assert minhash_pred(plan_cminhash) and not minhash_pred(plan_cprefix)
    # every routed audit entry must keep resolving to a known route,
    # with the kwargs imported from the entries' own source (ADVICE r10)
    for name, kind in audit.ROUTED_CHECKS.items():
        assert audit._resolve_route(name, kind, docs) in ("prefix", "minhash")


# ------------------------------------- containment routing (VERDICT r10)
# containment_prefix_keys was the last content-bounded key class without
# an adaptive route; these pin (a) the census decision at both driver
# sfs and on constructed corpora, (b) banded-route output equality with
# the exact answer where it is computable, (c) the observability
# entries' reported route == the live router decision (ADVICE r10: the
# threshold constant must not fork).


def test_containment_route_census_decision(spark):
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    # driver-gate corpus: 1.07 est non-self pairs/doc — lossless prefix
    assert dedup.choose_containment_route(docs, "text", "doc_id", 0.8) == "prefix"
    # 10x corpus: 61.6/doc — saturated, banded-minhash candidates
    big = read_table(spark, "/root/testdata/sf0.1", "documents")
    assert dedup.choose_containment_route(big, "text", "doc_id", 0.8) == "minhash"
    # doubled corpus (vocabulary pinned): every doc gains an exact twin,
    # postings double — saturated by construction
    doubled = _repeat_docs(docs, 2)
    assert dedup.choose_containment_route(doubled, "text", "doc_id", 0.8) == "minhash"
    # all-unique vocabulary: zero non-self candidates — the census must
    # NOT read its own self-matches as saturation (the Σ pc·(fc−1) form;
    # with Σ pc·fc this corpus reads ~11 est/doc and spuriously routes)
    uniq = docs.select(
        "doc_id",
        F.expr(
            "concat_ws(' ', transform(split(text, ' '), "
            "(t, i) -> concat(t, '_', doc_id, '_', i)))"
        ).alias("text"),
    )
    assert dedup.choose_containment_route(uniq, "text", "doc_id", 0.8) == "prefix"


def test_containment_banded_route_equals_exact(spark):
    """The saturated route's ratio-capped banded candidates + exact
    directional verify must reproduce the exact asymmetric-prefix answer
    on corpora whose true pairs sit inside the ratio_cap=1.5 recall
    contract (measured r11: ratios 0.80-1.25 at both sfs) — the
    containment twin of the minhash==exact Jaccard pin above."""
    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    for corpus in (docs, _repeat_docs(docs, 2)):
        exact = dedup.adaptive_containment_pairs(
            corpus, "text", "doc_id", 0.8, route="prefix"
        )
        banded = dedup.adaptive_containment_pairs(
            corpus, "text", "doc_id", 0.8, route="minhash"
        )
        e = {(r.id_a, r.id_b, r.containment) for r in exact.collect()}
        b = {(r.id_a, r.id_b, r.containment) for r in banded.collect()}
        assert b == e
        assert len(e) >= 50  # non-vacuous: organic pairs (+ twins when doubled)


def test_containment_census_exactness(spark):
    """containment_candidate_census's Σ pc·(fc−1) must equal the ACTUAL
    non-self row count of the candidate equi-join it models (before the
    size filter and distinct) — the census is exact, not an estimate."""
    docs = read_table(spark, "/root/testdata/sf0.01", "documents").limit(120)
    sets = dedup.gram_sets(docs, "text", "doc_id", 3).withColumnRenamed(
        "_grams", "_set"
    )
    toks = sets.select("_id", F.explode("_set").alias("_tok"))
    prefix = dedup.prefix_tokens(sets, 0.8)
    _, _, est = dedup.containment_candidate_census(prefix, toks)
    actual = (
        prefix.withColumnRenamed("_id", "_ida")
        .join(toks.withColumnRenamed("_id", "_idb"), "_tok")
        .filter(F.col("_ida") != F.col("_idb"))
        .count()
    )
    assert est == actual


def test_route_census_entries_match_live_router(spark):
    """ADVICE r10: the observability entries' route column must equal the
    live router's decision — pinned through the shared
    SATURATION_CAND_PER_DOC constant so a threshold change cannot leave
    the census entries reporting a stale decision."""
    from dataux_spark import queries as Q

    sf = "/root/testdata/sf0.01"
    docs = read_table(spark, sf, "documents")
    jrow = Q.queries()["dedup_route_census"](spark, sf).collect()[0]
    assert jrow.route == dedup.choose_jaccard_route(
        docs, "text", "doc_id",
        block_cols=Q.ADAPTIVE_JACCARD_BLOCKS["dedup_prefix_jaccard"],
        **Q.ADAPTIVE_JACCARD_KW,
    )
    crow = Q.queries()["dedup_containment_census"](spark, sf).collect()[0]
    assert crow.route == dedup.choose_containment_route(
        docs, "text", "doc_id", **Q.ADAPTIVE_CONTAINMENT_KW
    )
