"""Scaling probe: run the headline queries at two scale factors and report
the wall-time ratio against the 10× data ratio — plus the KEY-CARDINALITY
gate over every candidate-generation equi-join key.

A query whose time grows ~linearly (ratio ≈ data ratio on the scan-bound
ones, much less on fixed-output aggregations) is evidence the plan has no
super-linear term (no cartesian blowup, no driver-side loop, no per-row
Python hot path). Run occasionally; paste the table into SCALE.md.

The key gate exists because wall-time ratios CANNOT see the
fixed-cardinality-block trap at test scale: a blocked join whose key
space (2^16, 256, 25 nations…) dwarfs the test corpus probes linear,
then goes quadratic the moment the corpus outgrows the key space
(SCALE.md rounds 8-9 caught five instances of this class). The gate
measures what the timing probe can't: countDistinct(join key) at both
scale factors for each registered candidate-key frame, and FAILS any
whose observed key count does not grow with the data.

    python3 tools/scale_probe.py [sf_small] [sf_big] [query ...]
    python3 tools/scale_probe.py --keys [sf_small] [sf_big]

Extra args restrict the timing probe to the named registered queries
(default: the bench HEADLINE set); --keys runs only the key gate (it is
always appended to a full run). Exit code 1 if the key gate fails.
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # the same query set the driver benches


# --------------------------------------------------- key-cardinality gate

def repeat_docs(docs, k: int):
    """Vocabulary-pinned k× corpus repeat (doc_id offset per copy) — the
    canonical saturated-corpus construction shared by the keygrowth
    route pins (tests/test_keygrowth.py) and the third-decade probe
    (tools/routed_scale_probe.py): repetition doubles every posting
    while adding zero vocabulary, so the census must read saturation."""
    from pyspark.sql import functions as F

    parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000))
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _kf_simhash_hamming(spark, sf_dir):
    """Combination-blocking keys of the banded hamming join (shared by
    dedup_simhash and multimodal pHash near-dup)."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.dedup import hamming_candidate_keys, simhash

    docs = Q.read_table(spark, sf_dir, "documents")
    return hamming_candidate_keys(
        simhash(docs, "text", "doc_id"), "simhash", max_hamming=3, chunks=8
    ).select(F.col("key"))


def _kf_signband(spark, sf_dir):
    """Sign-band LSH keys of embedding_neardup, at the adaptive
    (log2 n + 8)-bit width the operator defaults to."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.dedup import adaptive_band_bits, signband_signature

    emb = Q.read_table(spark, sf_dir, "embeddings")
    bb = adaptive_band_bits(emb.count())
    sig = signband_signature(emb, "embedding", "vec_id", 8, bb, 1, 64)
    return sig.select(
        (F.col("band") * F.lit(1 << bb).cast("long") + F.col("bv")).alias("key")
    )


def _kf_minhash_band(spark, sf_dir):
    """Banded MinHash bucket keys of dedup_minhash_lsh."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.dedup import _banded_rows, minhash_signatures

    docs = Q.read_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=64)
    return _banded_rows(sigs, 64, 16).select(
        F.xxhash64("band", "bh").alias("key")
    )


def _kf_prefix_token(spark, sf_dir):
    """Rarest-first prefix token keys of prefix_jaccard_pairs (also the
    candidate scheme behind the dedup reports/clusters since r8)."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.dedup import gram_sets, prefix_tokens

    docs = Q.read_table(spark, sf_dir, "documents")
    sets = gram_sets(docs, "text", "doc_id").withColumnRenamed("_grams", "_set")
    return prefix_tokens(sets, 0.5).select(F.col("_tok").alias("key"))


def _kf_containment_prefix(spark, sf_dir):
    """Contained-side (A) prefix keys of containment_pairs at its t=0.8
    default — the same rarest-first rule as prefix_jaccard_pairs
    (p = |A| − ceil(t·|A|) + 1, dedup.py containment_pairs), so the same
    content-vocabulary key space: saturates at least as early as
    prefix_token_keys on this corpus (classified content-bounded; the
    container side indexes ALL its shingles by design)."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.dedup import gram_sets, prefix_tokens

    docs = Q.read_table(spark, sf_dir, "documents")
    sets = gram_sets(docs, "text", "doc_id").withColumnRenamed("_grams", "_set")
    return prefix_tokens(sets, 0.8).select(F.col("_tok").alias("key"))


def _kf_containment_band(spark, sf_dir):
    """Banded-MinHash bucket keys of the containment router's saturated
    route (containment_minhash_pairs at its defaults: t=0.8, cap=1.5,
    r=3, recall 0.98 ⇒ 36 bands · 3 rows) — hash-keyed, so the key space
    grows with the corpus regardless of vocabulary: the r11 route that
    closes the containment_prefix_keys content-bounded trap."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.dedup import (
        CONTAINMENT_RATIO_CAP as CAP,
        CONTAINMENT_ROWS_PER_BAND as R,
        CONTAINMENT_TARGET_RECALL as REC,
        _banded_rows,
        minhash_recall_bands,
        minhash_signatures,
    )

    t = Q.ADAPTIVE_CONTAINMENT_KW["threshold"]
    docs = Q.read_table(spark, sf_dir, "documents")
    bands = minhash_recall_bands(R, REC, t / (CAP + 1 - t))
    sigs = minhash_signatures(docs, "text", "doc_id", num_hashes=bands * R)
    return _banded_rows(sigs, bands * R, bands).select(
        F.xxhash64("band", "bh").alias("key")
    )


def _kf_ngram_block(spark, sf_dir):
    """(lang, length-bucket) join keys of ngram_jaccard_pairs as the
    dedup_ngram_jaccard registry entry calls it (block_cols=['lang'],
    t=0.5 ⇒ bucket spread 1) — FIXED cardinality by construction
    (|langs| × log-size buckets). Quadratic BY CONTRACT: this entry IS
    the family's exact blocked-all-pairs verify/oracle twin (registry
    docstring), so the gate records the boundedness as a machine
    classification instead of failing it."""
    import math as _math

    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.dedup import gram_sets

    docs = Q.read_table(spark, sf_dir, "documents")
    g = gram_sets(docs, "text", "doc_id")
    spread = max(1, _math.ceil(_math.log2(1.0 / 0.5)))  # = 1 at t=0.5
    lb = F.floor(F.log2(F.greatest(F.size("_grams"), F.lit(1))))
    sized = g.join(
        docs.select(F.col("doc_id").alias("_id"), "lang"), "_id"
    ).withColumn("_lbk", F.explode(F.array(*[lb + F.lit(i) for i in range(spread + 1)])))
    return sized.select(F.concat_ws("|", F.col("lang"), F.col("_lbk")).alias("key"))


def _kf_linkage_symdelete(spark, sf_dir):
    """(block cols, symmetric-delete key) join keys of
    link_entities_blocked — the r8 fix whose regression this gate
    machine-checks."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.linkage import _norm, _with_delete_keys

    cust = Q.read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("__lid"),
        F.col("c_nationkey").alias("__bl"),
        _norm(F.col("c_name")).alias("__lkey"),
    )
    return _with_delete_keys(cust, "__lkey").select(
        F.concat_ws("|", F.col("__bl"), F.col("__dkey")).alias("key")
    )


def _kf_knn_cell(spark, sf_dir):
    """sqrt(n)-cell quantizer keys of ann_knn_join. Key growth here is
    ~sqrt(data growth) BY DESIGN (IVF sizing) — the pass rule accepts
    sqrt-growth and rejects only saturation."""
    from pyspark.sql import functions as F

    from dataux_spark import queries as Q
    from dataux_spark.operators.similarity import assign_to_centroids

    emb = Q.read_table(spark, sf_dir, "embeddings")
    m = math.ceil(math.sqrt(emb.count()))
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") < m).collect()
    ]
    return assign_to_centroids(emb, "embedding", "vec_id", cents).select(
        F.col("cluster").alias("key")
    )


# Every candidate-generation equi-join family with a registered query
# entry. Adding a blocked-join operator without registering its key frame
# here is the round-8/round-9 failure mode — don't.
KEY_FRAMES = {
    "simhash_hamming_keys": _kf_simhash_hamming,
    "signband_keys": _kf_signband,
    "minhash_band_keys": _kf_minhash_band,
    "prefix_token_keys": _kf_prefix_token,
    "containment_prefix_keys": _kf_containment_prefix,
    "containment_band_keys": _kf_containment_band,
    "ngram_block_keys": _kf_ngram_block,
    "linkage_symdelete_keys": _kf_linkage_symdelete,
    "knn_cell_keys": _kf_knn_cell,
}

# Content-bounded schemes: the key space is the CONTENT VOCABULARY, which
# the scheme cannot widen by construction (unlike a hash/band width knob).
# On Heaps-law text the vocabulary grows ~n^0.8 and the scheme is
# near-linear; on a vocabulary-saturated corpus — like the synthetic test
# documents, whose 3-gram types grow only ~n^0.24 — postings fatten and
# exact candidate counts drift toward n²/|vocab| (measured round-9:
# 1,613 → 430,325 candidate pairs for 10× docs, max posting just 10, so
# no hot-token cap can help — the saturation is uniform). That is the
# exact-set-join lower bound on such data, not an implementation flaw;
# since r10 the scale path for saturated corpora is a CODE path, not a
# prescription: dedup.adaptive_jaccard_pairs censuses the prefix-key
# postings per call and routes saturated corpora through minhash-LSH
# candidates + the same exact verify (the four driver dedup entries use
# it; tests/test_keygrowth.py pins the decision and route equality). The
# gate still REPORTS saturation for these frames — they measure the raw
# prefix scheme, the router's 'prefix' branch — so the number stays on
# the record every run. r10 (VERDICT r9 item 6): containment_pairs'
# A-side prefix keys get their own frame instead of standing behind
# prefix_token_keys — same vocabulary-keyed class, same classification.
# r11 (VERDICT r10 item 1): the containment family is ROUTED too
# (dedup.adaptive_containment_pairs — census of the asymmetric posting
# products, banded-MinHash fallback), so containment_prefix_keys now
# measures that router's 'prefix' branch and containment_band_keys its
# saturated branch (hash-keyed, growth-checked like minhash_band_keys).
CONTENT_BOUNDED = {"prefix_token_keys", "containment_prefix_keys"}

# Quadratic BY CONTRACT: registry entries whose whole point is the exact
# blocked-all-pairs answer (the verify/oracle twin of the linear
# schemes — dedup_ngram_jaccard's docstring states it outright). Their
# fixed key space is the contract, not a trap; the gate records the
# classification machine-side so it can never again live only in a
# docstring (VERDICT r9 item 6).
BOUNDED_BY_CONTRACT = {"ngram_block_keys"}


def growth_ok(keys_small: int, keys_big: int, rows_small: int, rows_big: int) -> bool:
    """Pass rule: when the input grows by R ≥ 2×, observed distinct join
    keys must grow by ≥ min(2, 0.8·sqrt(R)). Linear key schemes clear it
    with room, sqrt-sized quantizers (IVF cells) clear it by design, and
    a saturated fixed key space (ratio → 1) fails. Below 2× data growth
    there is nothing to measure against."""
    r = rows_big / max(rows_small, 1)
    if r < 2:
        return True
    return keys_big / max(keys_small, 1) >= min(2.0, 0.8 * math.sqrt(r))


def key_growth_report(spark, small: str, big: str, frames=None) -> list[dict]:
    """countDistinct(key) + row count per key frame at both scale factors;
    one dict per frame with the growth_ok verdict."""
    from pyspark.sql import functions as F

    out = []
    for name, fn in (frames or KEY_FRAMES).items():
        stats = {}
        for tag, d in (("small", small), ("big", big)):
            agg = fn(spark, d).agg(
                F.countDistinct("key").alias("k"), F.count("*").alias("n")
            ).collect()[0]
            stats[tag] = (int(agg.k), int(agg.n))
        (ks, ns), (kb, nb) = stats["small"], stats["big"]
        out.append(
            {
                "frame": name,
                "keys_small": ks,
                "keys_big": kb,
                "rows_small": ns,
                "rows_big": nb,
                "key_ratio": round(kb / max(ks, 1), 2),
                "row_ratio": round(nb / max(ns, 1), 2),
                "ok": growth_ok(ks, kb, ns, nb),
            }
        )
    return out


def run_key_gate(spark, small: str, big: str) -> bool:
    rep = key_growth_report(spark, small, big)
    print(f"\n{'key frame':26s} {'keys(s)':>8s} {'keys(b)':>8s} "
          f"{'kx':>6s} {'rowx':>6s}  verdict")
    hard_fail = False
    for r in rep:
        if r["frame"] in BOUNDED_BY_CONTRACT:
            # fixed keys are the CONTRACT (exact all-pairs verify twin) —
            # record the classification, never a pass/fail
            verdict = "BOUNDED BY CONTRACT — exact all-pairs verify twin"
        elif r["ok"]:
            verdict = "ok"
        elif r["frame"] in CONTENT_BOUNDED:
            verdict = (
                "SATURATED — content-bounded scheme; adaptive_jaccard_pairs "
                "routes it (SCALE.md r9/r10)"
            )
        else:
            verdict = "FAIL — fixed-cardinality key space"
            hard_fail = True
        print(
            f"{r['frame']:26s} {r['keys_small']:8d} {r['keys_big']:8d} "
            f"{r['key_ratio']:6.2f} {r['row_ratio']:6.2f}  {verdict}"
        )
    return not hard_fail


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--keys"]
    keys_only = "--keys" in sys.argv[1:]
    small = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    big = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    names = args[2:] or HEADLINE
    runs = int(os.environ.get("BENCH_RUNS", "3"))

    from dataux_spark import get_spark
    from dataux_spark import queries as Q

    spark = get_spark("scale_probe")
    if keys_only:
        sys.exit(0 if run_key_gate(spark, small, big) else 1)
    registry = Q.queries()
    for d in (small, big):
        Q.read_table(spark, d, "lineitem").count()  # warm listings

    def run(name: str, sf_dir: str) -> float:
        fn = registry[name]
        fn(spark, sf_dir).count()  # warm
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        return statistics.median(times)

    print(f"{'query':34s} {'t(small)':>9s} {'t(big)':>9s} {'ratio':>6s}")
    ratios = []
    for name in names:
        ts, tb = run(name, small), run(name, big)
        r = tb / ts if ts > 0 else float("inf")
        ratios.append(r)
        print(f"{name:34s} {ts:9.3f} {tb:9.3f} {r:6.2f}")
    print(
        f"\n10x data -> median time ratio {statistics.median(ratios):.2f}x "
        f"(max {max(ratios):.2f}x); ratios well under 10 mean fixed costs "
        f"still dominate at this scale, none should exceed ~10 (linear)."
    )
    if not run_key_gate(spark, small, big):
        sys.exit(1)


if __name__ == "__main__":
    main()
