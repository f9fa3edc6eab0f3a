"""Property fuzz for the corpus-hygiene operators against pure-Python
models: the Spark plans (banded LSH candidate generation, corpus line
census) must equal a direct brute-force recomputation on ANY corpus, not
just the planted fixtures. Same style as the sessionization fuzz —
few examples, each a full Spark round trip, so max_examples stays low.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

# multi-minute suite: excluded from the inner-loop fast path
# (`pytest -m "not slow"`); the full unmarked run remains the gate
pytestmark = pytest.mark.slow

# tiny vocab forces heavy shingle overlap → real near-dup structure
_WORDS = ["red", "blue", "green", "fox", "dog", "jumps", "over", "lazy"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=4, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=8)


def _grams(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _exact_pairs(docs: list[str], threshold: float) -> set[tuple[int, int, float]]:
    out = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            ga, gb = _grams(docs[a]), _grams(docs[b])
            j = round(len(ga & gb) / len(ga | gb), 6)
            if j >= threshold:
                out.add((a, b, j))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus)
def test_minhash_lsh_equals_exact_jaccard_on_random_corpora(spark, docs):
    """With bands turned up (r=2 → miss probability ≤ (1-j²)³² ≤ 1e-4 at
    j ≥ 0.5), banded LSH + exact verify must return exactly the
    brute-force pair set — candidates are exact-verified, so false
    positives are structurally impossible and the assertion is equality,
    not containment."""
    from dataux_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b), r.jaccard)
        for r in minhash_lsh_pairs(
            df, "text", "doc_id", num_hashes=64, bands=32, shingle_n=3, threshold=0.5
        ).collect()
    }
    assert got == _exact_pairs(docs, 0.5)


_line = st.sampled_from(
    [
        "subscribe to our newsletter today",   # censusable boilerplate
        "all rights reserved worldwide",       # censusable boilerplate
        "Home",                                # short → exempt
        "",                                    # empty → exempt
        "totally unique sentence one",
        "another body line of text",
        "yet another different line",
    ]
)
_ldoc = st.lists(_line, min_size=1, max_size=5).map("\n".join)
_lcorpus = st.lists(_ldoc, min_size=1, max_size=6)


def _boiler_model(docs: list[str], min_docs: int, min_chars: int):
    lines = [[ln.strip() for ln in d.split("\n")] for d in docs]
    census: dict[str, set[int]] = {}
    for i, ls in enumerate(lines):
        for ln in ls:
            if len(ln) >= min_chars:
                census.setdefault(ln, set()).add(i)
    boiler = {ln for ln, ids in census.items() if len(ids) >= min_docs}
    out = {}
    for i, ls in enumerate(lines):
        kept = [ln for ln in ls if not (len(ln) >= min_chars and ln in boiler)]
        dropped = len(ls) - len(kept)
        out[i] = ("\n".join(kept), len(ls), dropped)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_lcorpus, min_docs=st.integers(min_value=2, max_value=4))
def test_boilerplate_removal_matches_python_census(spark, docs, min_docs):
    from dataux_spark.operators.text import remove_boilerplate_lines

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, t string"
    )
    got = {
        r.doc_id: (r.text_clean, r.n_lines, r.n_dropped)
        for r in remove_boilerplate_lines(
            df, "t", "doc_id", min_docs=min_docs, min_line_chars=10
        ).collect()
    }
    assert got == _boiler_model(docs, min_docs, 10)


# --- SemDeDup fuzz -----------------------------------------------------

_vec = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=4, max_size=4,
).filter(lambda v: sum(x * x for x in v) > 1e-6)
_vecs = st.lists(_vec, min_size=2, max_size=10)


def _semantic_model(vecs, cents, threshold):
    """Pure-Python replay of semantic_dedup: nearest centroid by cosine
    (ties to smaller cid), drop iff a smaller-id cluster-mate has rounded
    cosine > threshold."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1e-12
        nb = math.sqrt(sum(x * x for x in b)) or 1e-12
        return d / (na * nb)

    assign = {}
    for i, v in enumerate(vecs):
        best = max(((cos(v, cv), -cid) for cid, cv in cents))
        assign[i] = -best[1]
    keep = {}
    for i, v in enumerate(vecs):
        dropped = any(
            assign[j] == assign[i] and round(cos(vecs[j], v), 6) > threshold
            for j in range(i)
        )
        keep[i] = not dropped
    return assign, keep


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vecs=_vecs)
def test_semantic_dedup_equals_python_model_on_random_vectors(spark, vecs):
    """The Spark keep set must equal the brute-force model on ANY vector
    set — clustering tie-breaks, the rounded-cosine threshold compare,
    and the smaller-id drop rule all replayed exactly."""
    from dataux_spark.operators.dedup import semantic_dedup

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
             (2, [-1.0, 0.0, 0.0, 0.0])]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id: long, embedding: array<float>",
    )
    out = {r.vec_id: (r.cluster, r.keep)
           for r in semantic_dedup(df, "embedding", "vec_id", cents,
                                   threshold=0.9).collect()}
    # float32 storage: replay the model on the values Spark actually read
    stored = {r.vec_id: list(r.embedding)
              for r in df.select("vec_id", "embedding").collect()}
    assign, keep = _semantic_model([stored[i] for i in range(len(vecs))],
                                   cents, 0.9)
    assert out == {i: (assign[i], keep[i]) for i in range(len(vecs))}


# --- DSIR fuzz ---------------------------------------------------------

def _dsir_model(docs, target_flags, dim):
    """Pure-Python replay of dsir_log_weights: md5-prefix bucket hash over
    unigrams+bigrams (single-token docs double-count their token — the
    shingles() degenerate window), add-one smoothing over the full spine."""
    import hashlib
    import math

    def grams(text):
        toks = text.lower().split()
        bi = [" ".join(toks[i:i + 2]) for i in range(max(len(toks) - 1, 1))]
        return toks + bi

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim

    tc = [0] * dim
    rc = [0] * dim
    per_doc = []
    for text, is_t in zip(docs, target_flags):
        bs = [bucket(g) for g in grams(text)]
        per_doc.append(bs)
        for b in bs:
            rc[b] += 1
            if is_t:
                tc[b] += 1
    t_tot, r_tot = sum(tc), sum(rc)
    lam = [
        math.log((tc[b] + 1) / (t_tot + dim)) - math.log((rc[b] + 1) / (r_tot + dim))
        for b in range(dim)
    ]
    out = {}
    for i, bs in enumerate(per_doc):
        from collections import Counter

        c = Counter(bs)
        out[i] = (len(bs), round(sum(n * lam[b] for b, n in sorted(c.items())), 6))
    return out


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus, flags=st.data())
def test_dsir_weights_equal_python_model_on_random_corpora(spark, docs, flags):
    """Spark DSIR log-weights must equal the brute-force model on ANY
    corpus and ANY target subset — bucket hashing, smoothing, and the
    degenerate bigram edge replayed exactly (6dp)."""
    from pyspark.sql import functions as F

    from dataux_spark.operators.text import dsir_log_weights

    tflags = [flags.draw(st.booleans(), label=f"t{i}") for i in range(len(docs))]
    if not any(tflags):
        tflags[0] = True
    df = spark.createDataFrame(
        [(i, d, bool(t)) for i, (d, t) in enumerate(zip(docs, tflags))],
        "doc_id: long, text: string, is_target: boolean",
    )
    got = {
        r.doc_id: (r.n_grams, r.log_weight)
        for r in dsir_log_weights(df, "text", "doc_id",
                                  F.col("is_target"), dim=64).collect()
    }
    assert got == _dsir_model(docs, tflags, 64)


# --- span removal fuzz -------------------------------------------------

def _span_removal_model(docs, n, min_docs):
    import hashlib

    def spans(toks):
        m = max(len(toks) - n + 1, 1)
        return [
            (i, hashlib.md5(" ".join(toks[i:i + n]).encode()).hexdigest()[:16])
            for i in range(m)
        ]

    tok_lists = [d.lower().split() for d in docs]
    owners = {}
    for i, toks in enumerate(tok_lists):
        for h in {h for _, h in spans(toks)}:
            owners.setdefault(h, set()).add(i)
    dup = {h for h, ds in owners.items() if len(ds) >= min_docs}
    out = {}
    for i, toks in enumerate(tok_lists):
        covered = set()
        for pos, h in spans(toks):
            if h in dup:
                covered.update(range(pos, pos + n))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[i] = (len(toks), len(kept), " ".join(kept))
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus)
def test_span_removal_equals_python_model_on_random_corpora(spark, docs):
    """remove_duplicated_spans must equal the brute-force model on ANY
    corpus — census membership, coverage extents (incl. the short-doc
    degenerate span), and rebuilt text all replayed exactly."""
    from dataux_spark.operators.dedup import remove_duplicated_spans

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {r._id: (r.n_tokens, r.n_kept, r.text_clean)
           for r in remove_duplicated_spans(df, "text", "doc_id",
                                            n=3, min_docs=2).collect()}
    assert got == _span_removal_model(docs, 3, 2)


# --- CDC fuzz ----------------------------------------------------------

_dml_ops = st.lists(
    st.tuples(st.sampled_from(["upd", "del", "ins", "opt"]), st.integers(0, 6)),
    min_size=1, max_size=5,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_dml_ops)
def test_cdc_feed_equals_snapshot_diff_on_random_dml(spark, tmp_path_factory, ops):
    """Self-consistency of the file-pruned CDC: for ANY DML sequence,
    every adjacent table_changes() diff must equal the brute-force diff
    of the two full snapshots (keyed compare, update pairs included) —
    zero-match commits, key churn, and re-inserts all covered."""
    from pyspark.sql import functions as F

    from dataux_spark import Engine

    tmp = tmp_path_factory.mktemp("cdcfuzz")
    src = str(tmp / "src")
    spark.range(7).select(
        F.col("id").alias("k"), (F.col("id") * 10).cast("double").alias("v")
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("cdcf", src, str(tmp / "work"), keys=["k"])
    next_key = 100
    for op, arg in ops:
        if op == "upd":
            eng.sql(f"UPDATE cdcf SET v = v + 1 WHERE k % 7 = {arg}")
        elif op == "del":
            eng.sql(f"DELETE FROM cdcf WHERE k % 7 = {arg}")
        elif op == "opt":
            # layout-only commit interleaved: snapshots equal across it
            eng.sql("OPTIMIZE cdcf")
        else:
            eng.sql(f"INSERT INTO cdcf (k, v) VALUES ({next_key}, 1.0)")
            next_key += 1
    cur = eng.store._version["cdcf"]
    for v in range(1, cur + 1):
        prev = {r.k: r.v for r in eng.store.version_of("cdcf", v - 1).collect()}
        now = {r.k: r.v for r in eng.store.version_of("cdcf", v).collect()}
        want = set()
        for k in prev.keys() - now.keys():
            want.add((k, prev[k], "delete"))
        for k in now.keys() - prev.keys():
            want.add((k, now[k], "insert"))
        for k in prev.keys() & now.keys():
            if prev[k] != now[k]:
                want.add((k, prev[k], "update_preimage"))
                want.add((k, now[k], "update_postimage"))
        got = {(r.k, r.v, r._change_type)
               for r in eng.store.changes("cdcf", v - 1, v).collect()}
        assert got == want, (v, got, want)


# --- chunker fuzz ------------------------------------------------------

@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus, size=st.integers(2, 6), stride=st.integers(1, 5))
def test_chunk_windows_equal_python_model(spark, docs, size, stride):
    """chunk_documents must equal the window arithmetic on ANY corpus and
    (size, stride) combination — including stride > size (gaps) and
    docs shorter than one window."""
    from dataux_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
           for r in chunk_documents(df, "text", "doc_id",
                                    size=size, stride=stride).collect()}
    want = {}
    for i, d in enumerate(docs):
        toks = d.lower().split()
        import math
        nc = max(math.ceil((len(toks) - size) / stride) + 1, 1)
        for c in range(nc):
            w = toks[c * stride: c * stride + size]
            want[(i, c)] = (len(w), " ".join(w))
    assert got == want


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_dml_ops)
def test_scd2_point_in_time_equals_snapshots_on_random_dml(
    spark, tmp_path_factory, ops
):
    """SCD-2 derived from the feed must reconstruct EVERY version's
    snapshot as a point-in-time slice, for ANY DML sequence (updates,
    deletes, re-inserts, layout-only commits)."""
    from pyspark.sql import functions as F

    from dataux_spark import Engine
    from dataux_spark.operators.rollup import scd2_history

    tmp = tmp_path_factory.mktemp("scdfuzz")
    src = str(tmp / "src")
    spark.range(7).select(
        F.col("id").alias("k"), (F.col("id") * 10).cast("double").alias("v")
    ).write.parquet(src)
    eng = Engine(spark)
    eng.register_writable_parquet("scdf", src, str(tmp / "work"), keys=["k"])
    next_key = 100
    for op, arg in ops:
        if op == "upd":
            eng.sql(f"UPDATE scdf SET v = v + 1 WHERE k % 7 = {arg}")
        elif op == "del":
            eng.sql(f"DELETE FROM scdf WHERE k % 7 = {arg}")
        elif op == "opt":
            eng.sql("OPTIMIZE scdf")
        else:
            eng.sql(f"INSERT INTO scdf (k, v) VALUES ({next_key}, 1.0)")
            next_key += 1
    cur = eng.store._version["scdf"]
    hist = scd2_history(
        eng.store.version_of("scdf", 0),
        eng.store.changes("scdf", 0, cur),
        ["k"],
    ).collect()
    for v in range(cur + 1):
        snap = {(r.k, r.v) for r in eng.store.version_of("scdf", v).collect()}
        asof = {(r.k, r.v) for r in hist
                if r.valid_from <= v and (r.valid_to is None or r.valid_to > v)}
        assert asof == snap, (v, asof, snap)


def _exact_containment(docs: list[str], threshold: float) -> set[tuple[int, int, float]]:
    """Directional brute-force containment pairs on the python gram model."""
    out = set()
    for a in range(len(docs)):
        for b in range(len(docs)):
            if a == b:
                continue
            ga, gb = _grams(docs[a]), _grams(docs[b])
            c = round(len(ga & gb) / len(ga), 6)
            if c >= threshold:
                out.add((a, b, c))
    return out


# Aggregate miss tally for the banded-route recall budget below (ADVICE
# r12): accumulates across every example of the derandomized hypothesis
# run so the 0.1% budget is a run-level RATE, not a per-example freebie.
# Re-running the test in one process only ever ADDS to both counters, so
# the rate bound stays valid across repeats.
_CONTAINMENT_MISS_TALLY: dict[str, int] = {"within": 0, "missed": 0}


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus)
def test_containment_routes_contract_on_random_corpora(spark, docs):
    """The r11 containment router's two routes, fuzzed on tiny-vocab
    corpora (heavy overlap — the saturated regime the banded route
    exists for):

      prefix route  — LOSSLESS: output == brute force, always;
      banded route  — precision 1 (exact verify: output ⊆ brute force)
        and the ratio-cap recall contract: pairs whose container is
        ≤ ratio_cap× the contained size must be returned up to the
        PROBABILISTIC miss budget — target_recall=0.999 is a recall
        floor, not a guarantee (ADVICE r11: derandomize + fixed xxhash
        freeze today's sample into zero misses, but any change to the
        strategy, seed plumbing, or hash salt could surface a
        legitimately-in-contract miss; a hard ⊆ would flag it as a
        failure). ADVICE r12: a PER-EXAMPLE ceil(0.1%·|within|) budget
        would let a deterministic one-miss-per-corpus regression pass
        (1 miss is always in budget on these tiny corpora), so the
        budget is enforced on the AGGREGATE tally across the whole
        derandomized hypothesis run: one genuinely probabilistic miss
        stays in budget, a systematic per-corpus miss blows through it
        by the second example.
        Pairs OUTSIDE the cap (tiny doc inside a much larger one) are
        the documented trade and are NOT required.
    """
    import math
    from dataux_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    exact = _exact_containment(docs, 0.8)
    pref = {
        (r.id_a, r.id_b, r.containment)
        for r in dedup.containment_pairs(df, "text", "doc_id", 0.8).collect()
    }
    assert pref == exact
    banded = {
        (r.id_a, r.id_b, r.containment)
        for r in dedup.containment_minhash_pairs(
            df, "text", "doc_id", 0.8, target_recall=0.999
        ).collect()
    }
    assert banded <= exact, banded - exact
    cap = dedup.CONTAINMENT_RATIO_CAP
    within = {
        (a, b, c)
        for (a, b, c) in exact
        if len(_grams(docs[b])) <= cap * len(_grams(docs[a]))
    }
    missed = within - banded
    _CONTAINMENT_MISS_TALLY["within"] += len(within)
    _CONTAINMENT_MISS_TALLY["missed"] += len(missed)
    assert _CONTAINMENT_MISS_TALLY["missed"] <= math.ceil(
        0.001 * max(_CONTAINMENT_MISS_TALLY["within"], 1)
    ), (missed, dict(_CONTAINMENT_MISS_TALLY))


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus, cap=st.integers(min_value=1, max_value=6))
def test_hot_bucket_cap_only_removes_pairs(spark, docs, cap):
    """The routed hot-bucket backstop (r12, VERDICT r11 item 1) is
    monotone on ANY corpus and ANY cap: on the forced minhash route,
    pairs(max_bucket=cap) ⊆ pairs(max_bucket=None) ⊆ brute force — the
    cap can only REMOVE pairs (precision stays 1: the exact verify makes
    false positives structurally impossible regardless of which buckets
    are dropped). Same for the containment route's directional pairs."""
    from dataux_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    full = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.adaptive_jaccard_pairs(
            df, "text", "doc_id", 0.5, route="minhash", max_bucket=None
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.adaptive_jaccard_pairs(
            df, "text", "doc_id", 0.5, route="minhash", max_bucket=cap
        ).collect()
    }
    exact = {
        (a, b, j) for (a, b, j) in _exact_pairs(docs, 0.5)
    }
    assert capped <= full, capped - full
    assert full <= exact, full - exact
    cfull = {
        (r.id_a, r.id_b, r.containment)
        for r in dedup.adaptive_containment_pairs(
            df, "text", "doc_id", 0.8, route="minhash", max_bucket=None
        ).collect()
    }
    ccapped = {
        (r.id_a, r.id_b, r.containment)
        for r in dedup.adaptive_containment_pairs(
            df, "text", "doc_id", 0.8, route="minhash", max_bucket=cap
        ).collect()
    }
    assert ccapped <= cfull, ccapped - cfull
    assert cfull <= _exact_containment(docs, 0.8), cfull


@settings(max_examples=6, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus)
def test_small_side_supplement_restores_exact_containment(spark, docs):
    """The r12 small-side supplement's exactness, fuzzed: with
    small_side_exact_max at or above every doc's shingle count (tiny-vocab
    docs here are ≤ 10 shingles), the supplement's lossless prefix pass
    covers EVERY contained side, so banded ∪ supplement must equal brute
    force containment on ANY corpus — at any ratio, regardless of what
    the banding caught. Verifies the recall restoration claim of
    dedup_containment_small_side / ADVICE r11 as a property, not a
    fixture."""
    from dataux_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    got = {
        (r.id_a, r.id_b, r.containment)
        for r in dedup.adaptive_containment_pairs(
            df, "text", "doc_id", 0.8, route="minhash", small_side_exact_max=99
        ).collect()
    }
    assert got == _exact_containment(docs, 0.8)


@settings(max_examples=8, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=_corpus)
def test_containment_census_exact_on_random_corpora(spark, docs):
    """containment_candidate_census's Σ pc·(fc−1) must equal the ACTUAL
    non-self candidate row count of the asymmetric equi-join on ANY
    corpus — the census the router decides with is exact, not an
    estimate (random twin of the fixed-corpus pin in
    tests/test_keygrowth.py)."""
    from pyspark.sql import functions as F

    from dataux_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    sets = dedup.gram_sets(df, "text", "doc_id", 3).withColumnRenamed(
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


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=23), min_size=1,
                   max_size=5),
    segment=st.integers(min_value=1, max_value=9),
    cap=st.one_of(st.none(), st.integers(min_value=2, max_value=12)),
)
def test_chunked_expansion_equals_triangle_for_any_segment(
    spark, sizes, segment, cap
):
    """r13 (VERDICT r12 item 2): the segment×segment in-bucket expansion
    is EXACTLY the triangular pair set for ANY bucket sizes, ANY segment
    width, and ANY cap — the same algebra the pinned test checks at the
    production width, fuzzed across slice boundaries (sizes that are
    multiples of, one off from, and far from the segment width all
    occur). With a cap, buckets above it contribute nothing and the
    rest are unchanged; id_a < id_b everywhere by the sorted-_ids
    order invariant."""
    from dataux_spark.operators import dedup

    rows = [
        (b, 0, sorted(range(b * 1000, b * 1000 + sz)))
        for b, sz in enumerate(sizes)
    ]
    buckets = spark.createDataFrame(rows, "band int, bh long, _ids array<int>")
    expect = {
        (a, b)
        for _, _, ids in rows
        if cap is None or len(ids) <= cap
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    got = {
        (r.id_a, r.id_b)
        for r in dedup._expand_bucket_pairs(
            buckets, cap, segment=segment
        ).collect()
    }
    assert got == expect, (sizes, segment, cap, got ^ expect)
    assert all(a < b for a, b in got)
