"""Text-analysis and multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from dataux_spark.operators import multimodal, text
from dataux_spark.queries import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").cache()


def test_token_stats_consistency(docs):
    out = text.token_stats(docs, "text", "doc_id")
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0 < r.n_distinct_tokens <= r.n_tokens
        assert r.n_subwords_est > 0


def test_quality_score_bounds(docs):
    out = text.quality_score(docs, "text", "doc_id").collect()
    for r in out:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0


def test_lang_scores_pred_membership(docs):
    out = text.lang_scores(docs, "text", "doc_id").collect()
    allowed = set(text.LANG_MARKERS) | {"und"}
    assert {r.lang_pred for r in out} <= allowed


def test_multimodal_feature_extraction(spark, docs):
    wrapped = multimodal.attach_binary_payload(docs.limit(20), "text", "doc_id")
    # payload+meta schema with pruning-friendly struct
    assert dict(wrapped.dtypes)["payload"] == "binary"
    feats = multimodal.extract_features(wrapped)
    rows = feats.collect()
    assert len(rows) == 20
    src = {r.doc_id: r.text for r in docs.limit(20).collect()}
    for r in rows:
        assert r.mime == "image/fake"
        assert r.n_bytes == len(src[r.doc_id].encode())
        assert len(r.feat) == 4 and r.feat[0] == float(r.n_bytes)


def test_multimodal_decoder_injection(spark, docs):
    wrapped = multimodal.attach_binary_payload(docs.limit(5), "text", "doc_id")

    def decoder(payload: bytes, mime: str):
        raise NotImplementedError("no codec in this environment")

    feats = multimodal.extract_features(wrapped, decoder=decoder)
    with pytest.raises(Exception):  # surfaces through the Spark job
        feats.collect()


def test_resize_stub_rewrites_metadata(spark, docs):
    wrapped = multimodal.attach_binary_payload(docs.limit(5), "text", "doc_id")
    resized = multimodal.resize_stub(wrapped, 224, 224)
    for r in resized.select("meta.width", "meta.height").collect():
        assert (r.width, r.height) == (224, 224)


def test_frame_sample_fanout_and_timestamps(spark, docs):
    wrapped = multimodal.attach_binary_payload(docs.limit(10), "text", "doc_id")
    frames = multimodal.frame_sample(wrapped, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 40  # one row per (doc, frame)
    src = {r.doc_id: len(r.text.encode()) for r in docs.limit(10).collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
        assert len(r.frame) == 16  # stub md5 frame
    for did, fr in by_doc.items():
        fr.sort(key=lambda r: r.frame_idx)
        dur = src[did]  # duration fallback = payload bytes
        assert [r.ts_ms for r in fr] == [i * dur // 4 for i in range(4)]
        # frames differ per index (deterministic but index-salted)
        assert len({bytes(r.frame) for r in fr}) == 4


def test_frame_sample_decoder_injection(spark, docs):
    wrapped = multimodal.attach_binary_payload(docs.limit(3), "text", "doc_id")
    frames = multimodal.frame_sample(
        wrapped, n_frames=2, decoder=lambda b, i: b[:4] + bytes([i])
    )
    for r in frames.collect():
        assert len(r.frame) == 5


def test_bpe_pretokenizer_pieces(spark):
    from dataux_spark.operators.text import bpe_pieces, token_stats
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "it's 42 words, isn't it?")], ["doc_id", "text"]
    )
    pieces = df.select(bpe_pieces(F.col("text")).alias("p")).collect()[0].p
    # contractions split off, numbers and punct-runs are their own pieces
    assert pieces == ["it", "'s", " 42", " words", ",", " isn", "'t", " it", "?"]
    stats = token_stats(df, "text", "doc_id").collect()[0]
    assert stats.n_bpe_pieces == 9 and stats.n_tokens == 5


def test_langid_ngram_prefers_doc_language(spark):
    from dataux_spark.operators.text import langid_ngram

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is in a box"),
            (2, "der hund und die katze ist nicht ein vogel"),
            (3, "le chat est dans la maison et les jardins"),
        ],
        ["doc_id", "text"],
    )
    out = {r._id: r.lang for r in langid_ngram(df, "text", "doc_id").collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr"


def test_pack_chunks_boundaries(spark):
    """Greedy-chunk invariants: cum ordering per source, chunk = where the
    doc starts, chunk token mass stays near budget (never more than one doc
    overshoot)."""
    from dataux_spark.operators.text import pack_chunks
    from dataux_spark.queries import read_table
    from pyspark.sql import functions as F

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    out = pack_chunks(d, "text", "doc_id", "source", budget=256)
    rows = out.orderBy("source", "doc_id").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        cum = 0
        for r in rs:
            assert r.chunk_id == cum // 256  # starts-in chunk
            cum += r.n_tokens
            assert r.cum_tokens == cum
        assert sorted(r.chunk_id for r in rs) == [r.chunk_id for r in rs]
    # at least one source crosses a boundary at this SF
    assert out.agg(F.max("chunk_id")).collect()[0][0] >= 1


def test_repetition_profile_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),   # bigrams: ab ba ab ba -> 2 distinct / 4, top 'a b' x2
            (2, "x y z"),       # bigrams: xy yz -> all unique
            (3, "solo"),        # <2 words -> dropped
        ],
        "doc_id: long, text: string",
    )
    out = {r.doc_id: r for r in text.repetition_profile(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1.n_words == 5 and r1.n_bigrams == 4
    assert r1.word_ttr == 0.4  # {a,b}/5
    assert r1.dup_bigram_frac == 0.5  # 2 distinct of 4
    assert r1.top_bigram == "a b" and r1.top_bigram_ct == 2
    r2 = out[2]
    assert r2.dup_bigram_frac == 0.0 and r2.top_bigram == "x y" and r2.top_bigram_ct == 1


def test_repetition_profile_full_table(docs):
    out = text.repetition_profile(docs, "text", "doc_id")
    rows = out.collect()
    assert len(rows) == docs.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 2).count()
    for r in rows:
        assert 0.0 <= r.dup_bigram_frac < 1.0
        assert 0.0 < r.word_ttr <= 1.0
        assert r.n_bigrams == r.n_words - 1
        assert 1 <= r.top_bigram_ct <= r.n_bigrams


def test_redact_pii_patterns(spark):
    """Each default pattern redacts; ordering keeps IPs/SSNs intact as
    their own placeholders (phone regex must not eat dotted octets)."""
    from dataux_spark.operators.text import redact_pii

    rows = [
        (1, "mail a.user+x@sub.example.org now"),
        (2, "call +1-555-0199 or 310 555 1234"),
        (3, "host 192.168.0.254 down"),
        (4, "ssn 123-45-6789 leaked"),
        (5, "clean text, nothing here"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: (r.text_redacted, r.n_redactions) for r in
           redact_pii(df, "text", "doc_id").collect()}
    assert got[1] == ("mail [EMAIL] now", 1)
    assert got[2] == ("call [PHONE] or [PHONE]", 2)
    assert got[3] == ("host [IP] down", 1)
    assert got[4] == ("ssn [SSN] leaked", 1)
    assert got[5] == ("clean text, nothing here", 0)


def test_top_tfidf_rare_term_beats_common(spark):
    """A term unique to one doc must outrank corpus-wide terms within that
    doc; ranks are dense 1..k with deterministic tie-breaks."""
    from dataux_spark.operators.text import top_tfidf_terms

    df = spark.createDataFrame(
        [
            # equal tf=2 for both terms in doc 1: the rare term's idf is
            # the deciding factor (ln(4/2)+1 vs ln(4/4)+1)
            (1, "common common rareword rareword"),
            (2, "common common common other"),
            (3, "common other other filler"),
        ],
        "doc_id: long, text: string",
    )
    rows = top_tfidf_terms(df, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r._id, []).append((r.rank, r.term, r.score))
    top1 = sorted(by_doc[1])[0]
    assert top1[1] == "rareword"
    for ranked in by_doc.values():
        assert [rk for rk, _, _ in sorted(ranked)] == list(range(1, len(ranked) + 1))
    # df of 'common' spans all 3 docs
    assert all(r.df == 3 for r in rows if r.term == "common")


def test_unigram_logprob_ranks_gibberish_below_typical(spark):
    """A doc of corpus-frequent words scores lower (more probable) than a
    doc of hapax gibberish; token counts roll up exactly."""
    from dataux_spark.operators.text import unigram_logprob_scores

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ran to the mat"),
            (3, "zxqv wpfk jqzn xbvc qqzz mmwp"),
        ],
        "doc_id: long, text: string",
    )
    out = {r._id: r for r in unigram_logprob_scores(df, "text", "doc_id").collect()}
    assert out[1].n_tokens == 6 and out[3].n_tokens == 6
    assert out[1].mean_neg_logprob < out[3].mean_neg_logprob
    assert out[2].mean_neg_logprob < out[3].mean_neg_logprob
    import math

    for r in out.values():
        assert r.pppl == pytest.approx(math.exp(r.mean_neg_logprob), rel=1e-3)
    assert out[1].pppl < out[3].pppl


def test_bm25_topk_ranking_properties(spark, sf_dir):
    """BM25 sanity: scores positive and rank-monotone; a short document
    saturated with the query terms must outrank everything in the
    corpus (tf saturation still leaves it highest at equal idf); docs
    containing no query term never appear."""
    from dataux_spark.operators.text import bm25_topk
    from dataux_spark.queries import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(
        [(100001, "spark query join spark query join spark")],
        "doc_id: long, text: string",
    )
    out = bm25_topk(
        docs.union(planted), "text", "doc_id", ["spark", "query", "join"], k=5
    ).collect()
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert out[0].doc_id == 100001
    no_hit = spark.createDataFrame(
        [(100002, "table scan only")], "doc_id: long, text: string"
    )
    out2 = bm25_topk(
        no_hit, "text", "doc_id", ["spark", "query", "join"], k=5
    ).collect()
    assert out2 == []


def test_remove_boilerplate_lines(spark):
    """C4-style line census: lines >=10 chars shared by >=min_docs docs
    drop everywhere; short lines are exempt both ways; order of the
    surviving lines is preserved; an all-boilerplate doc survives with
    empty text (corpus cardinality preserved)."""
    from dataux_spark.operators.text import remove_boilerplate_lines

    footer = "subscribe to our newsletter today"
    rows = [
        (1, f"unique first body line\n{footer}\nHome"),
        (2, f"{footer}\nanother unique body sentence\nHome"),
        (3, f"third body text entirely its own\n{footer}"),
        (4, footer),  # all boilerplate
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    out = {
        r.doc_id: r
        for r in remove_boilerplate_lines(
            df, "t", "doc_id", min_docs=3, min_line_chars=10
        ).collect()
    }
    assert len(out) == 4  # no doc vanished
    assert out[1].text_clean == "unique first body line\nHome"
    assert out[2].text_clean == "another unique body sentence\nHome"
    assert out[3].text_clean == "third body text entirely its own"
    assert out[4].text_clean == ""
    assert out[4].n_dropped == 1 and out[4].n_lines == 1
    assert out[1].n_lines == 3 and out[1].n_dropped == 1
    # below the doc threshold nothing drops
    kept = remove_boilerplate_lines(
        df, "t", "doc_id", min_docs=5, min_line_chars=10
    ).agg({"n_dropped": "sum"}).collect()[0][0]
    assert kept == 0


def test_hashed_linear_quality_deterministic_and_zero_shuffle(spark):
    """The fastText-shaped scorer: deterministic scores (same input, same
    score), token-count denominator, keep flag at the threshold, and a
    plan with no exchange (scan projection only)."""
    import contextlib
    import io

    from dataux_spark.operators.text import hashed_linear_quality

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zzz")],
        "doc_id long, t string",
    )
    out = hashed_linear_quality(df, "t", "doc_id", dim=64, threshold=0.0)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].quality_score == rows[2].quality_score  # deterministic
    assert rows[1].n_tokens == 3 and rows[3].n_tokens == 1
    for r in rows.values():
        assert -0.5 <= r.quality_score <= 0.5
        assert r.keep == int(r.quality_score >= 0.0)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_url_canonicalization_rules(spark):
    """The full canonical rule set, one spelling per rule: scheme/host
    case, www., default ports, trailing slash, fragment, tracking-param
    removal, param sorting, malformed input -> empty key."""
    from dataux_spark.operators.web import canonicalize_urls, url_dedup_keepers

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/A/B/?z=2&utm_source=m&a=1#frag"),
        (2, "http://example.com:80/A/B?a=1&z=2"),          # same page, other spelling
        (3, "http://example.com/A/B/?fbclid=abc&a=1&z=2"), # same again
        (4, "http://other.org/path"),
        (5, "not a url at all"),
        (6, "http://example.com/CaseSensitive/Path"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: r.url_canon for r in canonicalize_urls(df, "url", "id").collect()}
    assert got[1] == got[2] == got[3] == "example.com/A/B?a=1&z=2"
    assert got[4] == "other.org/path"
    assert got[5] == ""                      # malformed: no guessing
    assert got[6] == "example.com/CaseSensitive/Path"  # path case preserved
    keepers = {
        r.url_canon: (r.keeper_id, r.n_dups)
        for r in url_dedup_keepers(df, "url", "id").collect()
    }
    assert keepers["example.com/A/B?a=1&z=2"] == (1, 3)
    assert "" not in keepers  # unparseable rows never form a dedup group


def test_dsir_weights_rank_target_like_docs(spark):
    """DSIR log-weights must rank docs sharing the target set's n-gram
    distribution above off-target docs, and the deterministic top-k
    selection must be stable across runs."""
    from pyspark.sql import functions as F

    from dataux_spark.operators.text import dsir_log_weights, dsir_select_topk

    target_text = "the quick brown fox jumps over the lazy dog"
    off_text = "zzz qqq xxx vvv kkk www yyy jjj ppp mmm"
    rows = (
        [(i, target_text, "tgt") for i in range(10)]            # target set
        + [(100 + i, target_text + " again", "raw") for i in range(5)]  # target-like
        + [(200 + i, off_text, "raw") for i in range(5)]        # off-target
    )
    df = spark.createDataFrame(rows, "doc_id: long, text: string, grp: string")
    w = dsir_log_weights(df, "text", "doc_id", F.col("grp") == "tgt", dim=256)
    by_id = {r.doc_id: r.log_weight for r in w.collect()}
    assert len(by_id) == 20
    assert min(by_id[100 + i] for i in range(5)) > max(by_id[200 + i] for i in range(5))

    top = dsir_select_topk(df, "text", "doc_id", F.col("grp") == "tgt", k=15, dim=256)
    sel = [r.doc_id for r in top.collect()]
    assert len(sel) == 15 and all(200 + i not in sel for i in range(5))
    sel2 = [r.doc_id for r in
            dsir_select_topk(df, "text", "doc_id", F.col("grp") == "tgt",
                             k=15, dim=256).collect()]
    assert sel == sel2


def test_bm25_index_matches_in_memory_and_prunes(spark, sf_dir, tmp_path):
    """The persisted BM25 index returns bit-identical results to the
    in-memory scorer, and the probe plan prunes to the query terms'
    partition buckets (reads a strict subset of the index files)."""
    from dataux_spark.operators.text import (
        bm25_index_topk,
        bm25_topk,
        build_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm25_idx")
    build_bm25_index(docs, "text", "doc_id", path, n_buckets=16)
    terms = ["spark", "query", "join"]
    mem = [(r.doc_id, r.score, r.rank) for r in
           bm25_topk(docs, "text", "doc_id", terms, k=10).collect()]
    idx = [(r.doc_id, r.score, r.rank) for r in
           bm25_index_topk(spark, path, terms, "doc_id", k=10,
                           n_buckets=16).collect()]
    assert mem == idx

    # pruning: the probed plan's postings scan lists only the tb buckets
    # of the query terms, a strict subset of 16
    probed = bm25_index_topk(spark, path, ["spark"], "doc_id", k=5, n_buckets=16)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    import re as _re

    pf = _re.findall(r"PartitionFilters: \[[^\]]*tb#\d+ = \d+[^\]]*\]", plan)
    assert len(pf) >= 2  # both postings and termdf scans prune to one bucket


def test_bm25_index_probe_edge_terms(spark, sf_dir, tmp_path):
    """The probe's term-bucket SELECT binds terms as NAMED sql parameters
    (r14, ADVICE r13): empty term lists return an empty result instead of
    a ParseException, and quote/backslash terms work regardless of
    spark.sql.parser.escapedStringLiterals."""
    from dataux_spark.operators.text import bm25_index_topk, build_bm25_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "bm25_edge")
    build_bm25_index(docs, "text", "doc_id", path, n_buckets=16)
    assert bm25_index_topk(spark, path, [], "doc_id", k=5,
                           n_buckets=16).count() == 0
    got = bm25_index_topk(spark, path, ["o'brien\\x", "spark"], "doc_id",
                          k=5, n_buckets=16)
    plain = bm25_index_topk(spark, path, ["spark"], "doc_id", k=5,
                            n_buckets=16)
    # the absent quoted term contributes nothing: identical result rows
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_phash_neardup_identical_payloads_pair(spark):
    """Perceptual-hash near-dup: byte-identical payloads collide at
    hamming 0 through the banded join; unrelated payloads (random fake
    grids) stay below any reasonable threshold."""
    from dataux_spark.operators.multimodal import (
        attach_binary_payload,
        perceptual_hash,
        phash_neardup_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "the same exact image bytes live here"),
            (2, "the same exact image bytes live here"),
            (3, "completely different payload content A"),
            (4, "another unrelated blob of bytes B"),
        ],
        "doc_id: long, text: string",
    )
    payloads = attach_binary_payload(df, "text", "doc_id")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in phash_neardup_pairs(payloads, max_hamming=3).collect()}
    assert pairs == {(1, 2): 0}
    # the fingerprint itself is deterministic
    h1 = {r.doc_id: r.phash for r in perceptual_hash(payloads).collect()}
    h2 = {r.doc_id: r.phash for r in perceptual_hash(payloads).collect()}
    assert h1 == h2 and h1[1] == h1[2] and h1[3] != h1[1]


def test_phash_custom_id_column(spark):
    """perceptual_hash must honor a non-default id column name and type."""
    from dataux_spark.operators import multimodal

    df = spark.createDataFrame(
        [("imgA", "payload one"), ("imgB", "payload one")],
        "img_id: string, text: string",
    )
    wrapped = multimodal.attach_binary_payload(df, "text", "img_id")
    hashes = {r.img_id: r.phash
              for r in multimodal.perceptual_hash(wrapped, id_col="img_id").collect()}
    assert hashes["imgA"] == hashes["imgB"]
    pairs = multimodal.phash_neardup_pairs(wrapped, id_col="img_id").collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [("imgA", "imgB", 0)]


def test_rrf_fuse_matches_model_and_handles_partial_overlap(spark):
    """RRF: summed 1/(60+rank) across rankings, docs absent from one
    ranking contribute only their present terms, ties break to id."""
    from dataux_spark.operators.text import rrf_fuse

    r1 = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id: long, rank: int")
    r2 = spark.createDataFrame([(3, 1), (4, 2), (1, 3)], "doc_id: long, rank: int")
    got = {(r.doc_id): (r.rrf_score, r.rank)
           for r in rrf_fuse([r1, r2], "doc_id", k=4).collect()}
    exp = {
        1: round(1 / 61 + 1 / 63, 6),
        2: round(1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        4: round(1 / 62, 6),
    }
    assert {k: v[0] for k, v in got.items()} == exp
    # 1 and 3 tie exactly -> id order; 2 and 4 tie -> id order
    assert [k for k, v in sorted(got.items(), key=lambda kv: kv[1][1])] == [1, 3, 2, 4]


def test_collocations_pmi_math_and_determinism(spark):
    """PMI on a tiny constructed corpus: the always-adjacent pair scores
    the closed-form log2(cab*N/(ca*cb)); independent-ish pairs score
    lower; result is deterministic and capped at k."""
    import math

    from dataux_spark.operators.text import collocations_pmi

    rows = [(i, "new york " + ("a b " if i % 2 else "b c ") * 3) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = collocations_pmi(df, "text", "doc_id", min_count=3, k=10).collect()
    by_bg = {r.bigram: r for r in out}
    ny = by_bg["new york"]
    # counts: 'new york' 12 times; 'new' 12, 'york' 12; N = total bigrams
    n_total = sum(len(t.split()) - 1 for _, t in rows)
    want = round(math.log2(12 * n_total / (12 * 12)), 6)
    assert ny.pair_count == 12 and abs(ny.pmi - want) < 1e-6
    # 'york a' / 'york b' cross-boundary pairs are rarer and score lower
    assert all(r.pmi <= ny.pmi for r in out)
    again = collocations_pmi(df, "text", "doc_id", min_count=3, k=10).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_registered_domain_rule_branches(spark):
    from dataux_spark.operators.web import domain_rollup, registered_domain_col

    cases = [
        (1, "https://www.example.co.uk/a", "example.co.uk"),     # multi-part suffix
        (2, "https://deep.sub.example.co.uk/a", "example.co.uk"),
        (3, "http://blog.example.com/a", "example.com"),          # plain TLD
        (4, "https://example.com:8080/a", "example.com"),         # any port stripped
        (5, "https://localhost/a", "localhost"),                  # <=2 labels pass through
        (6, "not a url", ""),                                     # unparseable -> ''
        (7, "https://a.b.site.com.au/x", "site.com.au"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], "id: long, url: string")
    got = {
        r.id: r.dom
        for r in df.select("id", registered_domain_col(F.col("url")).alias("dom")).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)

    # rollup: example.com has two hosts (blog., bare) and the
    # unparseable row is excluded
    roll = {r.domain: r for r in domain_rollup(df, "url", "id").collect()}
    assert set(roll) == {"example.co.uk", "example.com", "localhost", "site.com.au"}
    assert roll["example.com"].n_docs == 2 and roll["example.com"].n_hosts == 2
    assert roll["example.co.uk"].n_hosts == 2  # www-stripped canon, distinct hosts


def test_cap_per_group_deterministic_and_bounded(spark, sf_dir):
    from dataux_spark.operators.sampling import cap_per_group
    from dataux_spark.queries import read_table

    d = read_table(spark, sf_dir, "documents")
    out = cap_per_group(d, "source", "doc_id", 3)
    sizes = {r.source: r.ct for r in out.groupBy("source").agg(F.count("*").alias("ct")).collect()}
    orig = {r.source: r.ct for r in d.groupBy("source").agg(F.count("*").alias("ct")).collect()}
    for s, n in orig.items():
        assert sizes[s] == min(3, n), (s, sizes[s], n)
    # determinism + growth stability: rerun picks the identical keepers,
    # and a keeper set from a SUBSET never invents new keepers beyond
    # hash order (drop one group entirely; others unchanged)
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in cap_per_group(d, "source", "doc_id", 3).collect())
    assert ids1 == ids2
    sub = cap_per_group(d.filter(F.col("source") != "src0"), "source", "doc_id", 3)
    assert sorted(r.doc_id for r in sub.collect()) == [
        i for i in ids1
        if i in {r.doc_id for r in d.filter(F.col("source") != "src0").select("doc_id").collect()}
    ]


def test_tag_by_dictionary_set_semantics_and_plan(spark):
    """Distinct-term hit counts (a repeated term counts once), min_hits
    filter, and a zero-exchange plan."""
    from dataux_spark.operators.text import tag_by_dictionary

    df = spark.createDataFrame(
        [
            (1, "join join join merge nothing else"),
            (2, "scan filter sort scan"),
            (3, "unrelated words only here"),
        ],
        "doc_id: long, text: string",
    )
    tax = {"joins": ["join", "merge", "hash"], "scan_exec": ["scan", "filter", "sort"]}
    out = {(r.doc_id, r.topic): r.n_hits
           for r in tag_by_dictionary(df, "text", "doc_id", tax, min_hits=2).collect()}
    assert out == {(1, "joins"): 2, (2, "scan_exec"): 3}
    plan = tag_by_dictionary(df, "text", "doc_id", tax)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_vocab_coverage_hand_built(spark):
    """Corpus: 'a' x6, 'b' x3, 'c' x1 (10 occurrences). k=1 covers 0.6,
    k=2 covers 0.9, k=3 covers all; k beyond the vocab saturates at 1."""
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b  a"), (3, "a b c")], ["doc_id", "text"]
    )
    got = {r.k: (r.covered_occurrences, r.total_occurrences, r.coverage)
           for r in text.vocab_coverage(docs, "text", ks=[1, 2, 3, 50]).collect()}
    assert got[1] == (6, 10, 0.6)
    assert got[2] == (9, 10, 0.9)
    assert got[3] == (10, 10, 1.0)
    assert got[50] == (10, 10, 1.0)


def test_vocab_coverage_tie_break_deterministic(spark):
    """Equal-count types rank alphabetically: with 'x' and 'y' both at 2,
    k=1 must take 'x' — the (cnt desc, tok asc) order, not hash luck."""
    docs = spark.createDataFrame([(1, "y x"), (2, "x y")], ["doc_id", "text"])
    got = {r.k: r.covered_occurrences
           for r in text.vocab_coverage(docs, "text", ks=[1]).collect()}
    assert got[1] == 2


def test_loop_scoring_leaves_no_cache_entries(spark):
    """Per-call operator persists used to leak one CacheManager entry per
    invocation (r14): the dsir λ spine and the bigram census lost their
    persist (single-reference), and the unigram/bigram model censuses
    moved to GC-bound localCheckpoints. Loop-scoring must leave the SQL
    cache empty and keep checkpointed RDDs bounded by live frames."""
    import gc

    from dataux_spark.operators.text import (
        bigram_logprob_scores,
        dsir_log_weights,
        unigram_logprob_scores,
    )

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    spark.catalog.clearCache()
    for _ in range(3):
        dsir_log_weights(docs, "text", "doc_id",
                         F.col("doc_id") < 10, dim=64).count()
        unigram_logprob_scores(docs, "text", "doc_id").count()
        bigram_logprob_scores(docs, "text", "doc_id").count()
    # SQL cache: nothing registered at all (the old persists landed here)
    jcache = spark._jsparkSession.sharedState().cacheManager()
    assert jcache.isEmpty(), "loop scoring leaked SQL cache entries"
    # RDD-level storage: checkpointed censuses die with their frames
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    import time as _t
    for _ in range(20):  # ContextCleaner is async
        if spark.sparkContext._jsc.sc().getPersistentRDDs().size() == 0:
            break
        _t.sleep(0.5)
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == 0


def test_bigram_pppl_orders_scramble_below_prose(spark):
    """The bigram scorer's whole point: a scrambled doc (same unigrams,
    broken order) must score WORSE (higher mean neg logprob) than the
    prose it was scrambled from, while a unigram model ties them."""
    prose = "the cat sat on the mat and the dog sat on the rug"
    words = prose.split()
    scrambled = " ".join(words[::2] + words[1::2][::-1])  # same bag of words
    filler = [(i, "the cat sat on the mat again and again today") for i in range(3, 10)]
    df = spark.createDataFrame(
        [(1, prose), (2, scrambled)] + filler, ["doc_id", "text"]
    )
    bi = {r._id: r.mean_neg_logprob
          for r in text.bigram_logprob_scores(df, "text", "doc_id").collect()}
    uni = {r._id: r.mean_neg_logprob
           for r in text.unigram_logprob_scores(df, "text", "doc_id").collect()}
    assert bi[2] > bi[1]              # scramble is out-of-distribution
    assert abs(uni[2] - uni[1]) < 1e-9  # unigram model cannot tell


def test_bigram_pppl_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello world"), (3, "a b c")], ["doc_id", "text"]
    )
    got = {r._id: r.n_bigrams
           for r in text.bigram_logprob_scores(df, "text", "doc_id").collect()}
    assert 1 not in got      # single-token doc has no bigrams
    assert got[2] == 1 and got[3] == 2


def test_media_curation_gate_rules_and_total_labeling(spark):
    from dataux_spark.operators.multimodal import curate_media_metadata

    rows = [
        (1, 800, 600, 1000),        # keep: landscape, 512 tier
        (2, 32, 600, 1000),         # drop: min side < 64
        (3, 3000, 600, 1000),       # drop: aspect 5.0 > 2.5
        (4, 500, 500, 30_000_000),  # drop: bytes over cap
        (5, None, 600, 1000),       # NULL dims: unknown, keep 0, still a row
        (6, 100, 100, 1000),        # keep: square, lt256 tier
    ]
    df = spark.createDataFrame(rows, ["id", "width", "height", "n_bytes"])
    got = {r.id: (r.keep, r.aspect_bucket, r.res_tier)
           for r in curate_media_metadata(df).collect()}
    assert got[1] == (1, "landscape", "512")
    assert got[2][0] == 0 and got[3][0] == 0 and got[4][0] == 0
    assert got[5] == (0, "unknown", "unknown")
    assert got[6] == (1, "square", "lt256")
    assert len(got) == 6  # total labeling: nothing disappears


def test_lexical_drift_js_properties(spark):
    """JS properties the monitor leans on: identical corpora give ~zero
    divergence; disjoint vocabularies approach ln 2; a planted template
    flood dominates the per-token terms."""
    import math

    a = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)], ["doc_id", "text"])
    same = text.lexical_drift_js(a, a, "text", vocab_k=50).collect()
    assert abs(sum(r.js_term for r in same)) < 1e-6
    b = spark.createDataFrame(
        [(i, "zzz qqq xxx www vvv uuu") for i in range(10)], ["doc_id", "text"])
    disjoint = sum(r.js_term for r in
                   text.lexical_drift_js(a, b, "text", vocab_k=50).collect())
    assert disjoint > 0.9 * math.log(2)
    flooded = a.union(spark.createDataFrame(
        [(100 + i, "buy cheap pills now") for i in range(30)], ["doc_id", "text"]))
    terms = {r.tok: r.js_term for r in
             text.lexical_drift_js(a, flooded, "text", vocab_k=50).collect()}
    top = max(terms, key=terms.get)
    assert top in {"buy", "cheap", "pills", "now"}


@pytest.mark.slow  # multi-10s property/soundness check — full suite only
def test_phash_neardup_nonzero_hamming_with_locality_decoder(spark):
    """The multimodal half of the WWW'07 hamming fix, exercised at
    NONZERO distances: a locality-preserving decoder (byte-bucket
    histogram — near-identical payloads give near-identical grids, so
    small payload edits flip few pHash bits) drives phash_neardup_pairs,
    and the output must equal the brute-force hamming join over the very
    same perceptual hashes. The driver entry (multimodal_phash_neardup)
    value-checks distance 0 with the md5-grid default; this pins
    1 <= d <= 3 with real near-pairs."""

    def bucket_decoder(payload: bytes, mime: str):
        grid = [0.0] * 64
        for b in payload or b"\x00":
            grid[b // 4] += 1.0
        return grid

    base = bytes(range(256)) * 4  # flat histogram: every cell near mean
    rows = [
        (0, base),
        (1, base + bytes([8] * 30)),        # bump one bucket: few bits flip
        (2, base + bytes([8] * 30, ) + bytes([200] * 25)),  # two buckets
        (3, bytes([7]) * 900),              # concentrated: far from base
        (4, base),                          # exact copy of 0: distance 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "raw"]).select(
        "doc_id",
        F.col("raw").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    hashes = multimodal.perceptual_hash(df, "doc_id", decoder=bucket_decoder).select(
        F.col("doc_id").alias("_id"), "phash"
    )
    a, b = hashes.alias("a"), hashes.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.crossJoin(b)
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in multimodal.phash_neardup_pairs(
            df, "doc_id", max_hamming=3, decoder=bucket_decoder
        ).collect()
    }
    assert got == brute
    dists = {h for _, _, h in got}
    assert 0 in dists, "exact-copy pair must appear at distance 0"
    assert any(0 < h <= 3 for h in dists), (
        f"fixture must exercise nonzero hamming, got distances {sorted(dists)}"
    )
