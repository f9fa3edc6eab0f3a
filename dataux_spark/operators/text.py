"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All pure built-in expressions (split/regexp/aggregate) — these run in the
scan projection at 100 TB with zero shuffles; only the optional summary
aggregations shuffle (on tiny keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataux_spark.operators.dedup import tokens

# Marker stopwords per language for the n-gram-free heuristic language ID.
# Deliberately tiny and deterministic so the oracle twin is expressible in
# plain SQL; a production lang-id would use char n-gram profiles (same
# plumbing, bigger tables).
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "es": ["el", "los", "las", "es", "una", "que", "por"],
}


# GPT-2-style pre-tokenizer regex, restricted to a lookahead-free subset
# (RE2-compatible, so the DuckDB oracle can run the IDENTICAL pattern):
# contractions | space+letters | space+digits | space+punct-run | whitespace.
# Real BPE merges would then split each piece against a merges table; piece
# count is the standard pre-merge token estimate.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def bpe_pieces(col):
    """BPE-ish pre-tokenization via native regexp_extract_all (JVM-side)."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)


def token_stats(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, chars, a BPE-ish
    regex pre-token count, and a chars/4 subword estimate.
    Returns one row per doc."""
    toks = tokens(F.col(content_col))
    nonspace = F.length(F.regexp_replace(F.col(content_col), r"\s+", ""))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.col(content_col)).alias("n_chars_measured"),
        F.size(bpe_pieces(F.col(content_col))).alias("n_bpe_pieces"),
        F.ceil(nonspace / F.lit(4)).cast("bigint").alias("n_subwords_est"),
    )


def pack_chunks(
    df: DataFrame,
    content_col: str,
    id_col: str,
    part_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Sequence packing (training-data prep): concatenate each partition's
    documents in stable id order and cut the stream every `budget` tokens;
    a doc's chunk is where it STARTS (floor((cum - n_tokens)/budget)).

    Scale shape: ONE window per part_col partition — the packing order is
    per-partition (source/shard), never global, so there is no single-task
    global sort; each shard packs independently, which is also the right
    semantics (training shards are independent streams). Deterministic:
    same data → same chunks, on any cluster."""
    from pyspark.sql import Window as W

    n_tok = F.size(tokens(F.col(content_col)))
    w = W.partitionBy(part_col).orderBy(id_col)
    cum = F.sum(n_tok).over(w)
    return df.select(
        F.col(part_col),
        F.col(id_col),
        n_tok.alias("n_tokens"),
        cum.alias("cum_tokens"),
        F.floor((cum - n_tok) / F.lit(float(budget))).alias("chunk_id"),
    )


def lang_trigrams() -> list[tuple[str, str]]:
    """Char-trigram profile per language, derived deterministically from the
    marker words (space-padded, distinct). Production swaps in full corpus
    profiles — identical plan shape, bigger broadcast table."""
    out = []
    for lang, words in LANG_MARKERS.items():
        s = " " + " ".join(words) + " "
        tris = {s[i : i + 3] for i in range(len(s) - 2)}
        out.extend((lang, t) for t in sorted(tris))
    return out


def langid_ngram(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Character-n-gram language ID: explode each doc into char trigrams,
    broadcast-join the per-language trigram profile, count matches per
    (doc, lang), keep the best language per doc.

    Scale: the profile is tiny (broadcast — no shuffle for the join); the
    only shuffle is the (doc, lang) count, keyed by doc id (uniform). The
    trigram explode is ~len(doc) rows but lives entirely inside one stage.
    Deterministic tie-break: higher count, then lexicographically later
    lang. Docs matching no profile trigram are absent (unknown language).
    Returns (id, lang, matches)."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    prof = spark.createDataFrame(lang_trigrams(), "lang string, tri string")
    padded = F.concat(F.lit(" "), F.lower(F.col(content_col)), F.lit(" "))
    d = df.select(F.col(id_col).alias("_id"), padded.alias("_p"))
    d = d.select(
        "_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(_p) - 2, 1)), "
                "i -> substring(_p, i, 3))"
            )
        ).alias("tri"),
    )
    counts = (
        d.join(F.broadcast(prof), "tri")
        .groupBy("_id", "lang")
        .agg(F.count("*").alias("matches"))
    )
    w = Window.partitionBy("_id").orderBy(F.desc("matches"), F.desc("lang"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_id", "lang", "matches")
    )


def quality_score(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Quality scoring: length band, punctuation ratio, stopword ratio,
    mean token length, composite [0,1] score. The filter thresholds mirror
    common corpus-cleaning heuristics (Gopher/C4-style length + symbol
    ratios). Returns one row per doc with the components and the score."""
    c = F.col(content_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    stop = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
    mean_tok_len = (F.length(F.regexp_replace(c, r"\s+", "")) / n_tok).cast("double")
    punct_ratio = F.round(punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop / F.greatest(n_tok, F.lit(1)), 6)
    len_ok = (n_tok >= 10) & (n_tok <= 100000)
    tok_len_ok = (mean_tok_len >= 2) & (mean_tok_len <= 12)
    score = F.round(
        (len_ok.cast("double") + tok_len_ok.cast("double") + (1 - punct_ratio)) / 3, 6
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        score.alias("quality"),
    )


def lang_scores(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: marker-stopword hit-rate per language, argmax
    with 'und' (undetermined) fallback when no markers hit. Deterministic
    tie-break by language code. Returns (id, *score_<lang>, lang_pred)."""
    toks = F.array_distinct(tokens(F.col(content_col)))
    cols = [F.col(id_col)]
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        s = F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        cols.append(s.alias(f"score_{lang}"))
        score_cols.append((lang, f"score_{lang}"))
    out = df.select(*cols)
    best = F.greatest(*[F.col(c) for _, c in score_cols])
    pred = F.lit("und")
    for lang, c in reversed(score_cols):  # earlier langs win ties
        pred = F.when(F.col(c) == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", F.when(best > 0, pred).otherwise(F.lit("und")))


def repetition_profile(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Within-document repetition metrics (Gopher-style repetition filters,
    Rae et al. 2021 §A1.1): type-token ratio, duplicate-bigram fraction,
    and the document's most frequent bigram with its count. Documents with
    fewer than 2 words have no bigrams and are dropped (nothing to score).

    Plan: bigrams are built in the scan projection (zip_with over the token
    array, JVM-side), then one explode + groupBy(doc, bigram) shuffle
    computes the counts — its volume is bounded by total token count and
    the doc_id key is uniform by construction. The per-doc top-1 and the
    final roll-up run on a second, much smaller exchange keyed by doc_id
    alone (input = one row per DISTINCT bigram per doc, already partially
    aggregated); the roll-up reuses the window's partitioning.

    Returns (id, n_words, word_ttr, n_bigrams, dup_bigram_frac, top_bigram,
    top_bigram_ct)."""
    from pyspark.sql import Window as W

    toks = tokens(F.col(content_col))
    base = df.select(
        F.col(id_col),
        toks.alias("_ws"),
    ).select(
        id_col,
        F.size("_ws").alias("n_words"),
        F.round(F.size(F.array_distinct("_ws")) / F.size("_ws"), 6).alias("word_ttr"),
        F.expr(
            "zip_with(slice(_ws, 1, size(_ws) - 1), slice(_ws, 2, size(_ws) - 1), "
            "(a, b) -> concat(a, ' ', b))"
        ).alias("_bgs"),
    )
    counts = (
        base.select(id_col, "n_words", "word_ttr", F.explode("_bgs").alias("bigram"))
        .groupBy(id_col, "n_words", "word_ttr", "bigram")
        .agg(F.count("*").alias("ct"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("ct").desc(), F.col("bigram"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .groupBy(id_col, "n_words", "word_ttr")
        .agg(
            F.sum("ct").alias("n_bigrams"),
            F.round(1.0 - F.count("*") / F.sum("ct"), 6).alias("dup_bigram_frac"),
            F.max(F.when(F.col("_rn") == 1, F.col("bigram"))).alias("top_bigram"),
            F.max(F.when(F.col("_rn") == 1, F.col("ct"))).alias("top_bigram_ct"),
        )
    )


def top_tfidf_terms(
    df: DataFrame, content_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: term frequency within the
    doc × inverse document frequency across the corpus (smoothed:
    idf = ln((N+1)/(df+1)) + 1, the scikit-learn convention), top-k terms
    per doc with deterministic tie-breaks (higher score, then
    lexicographically earlier term).

    Plan, two passes over the token stream, all linear: (1) per-(doc,term)
    counts — one shuffle keyed by (doc, term), map-side combined; (2) the
    document-frequency table — a groupBy(term) whose input is the already
    per-doc-distinct (doc, term) rows, so its volume is bounded by
    vocabulary × docs sharing, also map-side combined; (3) an equality
    join term→df (shuffle hash join — the DF table is vocabulary-sized,
    which at web scale is large enough that it must be free to shuffle;
    Catalyst broadcasts it when small); (4) per-doc top-k via window
    row_number on the doc-keyed exchange. N (total docs) is computed as a
    scalar count — one job, the same pattern the rollup high-water mark
    uses. Returns (id, term, tf, df, score, rank)."""
    from pyspark.sql import Window as W

    n_docs = df.count()  # scalar; broadcast into the plan as a literal
    toks = df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(content_col))).alias("term"))
    tf = toks.groupBy("_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.round(F.col("tf") * idf, 6)
    )
    w = W.partitionBy("_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("_id", "term", "tf", "df", "score", "rank")
    )


def unigram_logprob_scores(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Perplexity-style quality scoring with a self-trained unigram LM —
    the CCNet-style move (Wenzek et al., LREC 2020) of ranking documents
    by how probable they are under a language model trained on the corpus
    itself; low mean log-prob = out-of-distribution text (gibberish,
    boilerplate codes, wrong language). CCNet uses a 5-gram KenLM; the
    unigram LM is the same plumbing with a corpus-sized count table
    instead of a model file, and swaps in a real LM as a scoring UDF
    without changing the plan shape.

    Model: add-one-smoothed unigram probs p(t) = (c_t + 1)/(total + V)
    over the corpus's own token stream. Score: mean negative log prob per
    token (lower = more typical), and pseudo-perplexity exp(score).

    Plan: one token-count shuffle (map-side combined, vocabulary-sized
    output), two scalar aggregates (total, V) folded in as literals, then
    the per-(doc, term) counts join the prob table on the term (shuffle
    hash join — vocabulary-sized, Catalyst broadcasts when small) and one
    doc-keyed roll-up. Returns (id, n_tokens, mean_neg_logprob, pppl)."""
    n_t = df.select(F.explode(tokens(F.col(content_col))).alias("term"))
    # localCheckpoint, not persist (r14): the vocab table IS the trained
    # model — the totals .first() below materializes it once and the
    # per-doc join reuses it instead of re-exploding the corpus. A plain
    # persist() pinned one CacheManager entry PER CALL with no unpersist
    # point (the returned frame is lazy); the checkpointed RDD instead
    # lives exactly as long as the returned frame references it and is
    # freed by the ContextCleaner when the caller drops it — loop-scoring
    # no longer grows the cache (tests/test_text_multimodal.py pins it).
    vocab = (
        n_t.groupBy("term").agg(F.count("*").alias("c")).localCheckpoint(eager=True)
    )
    totals = vocab.agg(
        F.sum("c").alias("total"), F.count("*").alias("v")
    ).first()
    denom = float(totals.total + totals.v)
    logp = F.log((F.col("c") + 1) / F.lit(denom))
    probs = vocab.select("term", logp.alias("logp"))
    per_doc = (
        df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(content_col))).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count("*").alias("tf"))
        .join(probs, "term")
        .groupBy("_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(-F.sum(F.col("tf") * F.col("logp")) / F.sum("tf"), 6).alias(
                "mean_neg_logprob"
            ),
        )
    )
    return per_doc.withColumn(
        "pppl", F.round(F.exp(F.col("mean_neg_logprob")), 4)
    )


# ------------------------------------------------------------ PII redaction

#: Default redaction patterns — (placeholder, regex). Deliberately limited
#: to constructs whose semantics agree between Java regex (Spark) and RE2
#: (DuckDB), so the oracle can replicate the scrub exactly: character
#: classes, bounded repetition, alternation — no backrefs or lookaround.
#: Order is load-bearing: emails first (so `u@1.2.3.4` is one [EMAIL], not
#: a fragment plus an [IP]), IPs and SSNs before phones (the phone regex
#: accepts dot separators, so a 3-digit IP octet like `0.254` would
#: otherwise read as a phone).
PII_PATTERNS: list[tuple[str, str]] = [
    ("[EMAIL]", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("[IP]", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("[SSN]", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"),
    ("[PHONE]", r"\+?[0-9]{1,3}[- .][0-9]{3}[- .][0-9]{3,4}([- .][0-9]{3,4})?"),
]


def redact_pii(
    df: DataFrame,
    content_col: str,
    id_col: str,
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Scrub PII-shaped substrings from a text column — the standard
    pre-training compliance pass (emails, phone numbers, IPs, SSNs →
    typed placeholders).

    Scale: a chain of JVM regexp_replace expressions in the scan
    projection — whole-stage codegen, zero shuffle, no Python. Pattern
    order matters (emails before IPs so `user@1.2.3.4` redacts as one
    email, not an email fragment plus an IP); the chain applies them in
    list order. Returns (id, text_redacted, n_redactions)."""
    pats = patterns or PII_PATTERNS
    redacted = F.col(content_col)
    for placeholder, rx in pats:
        redacted = F.regexp_replace(redacted, rx, placeholder.replace("$", r"\$"))
    # redaction count = placeholder occurrences added by the scrub
    out = df.select(
        F.col(id_col), F.col(content_col).alias("_orig"), redacted.alias("text_redacted")
    )
    n = None
    for placeholder, _rx in pats:
        c = (
            F.length("text_redacted")
            - F.length(F.replace(F.col("text_redacted"), F.lit(placeholder), F.lit("")))
        ) / F.length(F.lit(placeholder))
        n = c if n is None else n + c
    return out.select(
        id_col,
        "text_redacted",
        n.cast("bigint").alias("n_redactions"),
    )


def bm25_topk(
    df: DataFrame,
    content_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Spärck Jones Okapi weighting) for a
    bag-of-terms query — the classic lexical-search scorer, here as one
    declarative plan:

      1. tokenize in the scan projection; per-doc length dl (no shuffle);
      2. explode ONLY tokens matching the query terms (the explode is
         pre-filtered, so its fan-out is hits, not corpus tokens), one
         groupBy (doc, term) for tf;
      3. document frequency n_t per term = a terms-sized frame, idf from
         the 1-row (N, avgdl) corpus stats frame — both sides broadcast;
      4. per-doc score roll-up, top-k by (rounded score, id).

    All corpus-sized exchanges are the two map-side-combined groupBys on
    (doc, term) and (doc); stats/idf never shuffle the corpus. Scores are
    rounded to 6 places BEFORE ranking so the order (and therefore the
    result set) is reproducible across summation orders; ties break to the
    smaller id. idf uses the +1 smoothing form ln(1+(N-n+.5)/(n+.5)) — no
    negative weights for common terms. Returns (id, score, rank)."""
    terms = sorted(set(query_terms))
    d = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(content_col)).alias("_t")
    ).select("_id", "_t", F.size("_t").cast("double").alias("dl"))
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("_id", "dl", F.explode("_t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    n_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("n_t"))
    scored = (
        tf.join(F.broadcast(n_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(1.0 + (F.col("n_docs") - F.col("n_t") + 0.5) / (F.col("n_t") + 0.5))
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    from pyspark.sql import Window as W

    # top-k as orderBy+limit (TakeOrderedAndProject — per-partition heaps,
    # no global sort); the rank window then runs over only k rows.
    topk = scored.orderBy(F.col("score").desc(), F.col("_id").asc()).limit(k)
    w = W.orderBy(F.col("score").desc(), F.col("_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("_id").alias(id_col), "score", "rank"
    )


def normalize_whitespace(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Whitespace/control normalization — the first pass of every corpus
    cleaner: control characters (incl. tabs/newlines) and zero-width
    code points become spaces, whitespace runs collapse to one space,
    ends trim. Pure scan-projection regexp chain (JVM, zero shuffle).
    Returns (id, text_norm)."""
    c = F.regexp_replace(
        F.col(content_col), "[\\p{Cc}\\u200B\\u200C\\u200D\\uFEFF]", " "
    )
    c = F.regexp_replace(c, r"\s+", " ")
    return df.select(F.col(id_col), F.trim(c).alias("text_norm"))


def remove_boilerplate_lines(
    df: DataFrame,
    content_col: str,
    id_col: str,
    min_docs: int = 3,
    min_line_chars: int = 10,
) -> DataFrame:
    """Corpus-wide boilerplate-line removal (the C4 cleaning rule: a line
    repeated across ≥ min_docs documents is template chrome — nav bars,
    cookie banners, footers — and is dropped from every document).

    Plan (linear, no pairwise stage anywhere):
      1. posexplode lines per doc, trim, keep lines ≥ min_line_chars
         (short lines — "Home", "1", "" — are exempt from the census AND
         from removal: dropping every "yes" in a corpus is not cleaning)
      2. census: count DISTINCT docs per line — one shuffle on the line
         value; partial agg bounds it by per-partition distinct lines
      3. frequent set (doc_count ≥ min_docs) joins back onto the line
         rows by value — an equi-join Catalyst/AQE plans as broadcast
         while the boilerplate set is small and as a shuffle join when a
         100 TB crawl's template space outgrows the threshold (no forced
         hint, per the round-6 rule)
      4. reassemble surviving lines per doc in original order — one
         shuffle on id

    Returns (id, text_clean, n_lines, n_dropped); docs that were ALL
    boilerplate survive with empty text_clean, preserving corpus
    cardinality for downstream stage accounting.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias("_pos", "_raw"),
    ).select("_id", "_pos", F.trim(F.col("_raw")).alias("_line"))
    cen = F.length("_line") >= min_line_chars
    census = (
        lines.filter(cen)
        .groupBy("_line")
        .agg(F.countDistinct("_id").alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_line", F.lit(True).alias("_boiler"))
    )
    tagged = lines.join(census, "_line", "left").withColumn(
        "_drop", cen & F.coalesce(F.col("_boiler"), F.lit(False))
    )
    return (
        tagged.groupBy("_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("_drop"), F.struct("_pos", "_line"))
                        )
                    ),
                    lambda s: s["_line"],
                ),
            ).alias("text_clean"),
            F.count("*").alias("n_lines"),
            F.sum(F.col("_drop").cast("bigint")).alias("n_dropped"),
        )
        .select(F.col("_id").alias(id_col), "text_clean", "n_lines", "n_dropped")
    )


def hashed_linear_quality(
    df: DataFrame,
    content_col: str,
    id_col: str,
    dim: int = 1024,
    threshold: float = 0.0,
) -> DataFrame:
    """FastText-shaped quality classifier plumbing: token → hashed
    feature bucket → weight lookup → mean score → keep flag. The weights
    here are a deterministic formula over the bucket id (so the oracle
    can replay them bit-for-bit); a production classifier replaces the
    formula with `element_at(<broadcast literal weight array>, bucket)`
    — the identical plan shape, which is the point: model-scored quality
    filtering runs entirely in the scan projection, zero shuffles, JVM
    codegen, at any corpus scale.

    bucket(t) = int(md5(t)[:8], 16) % dim  (md5-based so every engine
    agrees); w_int(b) = ((b*37 + 11) % 97) - 48, an INTEGER in [-48, 48]
    summed exactly (float folds are association-sensitive in the last
    ulp, which flips round(·, 6) at boundaries — integer sums are not);
    score = sum_w / 97 / n_tokens rounded to 6dp.
    Returns (id, n_tokens, quality_score, keep)."""
    d = df.select(
        F.col(id_col), tokens(F.col(content_col)).alias("_toks")
    )
    w = (
        f"aggregate(_toks, CAST(0 AS BIGINT), (acc, t) -> acc + "
        f"((((CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT) % {dim})"
        f" * 37 + 11) % 97) - 48))"
    )
    score = F.round(
        F.expr(w).cast("double") / 97.0 / F.greatest(F.size("_toks"), F.lit(1)), 6
    )
    return d.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        score.alias("quality_score"),
        (score >= threshold).cast("int").alias("keep"),
    )


def dsir_log_weights(
    df: DataFrame,
    content_col: str,
    id_col: str,
    target_cond,
    dim: int = 1024,
) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.,
    NeurIPS 2023): score every raw document by how target-like its hashed
    n-gram feature distribution is, log w(x) = Σ_features log p̂_target(b)
    − log p̂_raw(b). The canonical pretraining-data curation move: pick a
    small trusted target set (here a predicate over the corpus itself —
    in production, Wikipedia/books), fit two smoothed bag-of-hashed-grams
    models, and weight raw docs by the likelihood ratio for resampling.

    Features are DSIR's own: word unigrams + bigrams, hashed into `dim`
    buckets with the md5-prefix bucket hash every engine reproduces
    (hashed_linear_quality's scheme). Both models are add-one smoothed
    over the full bucket spine, so unseen buckets contribute a finite
    ratio instead of dropping terms. (Single-token docs contribute their
    token twice — the bigram window degenerates to the unigram; the
    oracle replays the same formula, see shingles().)

    Plan shape at 100 TB (r13 rewrite, guide §2.4 — remove shuffles
    outright): BOTH models fit in ONE map-side-combined bucket count
    (the target membership rides the exploded rows as a flag, so target
    count = a conditional sum in the same aggregate — one corpus pass,
    not two). The λ model is then folded into a SINGLE dim-wide array
    row (collect over ≤ dim bucket counts — O(dim) state, never
    vocabulary-sized, the same bounded-spine class as the centroid
    collects) which is broadcast onto the scoring scan, and each doc's
    log weight is Σ_g λ[bucket(g)] over its own grams:
    scoring explodes grams and projects λ[bucket(g)] per row in codegen
    (a per-doc higher-order fold was measured 2.4× SLOWER — interpreted
    lambdas lose whole-stage codegen on the md5+conv hot loop), then
    rolls up per doc on ONE slim (id, λ) exchange with map-side partial
    aggregation. The previous shape exploded the corpus to (doc, bucket)
    rows, shuffled them into a per-(doc,bucket) count, broadcast-joined
    the 1024-row λ table and re-aggregated per doc — two corpus-sized
    exchanges + a join, measured ~1.5 s of the sf0.1 wall. The eager
    totals `.first()` is gone: totals fold over the same collected count
    row, keeping the operator lazy. The λ spine is NOT persisted (r14):
    it is referenced once, so the old per-call persist pinned a cache
    entry per invocation and bought nothing; a caller scoring repeatedly
    persists the RESULT frame. Both corpus scans are
    scan_parallelize'd so the md5 gram hashing spreads across cores even
    on a one-file local scan (the old scoring pass hashed on the scan's
     1-2 partitions). Returns (id, n_grams, log_weight) with log_weight
    rounded to 6dp after the sum (FP-association drift between partial-
    aggregation orders is ~1e-13 on O(100)-term sums, far inside the 6dp
    rounding; the precedent is unigram_logprob_scores). Docs with NULL
    content stay absent from the output, exactly as before (explode
    drops them)."""
    from dataux_spark.operators.dedup import scan_parallelize, shingles

    bucket = (
        F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast("bigint") % dim
    ).alias("bucket")
    # BOTH bucket counts from one corpus pass: the target flag rides each
    # exploded row (the λ table IS the fitted model — the artifact a
    # production pipeline checkpoints; unigram_logprob_scores precedent)
    flagged = (
        scan_parallelize(
            df.select(F.col(id_col).alias("_id"),
                      target_cond.cast("long").alias("_tgt"),
                      tokens(F.col(content_col)).alias("_toks"))
        )
        .select("_tgt", F.explode(F.concat(F.col("_toks"),
                                           shingles("_toks", 2))).alias("_g"))
        .select("_tgt", bucket)
    )
    counts = flagged.groupBy("bucket").agg(
        F.sum("_tgt").alias("tc"), F.count("*").alias("rc")
    )
    # Collapse the ≤ dim count rows into ONE row holding the λ array
    # (index = bucket). Smoothed log-ratio identical to the per-row λ
    # table this replaces: ln((tc+1)/(Σtc+dim)) − ln((rc+1)/(Σrc+dim)),
    # with absent buckets contributing tc = rc = 0 (the old zero-filled
    # spine). All divisions double, same IEEE ops as before.
    lam_row = (
        counts.agg(F.collect_list(F.struct("bucket", "tc", "rc")).alias("_c"))
        .select(
            F.expr(
                "map_from_entries(transform(_c, "
                "x -> struct(x.bucket, named_struct('tc', x.tc, 'rc', x.rc))))"
            ).alias("_m"),
            F.expr("aggregate(_c, CAST(0 AS BIGINT), (a, x) -> a + x.tc)").alias("_tt"),
            F.expr("aggregate(_c, CAST(0 AS BIGINT), (a, x) -> a + x.rc)").alias("_tr"),
        )
        .select(
            F.expr(
                f"transform(sequence(0, {dim - 1}), b -> "
                f"ln((coalesce(_m[CAST(b AS BIGINT)].tc, 0) + 1) / CAST(_tt + {dim} AS DOUBLE)) - "
                f"ln((coalesce(_m[CAST(b AS BIGINT)].rc, 0) + 1) / CAST(_tr + {dim} AS DOUBLE)))"
            ).alias("_lam")
        )
    )
    return (
        scan_parallelize(
            df.select(F.col(id_col).alias("_id"),
                      tokens(F.col(content_col)).alias("_toks"))
        )
        .select("_id", F.explode(F.concat(F.col("_toks"),
                                          shingles("_toks", 2))).alias("_g"))
        # no persist on the 1-row λ spine (r14): it is referenced exactly
        # once (this broadcast), so the old per-call persist() pinned a
        # CacheManager entry per invocation and bought nothing within an
        # action; a caller scoring repeatedly persists the RESULT frame
        .crossJoin(F.broadcast(lam_row))
        .select(
            "_id",
            F.expr(
                f"_lam[CAST(CAST(conv(substring(md5(_g), 1, 8), 16, 10) AS BIGINT)"
                f" % {dim} AS INT)]"
            ).alias("_l"),
        )
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("_l"), 6).alias("log_weight"),
        )
        .withColumnRenamed("_id", id_col)
    )


def dsir_select_topk(
    df: DataFrame,
    content_col: str,
    id_col: str,
    target_cond,
    k: int,
    dim: int = 1024,
) -> DataFrame:
    """Deterministic DSIR selection: rank raw docs by log importance
    weight (ties to the smaller id) and keep the top k. The paper
    resamples with Gumbel noise; a seeded Gumbel column drops in as an
    extra sort key without changing the plan — deterministic rank is the
    oracle-checkable spelling. Global top-k = TakeOrderedAndProject over
    the dim-bounded weight frame, not a full sort."""
    w = dsir_log_weights(df, content_col, id_col, target_cond, dim)
    return (
        w.orderBy(F.col("log_weight").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "n_grams", "log_weight")
    )


def bm25_postings_frame(
    df: DataFrame,
    content_col: str,
    id_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """The EXACT (lazy) posting-list frame build_bm25_index writes — the
    dominant build cost — exposed so bench.py can plan-fingerprint the
    build phase without duplicating its plan logic (VERDICT r10 item 3).
    The termdf/stats side frames derive from this one."""
    d = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(content_col)).alias("_t")
    ).select("_id", "_t", F.size("_t").cast("double").alias("dl"))
    return (
        d.select("_id", "dl", F.explode("_t").alias("term"))
        .groupBy("_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int"))
    )


def build_bm25_index(
    df: DataFrame,
    content_col: str,
    id_col: str,
    index_path: str,
    n_buckets: int = 64,
) -> None:
    """Materialize the BM25 inverted index on disk: posting lists
    (term, doc, tf, dl) partitioned by a term-hash bucket, per-term
    document frequencies in the same bucketed layout, 1-row corpus stats
    alongside — the lexical-search serving layout (build_ivf_index's
    contract for text). Build once, query many.

    Scale: `tb` is a parquet PARTITION column, so a probe for q query
    terms reads only their buckets' files via partition pruning — query
    cost follows the probed posting lists, never the corpus. Bucket count
    trades pruning granularity against small-file overhead; postings
    within a bucket are one groupBy-shaped write (map-side combined)."""
    d = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(content_col)).alias("_t")
    ).select("_id", "_t", F.size("_t").cast("double").alias("dl"))
    postings = bm25_postings_frame(df, content_col, id_col, n_buckets)
    postings.repartition("tb").write.mode("overwrite").partitionBy("tb").parquet(
        f"{index_path}/postings"
    )
    spark = df.sparkSession
    spark.read.parquet(f"{index_path}/postings").groupBy("tb", "term").agg(
        F.count("*").cast("double").alias("n_t")
    ).repartition("tb").write.mode("overwrite").partitionBy("tb").parquet(
        f"{index_path}/termdf"
    )
    d.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/stats")


def bm25_index_topk(
    spark,
    index_path: str,
    query_terms: list[str],
    id_col: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_buckets: int = 64,
) -> DataFrame:
    """Query a persisted BM25 index: identical scoring (and bit-identical
    results — asserted in tests) to the in-memory bm25_topk, but reading
    ONLY the query terms' posting-list buckets. The term-bucket filter is
    a literal IN over the partition column, so pruning happens at plan
    time at the FILE level; the probed postings then filter to the exact
    terms, join the (broadcast) pruned term-df and 1-row stats frames,
    and roll up per-doc top-k."""
    terms = sorted(set(query_terms))
    # Query-term bucket ids as a constant-foldable SELECT (r13): xxhash64
    # over literals folds at plan time into a LocalRelation, so this
    # collect runs NO job — the old createDataFrame+collect spelling
    # built an RDD-backed frame and paid a full job per probe (measured
    # ~0.35-0.5 s warm vs ~0.06-0.1 s). Same JVM hash, same bucket ids.
    # r14 (ADVICE r13): terms bind as NAMED parameters, not string-built
    # literals, so the spelling is independent of
    # spark.sql.parser.escapedStringLiterals (named rather than
    # positional — repeated `?` slots misbind inside inline tables in
    # Spark 4.1, see rollup.cms_estimates); and an empty term list
    # short-circuits instead of parsing "SELECT " (empty projection).
    if terms:
        sel = ", ".join(
            f"CAST(pmod(xxhash64(:t{n}), {int(n_buckets)}) AS INT)"
            for n in range(len(terms))
        )
        args = {f"t{n}": t for n, t in enumerate(terms)}
        tbs = sorted(set(spark.sql(f"SELECT {sel}", args=args).collect()[0]))
    else:
        tbs = []
    postings = (
        spark.read.parquet(f"{index_path}/postings")
        .filter(F.col("tb").isin(tbs))
        .filter(F.col("term").isin(terms))
    )
    n_t = (
        spark.read.parquet(f"{index_path}/termdf")
        .filter(F.col("tb").isin(tbs))
        .filter(F.col("term").isin(terms))
        .select("term", "n_t")
    )
    stats = spark.read.parquet(f"{index_path}/stats")
    scored = (
        postings.join(F.broadcast(n_t), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log(1.0 + (F.col("n_docs") - F.col("n_t") + 0.5) / (F.col("n_t") + 0.5))
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    from pyspark.sql import Window as W

    topk = scored.orderBy(F.col("score").desc(), F.col("_id").asc()).limit(k)
    w = W.orderBy(F.col("score").desc(), F.col("_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("_id").alias(id_col), "score", "rank"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) — the standard
    hybrid-retrieval combiner: each input ranking contributes
    1/(rrf_k + rank) per doc, summed across rankings; robust to
    incomparable score scales (BM25 vs cosine), which is why it is the
    default fusion in hybrid lexical+vector search. Inputs are (id, rank)
    frames (any extra columns ignored); a doc absent from a ranking
    simply contributes nothing.

    Scale: each ranking is top-k-sized by construction (the expensive
    retrieval already happened), so the union + groupBy is bounded by
    k × len(rankings) rows — negligible next to the retrieval stages.
    The RRF score is EXACT in double (a sum of dyadic-free rationals
    computed identically everywhere) and rounded to 6dp before the final
    rank; ties break to the smaller id. Returns (id, rrf_score, rank)."""
    from functools import reduce

    from pyspark.sql import Window as W

    parts = [
        r.select(F.col(id_col), (1.0 / (F.lit(rrf_k) + F.col("rank"))).alias("_c"))
        for r in rankings
    ]
    fused = (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("rrf_score"))
    )
    topk = fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(k)
    w = W.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w))


def chunk_documents(
    df: DataFrame,
    content_col: str,
    id_col: str,
    size: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/RAG indexing
    split (and the fixed-window variant of sequence packing): each doc
    yields windows of `size` tokens starting every `stride` tokens
    (stride < size ⇒ overlap of size-stride tokens, so a span near a cut
    is whole in the next window). The last window starts at the final
    stride boundary covering the tail; docs shorter than `size` yield
    exactly one chunk.

    Pure scan-projection higher-order functions — the explode fans out
    ~n_tokens/stride rows per doc with zero shuffles; every chunk carries
    (id, chunk_idx, n_tokens, chunk_text) for downstream embedding or
    indexing."""
    n_chunks = (
        "greatest(cast(ceil((size(_toks) - " + str(size) + ") / "
        + str(float(stride)) + ") as int) + 1, 1)"
    )
    wins = F.expr(
        f"transform(sequence(0, {n_chunks} - 1), "
        f"i -> struct(i AS ci, slice(_toks, i * {stride} + 1, {size}) AS w))"
    )
    return (
        df.select(F.col(id_col), tokens(F.col(content_col)).alias("_toks"))
        .select(id_col, F.explode(wins).alias("_w"))
        .select(
            F.col(id_col),
            F.col("_w.ci").alias("chunk_idx"),
            F.size("_w.w").alias("n_tokens"),
            F.concat_ws(" ", "_w.w").alias("chunk_text"),
        )
    )


def collocations_pmi(
    df: DataFrame,
    content_col: str,
    id_col: str,
    min_count: int = 3,
    k: int = 50,
) -> DataFrame:
    """Collocation mining — top-k adjacent-bigram PMI over the corpus:
    pmi(a,b) = log2( (c(a,b) · N) / (c(a) · c(b)) ) with N = total
    bigram occurrences, keeping bigrams seen ≥ min_count times (PMI is
    noise for rare pairs). The vocabulary-curation staple: high-PMI
    pairs are the multi-word units a tokenizer should keep whole.

    Plan shape (r13, guide §2.3/§2.4 — fewer corpus passes): bigram
    arrays are built JVM-side per document (zip_with over two slices of
    the token array — no window, no shuffle), then ONE bigram count
    groupBy and ONE unigram count groupBy. N = Σ_docs (|toks| − 1) is a
    1-row aggregate over token-array SIZES — no explode, no bigram
    strings — and rides a 1-row broadcast (bit-identical to counting
    the exploded rows: every size ≥ 2 doc yields exactly |toks| − 1
    bigrams). The surviving (≥ min_count) bigrams attach BOTH word
    counts through a single join: each bigram explodes to its two
    (pos, word) rows, joins the unigram counts once, and folds back
    with a tiny grouped pivot — the old spelling joined the unigram
    subtree twice, and with no cross-branch CSE each join side re-ran
    the corpus-wide unigram count (measured: 4 corpus scans → 2).
    Division spelled (cb·N)/(ca·cb-product) in that exact order so the
    DuckDB oracle's doubles agree bit-for-bit before the shared 6dp
    rounding.

    A pipeline running this hot should persist the tokenized frame and
    cut the two remaining passes to one; as a one-shot query the extra
    pruned scan is the measured-cheaper trade vs operator-internal
    persistence (the same reasoning as minhash_lsh_pairs' grams=)."""
    from dataux_spark.operators.dedup import tokens

    t = df.select(F.col(id_col), tokens(F.col(content_col)).alias("_toks")).filter(
        F.size("_toks") >= 2
    )
    bigrams = t.select(
        F.explode(
            F.expr(
                "zip_with(slice(_toks, 1, size(_toks) - 1), "
                "slice(_toks, 2, size(_toks) - 1), "
                "(a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram")
    )
    unigrams = df.select(
        F.explode(tokens(F.col(content_col))).alias("w")
    ).groupBy("w").agg(F.count("*").alias("cw"))
    bc = (
        bigrams.groupBy("bigram").agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    nb = t.agg(F.sum(F.size("_toks") - 1).cast("double").alias("_nb"))
    sides = bc.select(
        "bigram",
        "pair_count",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("_pos"),
                    F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w"),
                ),
                F.struct(
                    F.lit(2).alias("_pos"),
                    F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w"),
                ),
            )
        ).alias("_s"),
    ).select("bigram", "pair_count", F.col("_s._pos").alias("_pos"), F.col("_s.w").alias("w"))
    scored = (
        sides.join(unigrams, "w")
        .groupBy("bigram", "pair_count")
        .agg(
            F.max(F.when(F.col("_pos") == 1, F.col("cw"))).alias("_ca"),
            F.max(F.when(F.col("_pos") == 2, F.col("cw"))).alias("_cb"),
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "bigram",
            "pair_count",
            F.round(
                F.log2(
                    (F.col("pair_count").cast("double") * F.col("_nb"))
                    / (F.col("_ca").cast("double") * F.col("_cb").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "bigram").limit(k)


# --------------------------------------------------------- taxonomy tagging

def tag_by_dictionary(
    df: DataFrame,
    content_col: str,
    id_col: str,
    taxonomy: dict[str, list[str]],
    min_hits: int = 1,
) -> DataFrame:
    """Dictionary/taxonomy tagging — the curation staple of labeling docs
    by topic keyword lists (domain routing, topic-balanced mixtures,
    blocklist screening) before any model-based classifier exists.

    `taxonomy` maps topic → term list. Topic vocabularies are small by
    construction (curated keyword lists), so each term set inlines as a
    literal array and the whole pass is ONE zero-shuffle scan projection:
    n_hits(topic) = size(array_intersect(distinct_tokens, terms)) — the
    number of DISTINCT taxonomy terms present (set semantics: a term
    repeated 50× counts once, which is the robust signal for topical
    routing; min_hits=2+ guards against single stray keywords). No
    explode, no join, no shuffle — the corpus is touched once and
    whole-stage codegen applies; output is O(docs × matching topics).
    For taxonomies too wide to inline (10⁵+ terms) explode tokens and
    broadcast-join the dictionary instead. Returns (id, topic, n_hits)
    for topics with n_hits ≥ min_hits."""
    toks = F.array_distinct(tokens(F.col(content_col)))
    d = df.select(F.col(id_col), toks.alias("_set"))
    structs = []
    for topic in sorted(taxonomy):
        lit = F.array(*[F.lit(t) for t in sorted(set(taxonomy[topic]))])
        structs.append(
            F.struct(
                F.lit(topic).alias("topic"),
                F.size(F.array_intersect(F.col("_set"), lit)).alias("n_hits"),
            )
        )
    exploded = d.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("_t")
    )
    return exploded.filter(F.col("_t.n_hits") >= min_hits).select(
        F.col(id_col), F.col("_t.topic").alias("topic"), F.col("_t.n_hits").alias("n_hits")
    )


def vocab_coverage(
    df: DataFrame,
    content_col: str,
    ks: list[int] = (100, 1000, 10000),
) -> DataFrame:
    """Tokenizer-budget planning signal: what fraction of the corpus's
    token OCCURRENCES would a vocabulary of the k most frequent types
    cover, for each requested k — the curve that decides vocab size
    before a tokenizer is trained (coverage at 10k vs 50k types is the
    whole argument). Whitespace types here; the shape is identical for
    any pre-tokenizer.

    Plan: one map-side-combined (token) census — the only corpus-sized
    shuffle — then TakeOrderedAndProject of the top max(ks) types
    (count desc, token asc: deterministic), a rank window over that
    max(ks)-row frame (bounded by the ARGUMENT, not the vocabulary, so
    the global window is safe), and a broadcast 1-row total. The census
    frame is type-sized, never occurrence-sized; the full-vocab
    cumulative curve is deliberately NOT computed — it would need a
    vocabulary-wide single-partition running sum.

    Returns (k, covered_occurrences, total_occurrences, coverage) per k,
    coverage rounded 6dp."""
    from pyspark.sql import Window as W

    from dataux_spark.operators.dedup import tokens

    kmax = max(ks)
    census = (
        df.select(F.explode(tokens(F.col(content_col))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    total = census.agg(F.sum("cnt").alias("_total"))
    top = census.orderBy(F.col("cnt").desc(), "tok").limit(kmax)
    w = W.orderBy(F.col("cnt").desc(), "tok")
    ranked = top.withColumn("_rn", F.row_number().over(w))
    spine = F.array(*[F.lit(int(k)) for k in ks])
    per_k = (
        ranked.select(F.explode(spine).alias("k"), "_rn", "cnt")
        .filter(F.col("_rn") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("cnt").alias("covered_occurrences"))
    )
    return (
        per_k.crossJoin(F.broadcast(total))
        .select(
            "k",
            "covered_occurrences",
            F.col("_total").alias("total_occurrences"),
            F.round(F.col("covered_occurrences") / F.col("_total"), 6).alias(
                "coverage"
            ),
        )
    )


def bigram_logprob_scores(
    df: DataFrame, content_col: str, id_col: str, lam: float = 0.7
) -> DataFrame:
    """Interpolated-bigram LM quality scoring — unigram_logprob_scores
    one Markov order up, which is what separates "right words, wrong
    order" text (scrambles, SEO keyword soup, table dumps) from prose:
    a unigram model scores those identically.

    Model, self-trained on the corpus (the CCNet pattern):
      P(w2 | w1) = λ · C(w1 w2)/C(w1) + (1-λ) · (C(w2)+1)/(total+V)
    — ML bigram interpolated with the add-one unigram, the classic
    Jelinek-Mercer mixture; unseen bigrams degrade smoothly to the
    unigram floor instead of zeroing a document.

    Plan: the SAME checkpoint pattern as the unigram scorer — one
    unigram census and one bigram census (both map-side combined,
    vocabulary-sized, checkpointed as the trained model), scalar totals
    folded in as literals, then the per-(doc, bigram) counts join the
    two count tables and roll up per doc. Bigram arrays come from the
    same zip_with idiom as repetition_profile — no second tokenizer.
    Score: mean negative log prob per bigram, rounded 6dp. Returns
    (id, n_bigrams, mean_neg_logprob, pppl) for docs with >= 2 tokens."""
    toks = tokens(F.col(content_col))
    bigrams = F.expr(
        "filter(zip_with(_t, slice(_t, 2, size(_t)), (a, b) -> (a, b)), "
        "p -> p.b IS NOT NULL)"
    )
    doc_bg = (
        df.select(F.col(id_col).alias("_id"), toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .select("_id", F.explode(bigrams).alias("_bg"))
        .select("_id", F.col("_bg.a").alias("w1"), F.col("_bg.b").alias("w2"))
    )
    # uni: localCheckpoint for the same reason as the unigram scorer's
    # vocab table (eager totals + two lazy references; GC-bound lifetime
    # instead of a leaked per-call cache entry). bg: its persist() bought
    # NOTHING — the bigram census is referenced exactly once in the
    # returned plan and nothing eager touches it, so the entry only
    # leaked; dropped (r14).
    uni = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cu"))
        .localCheckpoint(eager=True)
    )
    bg = doc_bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    totals = uni.agg(F.sum("cu").alias("total"), F.count("*").alias("v")).first()
    denom = float(totals.total + totals.v)
    cu1 = uni.select(F.col("term").alias("w1"), F.col("cu").alias("cu1"))
    cu2 = uni.select(F.col("term").alias("w2"), F.col("cu").alias("cu2"))
    p = F.lit(float(lam)) * F.col("cb") / F.col("cu1") + F.lit(
        1.0 - float(lam)
    ) * (F.col("cu2") + 1) / F.lit(denom)
    return (
        doc_bg.groupBy("_id", "w1", "w2")
        .agg(F.count("*").alias("tf"))
        .join(bg, ["w1", "w2"])
        .join(cu1, "w1")
        .join(cu2, "w2")
        .groupBy("_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(-F.sum(F.col("tf") * F.log(p)) / F.sum("tf"), 6).alias(
                "mean_neg_logprob"
            ),
        )
        .select(
            F.col("_id"),
            "n_bigrams",
            "mean_neg_logprob",
            F.round(F.exp("mean_neg_logprob"), 4).alias("pppl"),
        )
    )


def lexical_drift_js(
    ref: DataFrame,
    cur: DataFrame,
    content_col: str,
    vocab_k: int = 1000,
    eps: float = 1e-6,
) -> DataFrame:
    """Jensen-Shannon lexical drift between a reference corpus slice and
    a new one — the TOKEN-level sibling of profile.distribution_drift_psi
    (which watches numeric columns): did the new crawl batch's language
    itself move (new spam vocabulary, a template flood, a language-mix
    shift)? JS rather than KL because both directions matter and the
    score is bounded [0, ln 2], so one threshold works for any corpus.

    The comparison space is the top `vocab_k` types of the COMBINED
    census (count desc, token asc — deterministic, the vocab_coverage
    rank), everything else folded into an explicit OOV row so both
    distributions are total (the PSI dense-spine rule: dropping the tail
    under-reports drift exactly when it is largest). Proportions are
    eps-smoothed before the logs so a token absent from one side
    contributes a finite term.

    Plan: one census groupBy per side, a top-k over the combined census
    (TakeOrderedAndProject, bounded by the argument), two broadcast
    1-row totals — everything after the censuses is O(vocab_k) rows.
    Returns (token, p_ref, q_cur, js_term) with token '<OOV>' carrying
    the folded tail; sum(js_term) is the headline divergence."""
    from pyspark.sql import Window as W

    def census(df: DataFrame, out: str) -> DataFrame:
        from dataux_spark.operators.dedup import tokens

        return (
            df.select(F.explode(tokens(F.col(content_col))).alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count("*").alias(out))
        )

    rc, cc = census(ref, "rn"), census(cur, "cn")
    both = rc.join(cc, "tok", "full").select(
        "tok",
        F.coalesce("rn", F.lit(0)).alias("rn"),
        F.coalesce("cn", F.lit(0)).alias("cn"),
    )
    in_vocab = both.orderBy(
        F.desc(F.col("rn") + F.col("cn")), "tok"
    ).limit(vocab_k)
    oov = both.join(in_vocab.select("tok"), "tok", "left_anti").agg(
        F.lit("<OOV>").alias("tok"),
        F.coalesce(F.sum("rn"), F.lit(0)).alias("rn"),
        F.coalesce(F.sum("cn"), F.lit(0)).alias("cn"),
    )
    space = in_vocab.unionByName(oov)
    totals = space.agg(
        F.sum("rn").alias("_tr"), F.sum("cn").alias("_tc")
    )
    p = F.greatest(F.col("rn") / F.col("_tr"), F.lit(float(eps)))
    q = F.greatest(F.col("cn") / F.col("_tc"), F.lit(float(eps)))
    m = (p + q) / 2
    term = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    return space.crossJoin(F.broadcast(totals)).select(
        "tok",
        F.round(p, 9).alias("p_ref"),
        F.round(q, 9).alias("q_cur"),
        F.round(term, 9).alias("js_term"),
    )
