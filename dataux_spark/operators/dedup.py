"""Deduplication operators for web-scale corpus cleaning.

The dedup families, each designed for the 100 TB regime:

  exact          — hash-groupBy on content digest. One shuffle on the
                   digest; digests are near-unique so no skew.
  fingerprint    — canonicalized content (sorted distinct tokens) digest;
                   catches token-order shuffles. Same cost as exact.
  ngram_jaccard  — exact pairwise Jaccard within blocking keys. Quadratic
                   *within a block only*; blocks are (lang, length-bucket),
                   so it's the verify stage after candidate generation, not
                   a corpus-wide scan.
  minhash_lsh    — shingle → minhash signature → banded LSH bucket join →
                   verified Jaccard. The scale path: candidate generation is
                   a groupBy on (band, bandhash) — linear shuffles, no n².
  simhash        — 64-bit simhash + WWW'07 combination blocking (d-bit
                   hamming radius → some (chunks−d)-chunk combination
                   equal), verified by hamming.
  semantic       — SemDeDup: nearest-centroid clustering + within-cluster
                   cosine pruning; quadratic only within clusters, k is
                   the knob that bounds them. (The banded hamming join is
                   shared with multimodal perceptual hashes via
                   hamming_pairs.)

Everything below is built-in Spark expressions (split / transform /
array_min / xhash64 / groupBy) — no Python in the hot path; whole-stage
codegen applies end-to-end.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation, functions as F

_LOG = logging.getLogger("dataux_spark.dedup")

# Saturation threshold for the data-adaptive candidate routers: a census
# that estimates more than this many candidate pairs per document routes
# candidate generation off the exact prefix scheme (whose keys are the
# content vocabulary and saturate on non-Heaps corpora) onto a banded
# scheme whose key space grows with the corpus regardless of vocabulary.
# ONE definition — choose_jaccard_route / choose_containment_route default
# to it, the dedup_route_census / dedup_containment_census observability
# entries interpolate it into BOTH their Python bodies and their oracle
# SQL, and tools/explain_audit.py resolves routes with it (ADVICE r10:
# the three copies must not drift independently).
#
# UNIT (ADVICE r11): the constant means "estimated candidate JOIN ROWS
# per document" — each family measured in its own join's native unit.
# The Jaccard census counts unordered pairs (Σ c·(c−1)/2: its candidate
# join emits each pair once via _id < _id), while the containment census
# counts ordered prefix×full rows (Σ pc·(fc−1): its asymmetric join is
# directional, so the symmetric part appears ~2×). The shared threshold
# therefore flips the containment router at roughly HALF the unordered-
# pair density — deliberate, not drift: the census estimates each
# route's own work, and the directional join really does pay ~2× rows
# on the same corpus. Both tested corpora sit far from the boundary
# (1.07 vs 61.6 at the two sfs), so the reading is identical either way.
SATURATION_CAND_PER_DOC: float = 8.0

# Defaults of the containment router's saturated route — module constants
# (not bare signature literals) because tools/scale_probe.py's
# containment_band_keys frame must size the SAME banding the route uses;
# re-typed copies are the drift class ADVICE r10 flagged on the Jaccard
# threshold.
CONTAINMENT_RATIO_CAP: float = 1.5
CONTAINMENT_TARGET_RECALL: float = 0.98
CONTAINMENT_ROWS_PER_BAND: int = 3

# Bounds of the census-derived hot-bucket cap the adaptive routers apply
# on their minhash routes (routed_max_bucket below). Module constants so
# tests and the clique scale probe size the SAME policy the live routers
# use — never re-type them.
ROUTED_MAX_BUCKET_FLOOR: int = 64
ROUTED_MAX_BUCKET_CEIL: int = 8192

# Segment width of the chunked in-bucket pair expansion (VERDICT r12
# hardening item 2): a bucket's b·(b−1)/2 candidate pairs are expanded
# segment×segment instead of as ONE flatten(transform(...)) array value,
# so no single generator input cell ever exceeds SEGMENT² structs
# (~1M at 1024 — ~32 MB order) even at the 8192 cap ceiling, where the
# unchunked form materialized ~33.5M structs (~1 GB order) in one cell.
# Segment-pair rows of one bucket stay in one task (no extra shuffle);
# the bound is per-ARRAY-CELL memory, which is what spikes on
# adversarial many-near-cap-bucket corpora.
BUCKET_PAIR_SEGMENT: int = 1024


def routed_max_bucket(
    n_docs: int, cand_per_doc: float = SATURATION_CAND_PER_DOC
) -> int:
    """Census-derived default for the minhash routes' hot-bucket backstop
    (VERDICT r11: the `max_bucket` cap existed on minhash_lsh_pairs /
    containment_minhash_pairs but neither adaptive router could engage
    it — an unreachable skew guard on exactly the saturated-corpus path
    the routers exist for).

    Policy: a bucket of size b expands b·(b−1)/2 ≈ b²/2 candidate pairs
    inside ONE collect_list task. The router switched to the minhash
    route precisely to keep TOTAL candidates near its own linear budget
    of cand_per_doc·n_docs — so any single bucket whose own expansion
    exceeds that whole-corpus budget (b²/2 > cand_per_doc·n ⟺
    b > sqrt(2·cand_per_doc·n)) is boilerplate skew, not near-dup
    signal, and is dropped from candidate generation. Clamped to
    [ROUTED_MAX_BUCKET_FLOOR, ROUTED_MAX_BUCKET_CEIL]: the floor keeps
    small corpora from clipping legitimate clusters (a 64-doc bucket is
    plausible organic structure at any n), the ceiling bounds the
    single-task expansion to ≤ ~33.5M pair structs regardless of corpus
    size (at 100 TB the sqrt term would otherwise grow past what one
    task should materialize). Measured at every tested scale (r12:
    max bucket 3/5/50 at n = 500/5,000/50,000 vs caps 90/283/895) the
    cap is far above every real bucket — output is bit-identical with
    and without it; docs inside a dropped bucket still pair through
    their other bands unless they collide on EVERY hot band, i.e.
    near-exact content (J ≈ 1). ADVICE r12 correction: that near-exact
    class INCLUDES template-plus-one-token variants (timestamp/counter
    edits) which defeat BOTH the exact digest and the sorted-token
    fingerprint while keeping J ≈ 0.99 — so upstream exact/fingerprint
    dedup does NOT remove them, and on a corpus with a giant cluster of
    such variants the cap erases that cluster's pairs. That is the
    engineered trade (bounded per-task work over complete recall on
    k ≫ cap near-exact cliques; measured at k = 10,000 in SCALE.md r13),
    it is OBSERVABLE — every capped run carries a drop census
    (last_cap_census / drain_cap_censuses below log dropped
    buckets/doc-slots) — and the surviving mitigation is a
    HIGH-THRESHOLD near-exact pass upstream (e.g. minhash at j ≥ 0.95,
    or dedup_winnow_fingerprints), not exact/fingerprint dedup."""
    import math

    raw = math.ceil(math.sqrt(2.0 * float(cand_per_doc) * max(int(n_docs), 1)))
    return max(ROUTED_MAX_BUCKET_FLOOR, min(ROUTED_MAX_BUCKET_CEIL, raw))


# Pending cap-drop censuses: one Observation per capped in-bucket
# expansion, filled by Spark when the first action runs on the returned
# pairs frame (zero extra jobs — the metrics ride the action itself).
# drain_cap_censuses() harvests completed ones NON-blockingly and logs a
# warning for any run that actually dropped buckets; each new capped call
# drains first, so steady-state pipelines auto-emit every prior run's
# census without the caller doing anything (ADVICE r12: the default-on
# cap must not drop recall silently). Bounded: a capped frame that is
# built but never executed leaves its Observation pending forever, so
# the list keeps only the newest _CAP_OBSERVATIONS_MAX — older
# never-run censuses are dropped, never leaked.
_CAP_OBSERVATIONS: list[tuple[Observation, int]] = []
_CAP_OBSERVATIONS_MAX: int = 64


# One-shot flag: if the private JVM bridge the non-blocking probe uses
# ever drifts (rename, Spark Connect's bridgeless Observation), the
# probe must say so ONCE instead of silently reporting every census as
# "pending" forever — silence would void exactly the observability
# guarantee the census exists for (r13 review).
_CAP_BRIDGE_WARNED: bool = False


def _observation_row_nonblocking(obs: Observation) -> dict | None:
    """The completed metrics row of `obs`, or None if its frame has not
    finished an action yet. Uses the JVM Observation.getRowOrEmpty —
    the only non-blocking surface (the public .get BLOCKS until an
    action runs, which a drain loop must never do). Guarded: bridge
    drift degrades to 'census pending' but logs a warning ONCE so the
    degradation is visible, never an error in the dedup hot path."""
    global _CAP_BRIDGE_WARNED
    try:
        from pyspark.serializers import CPickleSerializer

        jo = getattr(obs, "_jo", None)
        if jo is None:  # observe() never attached
            return None
        opt = jo.getRowOrEmpty()
        if opt.isEmpty():
            return None
        utils = getattr(
            obs._jvm, "org.apache.spark.sql.api.python.PythonSQLUtils"
        )
        return CPickleSerializer().loads(utils.toPyRow(opt.get())).asDict(
            recursive=False
        )
    except Exception:  # pragma: no cover - py4j bridge drift
        if not _CAP_BRIDGE_WARNED:
            _CAP_BRIDGE_WARNED = True
            _LOG.warning(
                "cap-drop census bridge unavailable (JVM Observation."
                "getRowOrEmpty probe raised) — hot-bucket cap drops will "
                "NOT be reported this session; use Observation.get via "
                "last_cap_census(block=True) after an action if you need "
                "the census.",
                exc_info=True,
            )
        return None


def _harvest_cap_census(row: dict, cap: int) -> dict:
    """Attach the cap to a completed census row and emit the one shared
    dropped-buckets warning (both retrieval paths go through here so
    the message cannot drift between them)."""
    row = dict(row)
    row["max_bucket"] = cap
    if (row.get("buckets_dropped") or 0) > 0:
        _LOG.warning(
            "routed hot-bucket cap dropped %s bucket(s) / %s doc-slot(s) "
            "(max_bucket=%s, largest bucket seen=%s, buckets total=%s): "
            "pairs inside them were not generated — near-exact cliques "
            "larger than the cap (template+token variants) lose recall; "
            "run a high-threshold near-exact dedup pass upstream or "
            "raise max_bucket.",
            row["buckets_dropped"], row["doc_slots_dropped"], cap,
            row.get("largest_bucket"), row.get("buckets_total"),
        )
    return row


def drain_cap_censuses() -> list[dict]:
    """Harvest every COMPLETED capped-expansion census (non-blocking),
    log a warning for each run whose cap dropped anything, and return
    them. Pending censuses (frames built but no action yet) stay queued
    for the next drain. Called automatically at the start of every new
    capped expansion; call it explicitly at pipeline checkpoints to
    flush the tail."""
    done: list[dict] = []
    pending: list[tuple[Observation, int]] = []
    for obs, cap in _CAP_OBSERVATIONS:
        row = _observation_row_nonblocking(obs)
        if row is None:
            pending.append((obs, cap))
            continue
        done.append(_harvest_cap_census(row, cap))
    _CAP_OBSERVATIONS[:] = pending
    return done


def last_cap_census(block: bool = False, timeout: float = 60.0) -> dict | None:
    """Census of the most recent COMPLETED capped routed expansion:
    dict with buckets_total, buckets_dropped, doc_slots_dropped,
    largest_bucket, max_bucket. Walks pending censuses newest-first and
    returns (and removes) the newest whose action has run — so a later
    capped frame that was built but never executed does not mask an
    earlier completed run. With block=True it keeps polling (bounded by
    `timeout` seconds) until some pending census completes — a bounded
    wait, never Observation.get's unbounded block, so a capped frame
    that is never executed cannot hang the driver (r13 review); on
    timeout it returns None like the non-blocking path. NOTE: building
    a NEW capped frame auto-drains completed censuses (they are logged
    and consumed by drain_cap_censuses) — harvest programmatically
    BEFORE the next capped build if you need the dict, not just the
    log line."""
    import time as _time

    deadline = _time.monotonic() + (timeout if block else 0.0)
    while True:
        for i in range(len(_CAP_OBSERVATIONS) - 1, -1, -1):
            obs, cap = _CAP_OBSERVATIONS[i]
            row = _observation_row_nonblocking(obs)
            if row is not None:
                del _CAP_OBSERVATIONS[i]
                return _harvest_cap_census(row, cap)
        if not block or not _CAP_OBSERVATIONS or _time.monotonic() >= deadline:
            return None
        _time.sleep(0.05)


def _expand_bucket_pairs(
    buckets: DataFrame,
    max_bucket: int | None,
    segment: int = BUCKET_PAIR_SEGMENT,
) -> DataFrame:
    """(band, bh, _ids sorted-ascending) bucket frame → distinct
    candidate (id_a, id_b) pairs, id_a < id_b — the shared in-bucket
    expansion of minhash_lsh_pairs and containment_minhash_pairs.

    CHUNKED (VERDICT r12 hardening item 2): the pair set of a b-doc
    bucket is expanded segment×segment — the sorted _ids array is cut
    into ceil(b/segment) slices; same-slice cells expand the triangle
    (x before y within the slice), cross-slice cells the full product
    (every id in slice i precedes every id in slice j > i, so id_a <
    id_b holds by sort order). Output is exactly the unchunked
    b·(b−1)/2 set, but no single generator input cell ever holds more
    than segment² pair structs (~1M at the 1024 default) where the
    unchunked form materialized the whole triangle as ONE array value
    (~33.5M structs at the 8192 cap ceiling). The slice-pair spine is
    tiny (ceil(b/segment)² ≤ 64 rows per bucket at the ceiling) and
    stays in the bucket's task — no extra shuffle; equality with the
    unchunked expansion is pinned in tests/test_dedup.py and fuzzed in
    tests/test_property_dedup.py.

    When `max_bucket` is set, buckets larger than it are dropped BEFORE
    expansion (the routed hot-bucket backstop) and the drop census rides
    the frame as an Observation (ADVICE r12: buckets_total,
    buckets_dropped, doc_slots_dropped, largest_bucket — filled by the
    caller's first action at zero extra cost; see drain_cap_censuses /
    last_cap_census)."""
    if max_bucket is not None:
        drain_cap_censuses()
        obs = Observation()
        buckets = buckets.observe(
            obs,
            F.count("*").alias("buckets_total"),
            F.sum((F.size("_ids") > max_bucket).cast("long")).alias(
                "buckets_dropped"
            ),
            F.sum(
                F.when(F.size("_ids") > max_bucket, F.size("_ids")).otherwise(0)
            ).alias("doc_slots_dropped"),
            F.max(F.size("_ids")).alias("largest_bucket"),
        )
        _CAP_OBSERVATIONS.append((obs, int(max_bucket)))
        del _CAP_OBSERVATIONS[:-_CAP_OBSERVATIONS_MAX]
        buckets = buckets.filter(F.size("_ids") <= max_bucket)
    buckets = buckets.filter(F.size("_ids") >= 2)
    seg_pairs = F.expr(
        f"flatten(transform(sequence(0, (size(_ids) - 1) div {segment}), i -> "
        f"transform(sequence(i, (size(_ids) - 1) div {segment}), j -> "
        "struct(i AS i, j AS j))))"
    )
    sliced = buckets.select("_ids", F.explode(seg_pairs).alias("s")).select(
        F.expr(f"slice(_ids, s.i * {segment} + 1, {segment})").alias("_sa"),
        F.expr(f"slice(_ids, s.j * {segment} + 1, {segment})").alias("_sb"),
        (F.col("s.i") == F.col("s.j")).alias("_same"),
    )
    triangle = F.expr(
        "flatten(transform(_sa, (x, i) -> "
        "transform(slice(_sa, i + 2, size(_sa) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    product = F.expr(
        "flatten(transform(_sa, x -> transform(_sb, "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        sliced.select(
            F.explode(F.when(F.col("_same"), triangle).otherwise(product)).alias("p")
        )
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def tokens(col, lower: bool = True):
    c = F.lower(col) if lower else col
    return F.split(F.trim(c), r"\s+")


def shingles(tok_col, n: int = 3):
    """Word n-gram shingles via higher-order functions (JVM-side)."""
    return F.expr(
        f"transform(sequence(1, greatest(size({tok_col}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice({tok_col}, i, {n})))"
    )


def scan_parallelize(df: DataFrame, factor: int = 1) -> DataFrame:
    """Raise a narrow scan to the session's default parallelism before
    CPU-heavy per-row compute (shingling + 64 hash functions per doc).

    A single parquet file — the local test corpus — scans as ONE input
    partition, which would serialize the whole signature computation onto
    one core while the other 31 idle. On a production cluster the corpus
    arrives as thousands of file splits, the scan is already wider than
    the core count, and this is a NO-OP — the round-robin repartition
    only fires when the scan is narrower than defaultParallelism, so no
    extra shuffle is ever added at scale.

    Width probe, three tiers (r13: the old second tier was
    `rdd.getNumPartitions()`, a DataFrame→RDD plan conversion measured
    at ~300-400 ms of driver/py4j work PER OPERATOR CALL on exactly the
    local shape that reaches it — pure overhead in every bench-timed
    run of every minhash-family query):
      1. `inputFiles()` (a catalog listing — file count never
         over-states scan width, splits only widen it): a corpus-scale
         scan short-circuits here.
      2. file-backed frames below the file-count bar estimate the scan
         width with Spark's own split-packing math over the real file
         sizes (FilePartition.maxSplitBytes: bytesPerCore from
         minPartitionNum/defaultParallelism, clamped by
         maxPartitionBytes/openCost) — local stat calls for local paths,
         Hadoop FileSystem status calls for any other scheme
         (_scan_file_sizes, r14), no JVM plan work. The estimate
         reproduces the scan's split count; it cannot see post-scan
         repartition/coalesce operators, but a wrong call in either
         direction only costs one narrow-row round-robin exchange or a
         little parallelism — never a row.
      3. only non-file-backed frames (createDataFrame test corpora)
         still pay the exact `rdd.getNumPartitions()` probe."""
    import math

    spark = df.sparkSession
    sc = spark.sparkContext
    target = sc.defaultParallelism * factor
    files: list[str] | None
    try:
        files = df.inputFiles()
    except Exception:
        files = None  # non-file-backed plan: exact probe below
    if files is not None and len(files) >= target:
        return df
    if files:
        try:
            sizes = _scan_file_sizes(spark, files)
            def _bytes_conf(key: str, default: int) -> int:
                v = spark.conf.get(key, str(default))
                units = {"k": 1024, "m": 1024**2, "g": 1024**3,
                         "t": 1024**4, "p": 1024**5, "b": 1}
                v = v.lower().rstrip("b")
                return int(float(v[:-1]) * units[v[-1]]) if v[-1] in units else int(v)
            max_pb = _bytes_conf("spark.sql.files.maxPartitionBytes", 128 * 1024**2)
            open_cost = _bytes_conf("spark.sql.files.openCostInBytes", 4 * 1024**2)
            # bytesPerCore divides by minPartitionNum (default: the
            # session's defaultParallelism), exactly as FilePartition
            # does — NOT by `target`: for factor>1 callers dividing by
            # target under-stated maxSplitBytes and over-stated the real
            # split count, skipping a needed repartition (ADVICE r13).
            # `target` stays the >=-comparison bar only.
            min_pn = int(spark.conf.get(
                "spark.sql.files.minPartitionNum", str(sc.defaultParallelism)
            ))
            bytes_per_core = (sum(sizes) + open_cost * len(sizes)) / max(min_pn, 1)
            # floor 1 byte: openCostInBytes=0 on an all-empty file set
            # would otherwise divide by zero below
            max_split = max(1, min(max_pb, max(open_cost, int(bytes_per_core))))
            est = sum(math.ceil(s / max_split) if s else 1 for s in sizes)
            return df if est >= target else df.repartition(target)
        except Exception:  # noqa: BLE001 — any estimate failure (storage
            pass  # stat error, exotic conf spelling): exact probe below
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _scan_file_sizes(
    spark, files: list[str], local_schemes: tuple = ("", "file")
) -> list[int]:
    """File lengths for scan_parallelize's split-packing estimate. Local
    paths stat directly; any other scheme (s3a/hdfs/abfs/...) asks the
    scheme's Hadoop FileSystem for the status — metadata-only calls, so
    remote stores take the estimate tier instead of silently falling
    back to the exact RDD probe and re-paying the ~300-400 ms that tier
    exists to remove (r14, VERDICT r13 item 8). `local_schemes` is a
    test seam: shrinking it forces given schemes down the Hadoop branch,
    which tests the py4j plumbing against the local FS."""
    import os
    from urllib.parse import urlparse

    sizes: list[int] = []
    jvm_path = None
    for f in files:
        u = urlparse(f)
        if u.scheme in local_schemes:
            sizes.append(os.path.getsize(u.path or f))
            continue
        if jvm_path is None:
            jvm_path = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
            hconf = spark.sparkContext._jsc.hadoopConfiguration()
        p = jvm_path(f)
        sizes.append(p.getFileSystem(hconf).getFileStatus(p).getLen())
    return sizes


def gram_sets(df: DataFrame, content_col: str, id_col: str, shingle_n: int = 3) -> DataFrame:
    """Distinct word-shingle set per doc: (_id, _grams). The shared
    front half of signature generation and Jaccard verification; cheap
    relative to the minhash stage (one split + one windowed concat vs
    num_hashes full passes over the shingle array)."""
    return (
        scan_parallelize(df.select(F.col(id_col).alias("_id"), F.col(content_col).alias("_c")))
        .select("_id", tokens(F.col("_c")).alias("_toks"))
        .select("_id", F.array_distinct(shingles("_toks", shingle_n)).alias("_grams"))
    )


# ------------------------------------------------------------------- exact

def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup: md5 digest groupBy, keep the smallest id per digest.

    Scale: the only shuffle is on the digest (uniformly distributed).
    Returns (digest, keep_id, dup_count)."""
    return (
        df.select(F.md5(F.col(content_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def fingerprint_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Canonical-fingerprint dedup: digest of sorted distinct lowercase
    tokens — catches reordered/repeated-token duplicates exact dedup misses.
    Returns (fp, keep_id, dup_count) for fingerprints, incl. singletons."""
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(F.col(content_col))))))
    return (
        df.select(fp.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def winnow_fingerprints(
    df: DataFrame, content_col: str, id_col: str, k: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints — the rolling-hash fingerprinting
    scheme (Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
    Document Fingerprinting", SIGMOD 2003).

    k-gram hashes over the token stream; each sliding window of `window`
    consecutive hashes contributes its minimum to the fingerprint set.
    Guarantee: two docs sharing a token run of ≥ k+window-1 tokens share at
    least one fingerprint; expected density ≈ 2/(window+1) of the grams.

    All JVM-native higher-order functions — hashing is a 16-hex-char md5
    prefix compared lexicographically (uniform, so lexicographic min ==
    numeric rolling min) — and NO shuffle happens here at all: fingerprints
    are computed per-row inside the scan; only the caller's groupBy(fp)
    shuffles, on uniformly distributed keys. Returns distinct (id, fp).
    """
    d = scan_parallelize(
        df.select(F.col(id_col).alias("_id"), F.col(content_col).alias("_c"))
    ).select("_id", tokens(F.col("_c")).alias("_toks"))
    d = d.select("_id", shingles("_toks", k).alias("_grams"))
    d = d.select(
        "_id", F.expr("transform(_grams, g -> substring(md5(g), 1, 16))").alias("_h")
    )
    wins = F.expr(
        f"array_distinct(transform(sequence(1, greatest(size(_h) - {window - 1}, 1)), "
        f"i -> array_min(slice(_h, i, {window}))))"
    )
    return (
        d.select("_id", F.explode(wins).alias("fp"))
        .where(F.col("fp").isNotNull())
        .distinct()
    )


# ----------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    block_cols: list[str],
    n: int = 3,
    threshold: float = 0.5,
    length_bucket: bool = True,
) -> DataFrame:
    """Exact token-n-gram Jaccard over pairs sharing a blocking key.

    Blocking keeps the join linear-ish: pairs are generated only within a
    block, which at 100 TB must stay ~10³-10⁴ docs. With `length_bucket`
    (default) a log2 bucket of the distinct-gram count is ADDED to the
    user blocks, so a lang-only blocking over a web corpus cannot
    degenerate into all-pairs-within-language.

    The length blocking is LOSSLESS for the result set: jaccard(A,B) ≥ t
    bounds the set-size ratio |B|/|A| ≤ 1/t, hence the floor(log2) buckets
    differ by ≤ spread = ceil(log2(1/t)); each doc is exploded to buckets
    lb..lb+spread so every qualifying pair still meets in ≥1 bucket (pairs
    meeting twice are dropDuplicates'd). At t ≥ 0.5 the spread is 1 — a 2×
    row fan-out for a quadratic→linear-ish blocking win.

    Self-join is a shuffle on (block key, bucket). Returns
    (id_a, id_b, jaccard) for pairs ≥ threshold — identical to the
    unblocked quadratic answer by the bound above."""
    import math

    g = (
        scan_parallelize(
            df.select(F.col(id_col).alias("_id"), *block_cols, F.col(content_col).alias("_c"))
        )
        .select("_id", *block_cols, tokens(F.col("_c")).alias("_toks"))
        .select("_id", *block_cols, F.array_distinct(shingles("_toks", n)).alias("_grams"))
    )
    cond = F.col("a._id") < F.col("b._id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    if length_bucket:
        spread = max(1, math.ceil(math.log2(1.0 / threshold))) if threshold < 1 else 1
        lb = F.floor(F.log2(F.greatest(F.size("_grams"), F.lit(1))))
        g = g.withColumn(
            "_lbk", F.explode(F.array(*[lb + F.lit(i) for i in range(spread + 1)]))
        )
        cond = cond & (F.col("a._lbk") == F.col("b._lbk"))
    a = g.alias("a")
    b = g.alias("b")
    inter = F.size(F.array_intersect(F.col("a._grams"), F.col("b._grams")))
    union = F.size(F.array_union(F.col("a._grams"), F.col("b._grams")))
    out = (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    if length_bucket:
        out = out.dropDuplicates(["id_a", "id_b"])
    return out


# ------------------------------------------------- prefix-filter set join

def prefix_tokens(sets: DataFrame, threshold: float) -> DataFrame:
    """Rarest-first prefix tokens per record — the candidate-join keys of
    prefix_jaccard_pairs, exposed so the key-cardinality scale gate
    (tools/scale_probe.py) measures the exact frame the join uses. Input
    (_id, _set: array<string>); returns (_id, _tok) where _tok ranges over
    the record's first s − ceil(t·s) + 1 tokens in (document frequency
    asc, token asc) order. Token keys come from the content vocabulary,
    so distinct-key count grows with the corpus (Heaps' law) — the
    growing-key contract the gate enforces."""
    from pyspark.sql.window import Window

    toks = sets.select("_id", F.size("_set").alias("_sz"), F.explode("_set").alias("_tok"))
    freq = toks.groupBy("_tok").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_tok").asc())
    return (
        toks.join(freq, "_tok")
        .withColumn("_pos", F.row_number().over(w))
        .filter(
            F.col("_pos")
            <= F.col("_sz") - F.ceil(F.lit(float(threshold)) * F.col("_sz")) + 1
        )
        .select("_id", "_tok")
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    grams: DataFrame | None = None,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """Prefix-filtering set-similarity self-join over distinct word-shingle
    sets (the AllPairs/PPJoin candidate scheme — Bayardo et al. WWW'07,
    Xiao et al. WWW'08) with exact Jaccard verification.

    Third lossless candidate-generation scheme in this module, orthogonal
    to the other two: `ngram_jaccard_pairs` blocks on length buckets,
    `minhash_lsh_pairs` on banded signatures; this one exploits shingle
    FREQUENCY. Order the shingle vocabulary rarest-first (document
    frequency asc, shingle asc); a record of size s keeps only its first
    p = s - ceil(t*s) + 1 shingles in that order as its *prefix*. Theorem
    (prefix-filtering principle): J(x,y) >= t implies |x ∩ y| >=
    ceil(t*max(|x|,|y|)), and two sets whose overlap meets that bound must
    share at least one element inside these prefixes — so joining on
    prefix shingles generates a candidate superset, and the exact-Jaccard
    verify makes the output IDENTICAL to the quadratic all-pairs answer.

    Scale: the census and prefix ranking are linear (one groupBy(shingle),
    one join, one per-doc window). The candidate join fans out per prefix
    shingle as posting² — prefixes hold each doc's RAREST shingles, so
    boilerplate shingles (the hot-posting risk) sit at the back of the
    ordering and only enter a prefix when a doc is nearly all boilerplate.
    The scheme's key space is the CONTENT VOCABULARY, which it cannot
    widen by construction: on Heaps-law text (real web corpora, 3-gram
    types ~ n^0.8+) postings stay thin and the join is near-linear, but on
    a vocabulary-saturated corpus candidates drift toward n²/|vocab| — the
    exact-set-join lower bound, true of ANY lossless scheme on such data
    (measured round-9 on the synthetic corpus, whose 3-gram types grow
    only ~n^0.24: candidate pairs 1,613 → 430,325 for 10× docs with max
    posting just 10 — uniform saturation, so no hot-token cap helps).
    tools/scale_probe.py's key gate measures this every run; since r10
    the routing is CODE, not a prescription — adaptive_jaccard_pairs
    censuses the prefix-key postings and switches saturated corpora to
    minhash_lsh_pairs candidates (hash-keyed bands — key space grows
    regardless of vocabulary) with the same exact verify; call this
    directly only when the corpus is known Heaps-law or exactness at
    j = threshold border pairs is mandatory. Word n-grams (not unigrams)
    are the
    right set universe for near-dup text: unigram vocabularies are small
    and Zipf-dense, so unigram prefixes go hot — measured on the test
    corpus, unigram sets at t=0.7 yield 51k qualifying pairs where 3-gram
    sets at t=0.5 yield 25. `grams` short-circuits the shingling (the
    caller-owned persist pattern of minhash_signatures/containment_pairs:
    this plan too references the gram frame from five branches with no
    cross-branch CSE). `block_cols` restricts pairs to rows sharing the
    named columns (the ngram_jaccard_pairs blocking contract) — applied
    INSIDE the candidate join so cross-block prefix collisions never
    materialize; unlike there, the blocking is not load-bearing for the
    join's scale (the prefix shingles are), so a fixed-cardinality
    column like `lang` is safe here where it is the quadratic trap in
    the blocked-all-pairs scheme (SCALE.md round-8).
    Returns (id_a, id_b, jaccard)."""
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sets = g.withColumnRenamed("_grams", "_set")
    prefix = prefix_tokens(sets, threshold)
    pair_cond = (F.col("a._tok") == F.col("b._tok")) & (F.col("a._id") < F.col("b._id"))
    if block_cols:
        blocks = df.select(F.col(id_col).alias("_id"),
                           *[F.col(c) for c in block_cols])
        prefix = prefix.join(blocks, "_id")
        for c in block_cols:
            pair_cond = pair_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), pair_cond)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    a = sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("_sa"))
    b = sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    union = F.size(F.array_union("_sa", "_sb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Prefix-filtered CONTAINMENT self-join: directional pairs (a, b)
    where C(a→b) = |A ∩ B| / |A| >= t — "doc a is mostly inside doc b".
    The asymmetric complement of prefix_jaccard_pairs above: Jaccard at
    any usable threshold misses a short quote swallowed by a long doc
    (union is dominated by the container), which is exactly the
    partial-copy/quotation duplication a corpus clean needs to see.

    Filtering principle, containment form: C(a→b) >= t implies
    |A ∩ B| >= ceil(t·|A|), so the CONTAINED side keeps only its first
    p = |A| - ceil(t·|A|) + 1 shingles in the rarest-first order and any
    qualifying container must share one of them. The container side has
    no self-relative size bound, so it indexes ALL its shingles — the
    standard asymmetric scheme. Candidate fan-out per shingle is
    prefix-postings(A) x full-postings(B): hot boilerplate shingles have
    huge B-postings but almost never appear in a rarest-first A-prefix,
    so the product stays small exactly where it threatens to explode.
    Exact verification makes the output identical to the quadratic
    all-pairs answer. Returns (id_a, id_b, containment), a != b,
    directional (both directions reported when both qualify).

    `grams` short-circuits the shingling exactly as in
    minhash_signatures: the plan references the shingle frame from SIX
    branches (census, prefix, probe, container, both verify sides), and
    without cross-branch CSE each one re-shingles the corpus — measured
    4.8 s vs 1.9 s at sf0.1 with a caller-persisted grams frame. The
    default stays plain for the same reason as the minhash family: an
    internal persist pins a corpus-sized cache on a lazily returned
    result with no unpersist point. Pipelines that already hold
    persisted grams pass them in and every family shares ONE shingling
    pass."""
    from pyspark.sql.window import Window

    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sets = g.withColumnRenamed("_grams", "_set")
    toks = sets.select(
        "_id", F.size("_set").alias("_sz"), F.explode("_set").alias("_tok")
    )
    freq = toks.groupBy("_tok").agg(F.count("*").alias("_df"))
    w = Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_tok").asc())
    prefix = (
        toks.join(freq, "_tok")
        .withColumn("_pos", F.row_number().over(w))
        .filter(
            F.col("_pos")
            <= F.col("_sz") - F.ceil(F.lit(float(threshold)) * F.col("_sz")) + 1
        )
        .select(F.col("_id").alias("_ida"), F.col("_sz").alias("_sza"), "_tok")
    )
    # size filter (lossless): |A ∩ B| <= |B|, so C(a→b) >= t needs
    # |B| >= ceil(t·|A|) — applied on the candidate rows before the
    # distinct and the array verify (measured 31% candidate cut at sf0.1)
    cand = (
        prefix.join(
            toks.select(F.col("_id").alias("_idb"), F.col("_sz").alias("_szb"), "_tok"),
            "_tok",
        )
        .filter(
            (F.col("_ida") != F.col("_idb"))
            & (F.col("_szb") >= F.ceil(F.lit(float(threshold)) * F.col("_sza")))
        )
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"))
        .distinct()
    )
    a = sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("_sa"))
    b = sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("_sb"))
    cont = F.size(F.array_intersect("_sa", "_sb")).cast("double") / F.size("_sa")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


# -------------------------------------------------------------- minhash LSH

def minhash_signatures(
    df: DataFrame, content_col: str, id_col: str, num_hashes: int = 64,
    shingle_n: int = 3, grams: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle, i). Seeded by hashing the tuple (shingle, i) — no
    Python, stays in codegen. Returns (_id, _grams, sig array<bigint>).

    Single-pass formulation: one aggregate() fold over the shingle array
    keeps a running 64-wide min vector (zip_with least), instead of
    num_hashes separate transform+array_min traversals — same hash count,
    but one pass and no per-function intermediate arrays (~2-3× faster at
    equal output, asserted bit-identical when this replaced the 64-pass
    form).

    `grams` short-circuits the shingling: pass a (_id, _grams) frame the
    caller already holds (typically persisted, so several dedup families
    share ONE shingling pass) and df/content_col/shingle_n are ignored."""
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sig = F.expr(
        f"aggregate(_grams, array_repeat(CAST(9223372036854775807 AS BIGINT), {num_hashes}), "
        f"(acc, s) -> zip_with(acc, transform(sequence(0, {num_hashes - 1}), "
        f"i -> xxhash64(s, i)), (a, h) -> least(a, h)))"
    )
    return g.select("_id", "_grams", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    grams: DataFrame | None = None,
    verify_grams: DataFrame | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs, verified with exact Jaccard.

    Pipeline (all shuffles linear in corpus size):
      1. signatures (scan, no shuffle)
      2. explode to (band_idx, band_hash, id), ONE groupBy on the bucket
         key collecting each bucket's id list, in-bucket pair expansion →
         candidate pairs. With r = num_hashes/bands rows per band,
         P(candidate) ≈ 1-(1-j^r)^bands — tuned so j≥threshold is caught
         w.h.p. One shuffle on (band_idx, band_hash), one corpus pass; hot
         buckets (boilerplate docs) are the skew risk — `max_bucket` is
         the hard backstop: buckets larger than it are dropped from
         candidate generation entirely (a b-doc bucket contributes b²
         pairs — one pathological boilerplate bucket can dominate the
         stage). Docs sharing such a bucket still pair through their
         other bands unless they collide on EVERY hot band — near-exact
         content, INCLUDING template-plus-one-token variants that
         defeat exact/fingerprint dedup (ADVICE r12) — so a cap-sized
         near-exact clique loses recall: an engineered, OBSERVABLE
         trade (every capped run carries the drop census of
         drain_cap_censuses / last_cap_census); the upstream mitigation
         is a high-threshold near-exact pass, not exact digests. The
         in-bucket expansion itself is chunked segment×segment
         (_expand_bucket_pairs) so surviving near-cap buckets stay
         memory-bounded per array cell.
      3. exact Jaccard on candidate pairs only (verify stage).
    Returns (id_a, id_b, jaccard ≥ threshold).

    `grams` (caller-owned, typically `gram_sets(...).persist()`): the
    shingle frame appears in THREE branches of this plan (signatures +
    both verify sides) and Spark has no cross-branch CSE, so without
    materialization the shingling pass runs three times. An
    operator-internal persist was rejected — the operator cannot know
    when the last action on its lazily-returned result has run, so it
    could only leak the cache — but a CALLER owns that lifecycle:
    persist, call, action, unpersist. Pass it when the pairs feed a
    same-session pipeline stage; leave it None for one-shot queries
    where the recompute is the measured-cheaper trade (bench.py notes)."""
    r = num_hashes // bands
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sigs = minhash_signatures(df, content_col, id_col, num_hashes, shingle_n, grams=g)
    # Candidate generation on SLIM rows (id, band, bandhash) only — the
    # shingle arrays must not ride through the 16× explode + shuffle
    # (they're ~100× the width of the key columns).
    banded = _banded_rows(sigs, num_hashes, bands)
    # Candidate generation as ONE groupBy: collect each bucket's id list
    # and expand in-bucket pairs with higher-order functions — a single
    # shuffle on (band, bh) and a single pass over the corpus, where the
    # aliased self-join formulation planned the whole signature pipeline
    # TWICE (two scans, two shuffles, join). Bucket id lists are near-dup-
    # group-sized by construction; `max_bucket` bounds the b² expansion of
    # pathological boilerplate buckets (same cap semantics as before —
    # such buckets contribute no pairs at all). A window-count prefilter
    # inside the same exchange (drop singleton buckets before any list is
    # built) was measured interleaved against this form and LOST (~1.43 s
    # vs ~1.22 s at sf0.1): the window's per-partition sort costs more
    # than hash-aggregating the singleton lists it avoids.
    buckets = banded.groupBy("band", "bh").agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
    cand = _expand_bucket_pairs(buckets, max_bucket)
    # Verify stage: re-attach shingles to the (much smaller) candidate set.
    # The gram frame appears twice (once per pair side), so the shingling
    # pass runs twice here on top of the signature branch's — Spark has no
    # cross-branch CSE without materialization. Measured alternatives both
    # lose: a single-gram-join + pair-key groupBy reassembly ships the wide
    # gram arrays through TWO exchanges (~1.59 s vs ~1.22 s interleaved at
    # sf0.1 — this double join broadcasts the slim candidate set instead
    # and never shuffles a gram array), and an operator-internal persist
    # leaks executor memory on every call until the session dies. The
    # recompute is the documented accepted trade; a pipeline that needs
    # signatures durable uses build_minhash_store — the explicit
    # checkpoint table — whose probe path shares no such recompute, and a
    # same-session pipeline passes a persisted `grams` (docstring above).
    # `verify_grams` (r13, optimization affordance): a caller whose `df`
    # is itself an expensive subtree (e.g. a window-dedup over the raw
    # corpus) may pass a CHEAPER (_id, _grams) frame covering a SUPERSET
    # of df's ids — gram values depend only on the text, and the verify
    # joins match candidate ids only (all drawn from df's signatures), so
    # the output is identical while the two verify branches skip the
    # expensive subtree. Signatures always come from df/grams: banding a
    # superset would generate candidates outside df and change results.
    vg = verify_grams if verify_grams is not None else g
    cand = (
        cand.join(vg.select(F.col("_id").alias("id_a"), F.col("_grams").alias("ga")), "id_a")
        .join(vg.select(F.col("_id").alias("id_b"), F.col("_grams").alias("gb")), "id_b")
    )
    jac = F.round(
        F.size(F.array_intersect("ga", "gb")).cast("double") / F.size(F.array_union("ga", "gb")),
        6,
    )
    return cand.select("id_a", "id_b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


def minhash_signatures_md5(
    df: DataFrame, content_col: str, id_col: str, num_hashes: int = 108,
    shingle_n: int = 3, grams: DataFrame | None = None,
) -> DataFrame:
    """Oracle-checkable MinHash twin of minhash_signatures: hash value
    for (shingle s, seed i) is the first 15 hex chars of md5(s || ':' ||
    i) as a 60-bit BIGINT — the same md5-replay construction as
    simhash_md5, so a SQL oracle reproduces every signature value
    bit-for-bit (min over shingles per seed). The xxhash64 production
    variant stays the hot path (no string hashing); this twin exists so
    banded-minhash RECALL measurements (dedup_containment_recall_report)
    can themselves be value-checked cross-engine. Same single-pass
    aggregate fold as the production signature. Returns
    (_id, _grams, sig array<bigint>)."""
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sig = F.expr(
        f"aggregate(_grams, array_repeat(CAST(9223372036854775807 AS BIGINT), {num_hashes}), "
        f"(acc, s) -> zip_with(acc, transform(sequence(0, {num_hashes - 1}), "
        f"i -> CAST(conv(substring(md5(concat(s, ':', CAST(i AS STRING))), 1, 15), 16, 10) AS BIGINT)), "
        f"(a, h) -> least(a, h)))"
    )
    return g.select("_id", "_grams", sig.alias("sig"))


def _banded_rows(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Slim (id, band, bh) rows from a signature frame — the LSH bucket
    keys, kept narrow so the explode + shuffle never carries shingles.

    Built as ONE SQL expression string (r13): the previous Column-object
    composition issued ~6 py4j round-trips per band slot (bands × r
    getItem calls plus per-band xxhash64/struct/lit) — ~460 ms of
    driver-side socket chatter per operator call at 64/16, paid in every
    bench-timed run. One parsed expr is the same analyzed plan (sig[i]
    IS getItem; `b as band` IS the int literal alias) for ~3 round-trips
    total."""
    r = num_hashes // bands
    structs = ", ".join(
        "struct({} as band, xxhash64({}) as bh)".format(
            b, ", ".join(f"sig[{b * r + j}]" for j in range(r))
        )
        for b in range(bands)
    )
    return sigs.select(
        "_id", F.expr(f"explode(array({structs}))").alias("bb")
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


# ------------------------------------------- adaptive candidate routing

def minhash_recall_bands(
    rows_per_band: int, target_recall: float = 0.9, jaccard: float = 0.5
) -> int:
    """Jaccard twin of lsh_recall_bands: how many r-row MinHash bands it
    takes to catch a pair at Jaccard `jaccard` with probability ≥
    target_recall — a band matches with p = jaccard^rows_per_band, and
    independent bands give 1 − (1 − p)^bands ≥ recall ⇒ bands =
    ceil(ln(1 − recall) / ln(1 − p)) (the standard banded-LSH
    amplification identity, Broder '97 / MMDS ch.3). Sizes the bands=
    knob of minhash_lsh_pairs / adaptive_jaccard_pairs for a STATED
    recall target at the decision threshold instead of a folk default —
    at the proven 64/16 config (r = 4), recall at j is 1 − (1 − j⁴)¹⁶:
    ≈ 0.645 at j = 0.50 exactly, ≥ 0.9989 at j ≥ 0.7, ~1 at j ≥ 0.8
    (real near-dups)."""
    import math

    if not 0 < target_recall < 1:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    p = float(jaccard) ** rows_per_band
    if p >= 1:
        return 1
    if p <= 0:
        raise ValueError(f"jaccard={jaccard} gives zero band-collision probability")
    return max(1, math.ceil(math.log(1 - target_recall) / math.log(1 - p)))


def prefix_candidate_census(
    prefix: DataFrame,
    block_frame: DataFrame | None = None,
    block_cols: list[str] | None = None,
) -> tuple[int, int, int]:
    """One linear aggregate over the prefix-token frame: (distinct join
    keys, prefix rows, Σ_key c·(c−1)/2) — the third number is the EXACT
    upper bound on candidate pairs the prefix equi-join will generate
    (before the id_a < id_b halving and the pair-dedup), i.e. the
    key-posting census VERDICT r9 prescribed as the routing signal.
    `block_frame` (slim (_id, *block_cols)) folds the blocking into the
    key exactly as prefix_jaccard_pairs applies it inside the join."""
    keyed = prefix
    keys = ["_tok"]
    if block_cols:
        keyed = prefix.join(block_frame, "_id")
        keys = ["_tok", *block_cols]
    per = keyed.groupBy(*keys).agg(F.count("*").alias("c"))
    row = per.agg(
        F.count("*").alias("k"),
        F.sum("c").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"),
    ).collect()[0]
    return int(row.k), int(row.n), int(row.p or 0)


def choose_jaccard_route(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    block_cols: list[str] | None = None,
    grams: DataFrame | None = None,
    cand_per_doc: float = SATURATION_CAND_PER_DOC,
) -> str:
    """'prefix' or 'minhash' — the data-adaptive candidate-generation
    decision of adaptive_jaccard_pairs, exposed so tests and pipelines
    can assert the routing. Runs the prefix-key census (one linear
    aggregate) and routes to minhash-LSH when the estimated candidate
    join exceeds cand_per_doc pairs per document — the single-corpus
    form of the scale gate's saturation verdict (on the saturated
    synthetic corpus the estimate reads 3.2/doc at 500 docs but 86/doc
    at 5,000 and grows ~n thereafter; on Heaps-law text it stays O(1)
    per doc and the exact prefix join is the right default)."""
    n_docs = df.count()
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sets = g.withColumnRenamed("_grams", "_set")
    prefix = prefix_tokens(sets, threshold)
    blocks = (
        df.select(F.col(id_col).alias("_id"), *[F.col(c) for c in block_cols])
        if block_cols
        else None
    )
    _, _, est_pairs = prefix_candidate_census(prefix, blocks, block_cols)
    return "minhash" if est_pairs > cand_per_doc * max(n_docs, 1) else "prefix"


def adaptive_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    block_cols: list[str] | None = None,
    grams: DataFrame | None = None,
    cand_per_doc: float = SATURATION_CAND_PER_DOC,
    num_hashes: int = 64,
    bands: int = 16,
    route: str | None = None,
    max_bucket: int | str | None = "auto",
) -> DataFrame:
    """Set-similarity self-join with DATA-ADAPTIVE candidate generation —
    the code path VERDICT r9 item 1 demanded for the saturated-corpus
    trap: census the prefix-key posting sizes (choose_jaccard_route) and

      - 'prefix'  (unsaturated, the default on Heaps-law text): the
        lossless AllPairs/PPJoin scheme (prefix_jaccard_pairs) — EXACT
        output, near-linear while the shingle vocabulary grows with the
        corpus;
      - 'minhash' (saturated): minhash_lsh_pairs candidates — band-hash
        join keys whose cardinality grows with the corpus REGARDLESS of
        vocabulary (the r9 gate measures 10.01×/10×) — with the SAME
        exact-Jaccard verify, so every reported pair is true; recall at
        the decision threshold is 1 − (1 − t^r)^bands (≈ 0.645 at
        exactly j = 0.50, ≥ 0.9989 at j ≥ 0.7 with the default 64/16 —
        size bands via minhash_recall_bands for a stated target; on the
        test-corpus family LSH == exact is pinned by tests and the
        driver's dedup_minhash_lsh oracle).

    Both routes return (id_a, id_b, jaccard ≥ threshold). The census is
    one eager linear aggregate (plus a metadata-cheap df.count()) — the
    price of adaptivity; the chosen route's plan then recomputes the
    prefix frame lazily (same accepted no-CSE trade as the rest of the
    module — no hidden persist on a lazily-returned result). block_cols
    restricts pairs to rows agreeing on those columns: inside the
    candidate join on the prefix route, as a pair-sized post-filter on
    the minhash route (identical output — blocking only removes pairs).
    `route` pins the decision ('prefix'/'minhash'), for tests and for
    pipelines that already censused.

    `max_bucket` (minhash route only — the prefix route has no buckets)
    is the hot-bucket backstop VERDICT r11 found unreachable from here:
    the saturated route fires exactly on boilerplate-heavy corpora,
    where one hot band bucket's b² in-bucket expansion is a single-task
    bomb. The default "auto" resolves to routed_max_bucket(n_docs) —
    the census-derived cap (one extra metadata-cheap count when the
    route is minhash); pass an int to pin it or None to disable
    (None is the WRONG default at scale — only for oracle twins that
    must see every bucket)."""
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    if route is None:
        route = choose_jaccard_route(
            df, content_col, id_col, threshold, shingle_n, block_cols,
            grams=g, cand_per_doc=cand_per_doc,
        )
    if route == "prefix":
        return prefix_jaccard_pairs(
            df, content_col, id_col, threshold, shingle_n,
            grams=g, block_cols=block_cols,
        )
    if route != "minhash":
        raise ValueError(f"unknown route {route!r} (expected 'prefix' or 'minhash')")
    if max_bucket == "auto":
        max_bucket = routed_max_bucket(df.count(), cand_per_doc)
    pairs = minhash_lsh_pairs(
        df, content_col, id_col, num_hashes, bands, shingle_n, threshold,
        max_bucket=max_bucket, grams=g,
    )
    if block_cols:
        slim = df.select(F.col(id_col).alias("_bid"), *[F.col(c) for c in block_cols])
        ba = slim.select(
            F.col("_bid").alias("id_a"),
            *[F.col(c).alias(f"_a_{c}") for c in block_cols],
        )
        bb = slim.select(
            F.col("_bid").alias("id_b"),
            *[F.col(c).alias(f"_b_{c}") for c in block_cols],
        )
        pairs = pairs.join(ba, "id_a").join(bb, "id_b")
        for c in block_cols:
            pairs = pairs.filter(F.col(f"_a_{c}") == F.col(f"_b_{c}"))
        pairs = pairs.select("id_a", "id_b", "jaccard")
    return pairs


def containment_candidate_census(
    prefix: DataFrame, toks: DataFrame
) -> tuple[int, int, int]:
    """One linear aggregate over the containment join's two key frames:
    (distinct prefix keys, prefix rows, Σ_tok pc·(fc−1)) — the third
    number is the EXACT non-self row count the asymmetric candidate
    equi-join generates (contained-side prefix postings ×
    container-side FULL postings, minus the pc self-matches each prefix
    row makes with its own doc's posting — shingle sets are distinct,
    so a prefix doc appears exactly once in its token's full posting),
    before the size filter and the distinct. The containment analog of
    prefix_candidate_census's Σ c·(c−1)/2, which excludes self the same
    way: without the −1, an all-unique-vocabulary corpus (df = 1
    everywhere, zero real candidates) would read ~prefix-length
    est/doc ≈ 11 and spuriously saturate. `prefix` is (_id, _tok) or
    any frame with a _tok column for the contained side; `toks` is the
    full (_id, _tok) exploded shingle frame."""
    pc = prefix.groupBy("_tok").agg(F.count("*").alias("pc"))
    fc = toks.groupBy("_tok").agg(F.count("*").alias("fc"))
    row = (
        pc.join(fc, "_tok")
        .agg(
            F.count("*").alias("k"),
            F.sum("pc").alias("n"),
            F.sum(F.col("pc") * (F.col("fc") - 1)).alias("p"),
        )
        .collect()[0]
    )
    return int(row.k), int(row.n), int(row.p or 0)


def choose_containment_route(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    grams: DataFrame | None = None,
    cand_per_doc: float = SATURATION_CAND_PER_DOC,
) -> str:
    """'prefix' or 'minhash' — the containment family's data-adaptive
    candidate decision (VERDICT r10 item 1: the same census-router
    pattern as choose_jaccard_route, applied to the last content-bounded
    key class without a route). Censuses the asymmetric candidate join
    (contained prefix postings × container full postings, one linear
    aggregate) and routes to the banded minhash scheme when the estimate
    exceeds cand_per_doc pairs per document. Measured r11 on the
    synthetic documents: 1.07 est/doc at sf0.01 (→ prefix) and 61.6 at
    sf0.1 (→ minhash) — the same unsaturated→saturated transition the
    Jaccard census shows at 3.2 → 86. Unit note: this census counts
    ORDERED candidate join rows (the asymmetric join is directional),
    vs the Jaccard census's unordered pairs — see the
    SATURATION_CAND_PER_DOC comment for why the shared threshold is
    compared against each family's own join-row unit."""
    n_docs = df.count()
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sets = g.withColumnRenamed("_grams", "_set")
    toks = sets.select("_id", F.explode("_set").alias("_tok"))
    prefix = prefix_tokens(sets, threshold)
    _, _, est_pairs = containment_candidate_census(prefix, toks)
    return "minhash" if est_pairs > cand_per_doc * max(n_docs, 1) else "prefix"


def containment_minhash_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    grams: DataFrame | None = None,
    ratio_cap: float = CONTAINMENT_RATIO_CAP,
    target_recall: float = CONTAINMENT_TARGET_RECALL,
    rows_per_band: int = CONTAINMENT_ROWS_PER_BAND,
    max_bucket: int | None = None,
    small_side_exact_max: int | None = None,
) -> DataFrame:
    """Banded-MinHash candidate generation for the directional containment
    join — the saturated-corpus route of adaptive_containment_pairs.

    Why not an asymmetric scheme: the natural containment LSH (contained
    side emits its per-seed minhash, container side emits every shingle
    hash — P(collision per seed) = |A∩B|/|A|, the containment itself)
    cannot be amplified: a banded r-way key on the contained side would
    need the container to enumerate r-tuples of its shingles (|B|^r
    rows). Per-seed collision probability equals the pair's true overlap
    fraction — linear in the overlap, never powered down — so on a
    vocabulary-saturated corpus it buys nothing over the prefix scheme
    (measured r11 at sf0.1, non-self candidates/doc: 58.2 for 6-seed
    asymmetric minhash vs 61.6 for the prefix join). Banding over
    JACCARD is what powers random pairs down (j^r per band), so this
    route reduces containment to a ratio-capped Jaccard floor:

      C(a→b) ≥ t and |B| ≤ ratio_cap·|A|
        ⇒ J(A,B) = |A∩B|/(|A|+|B|−|A∩B|) ≥ t/(ratio_cap + 1 − t)

    Bands are sized by minhash_recall_bands(rows_per_band, target_recall,
    j_floor) so any pair INSIDE the ratio cap is caught with probability
    ≥ target_recall (defaults: t=0.8, cap=1.5 ⇒ j_floor=0.4706, r=3,
    recall 0.98 ⇒ 36 bands · 3 rows = 108 hashes — one pass, same
    single-aggregate signature as minhash_signatures). Pairs OUTSIDE the
    cap (a short quote inside a container >1.5× its size) are below the
    engineered recall floor — the documented trade of this route,
    exactly like the Jaccard router's 0.645-at-border recall: the exact
    prefix route keeps them when the census reads unsaturated, and a
    larger ratio_cap buys them back at band-count cost. On the synthetic
    corpus every true pair is near-symmetric (measured r11: size ratios
    0.90-1.11 / J ≥ 0.90 at sf0.01, 0.80-1.25 / J ≥ 0.80 at sf0.1 —
    recall at J = 0.8 with 36 r=3 bands is 1−(1−0.512)^36 ≈ 1−10⁻¹¹),
    so banded output == exact all-pairs output at both sfs — pinned by
    the driver oracle and tests/test_keygrowth.py.

    Verification is EXACT directional containment on the candidate set
    (both directions of each unordered candidate checked — the verify
    subsumes the |B| ≥ t·|A| size filter since |B| ≥ |A∩B|), so
    precision is 1 regardless of banding. Returns (id_a, id_b,
    containment ≥ t), directional, a ≠ b.

    `small_side_exact_max` (ADVICE r11): an opt-in exact supplement for
    the high-ratio regime the ratio cap excludes — the quote-in-long-doc
    pairs this join family exists for. When set, contained-side docs
    with ≤ that many shingles ALSO run the lossless asymmetric prefix
    scheme (their rarest-first prefix is ≤ ~(1−t)·small_side_exact_max
    tokens per doc — tiny postings), and the union restores EXACT recall
    for every pair whose contained side is small, at ANY ratio. The
    trade is the prefix pass's saturated-corpus cost resurfacing for the
    small slice: candidate rows = Σ over small-doc prefix tokens of the
    token's FULL posting length, which on a vocabulary-saturated corpus
    grows with n — that is why it is opt-in and bounded by doc size
    rather than default-on (the default banded route keeps the
    documented ratio-capped recall contract; the planted high-ratio
    miss and this supplement's recovery are pinned in
    tests/test_dedup.py)."""
    j_floor = float(threshold) / (float(ratio_cap) + 1.0 - float(threshold))
    bands = minhash_recall_bands(rows_per_band, target_recall, j_floor)
    num_hashes = bands * rows_per_band
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    sigs = minhash_signatures(df, content_col, id_col, num_hashes, shingle_n, grams=g)
    banded = _banded_rows(sigs, num_hashes, bands)
    buckets = banded.groupBy("band", "bh").agg(
        F.sort_array(F.collect_list("_id")).alias("_ids")
    )
    cand = _expand_bucket_pairs(buckets, max_bucket)
    cand = (
        cand.join(g.select(F.col("_id").alias("id_a"), F.col("_grams").alias("ga")), "id_a")
        .join(g.select(F.col("_id").alias("id_b"), F.col("_grams").alias("gb")), "id_b")
    )
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    directed = cand.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("id_a"),
                    F.col("id_b").alias("id_b"),
                    F.round(inter / F.size("ga"), 6).alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("id_a"),
                    F.col("id_a").alias("id_b"),
                    F.round(inter / F.size("gb"), 6).alias("containment"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    out = directed.filter(F.col("containment") >= float(threshold))
    if small_side_exact_max is None:
        return out
    # Exact small-side supplement: the asymmetric prefix scheme
    # (containment_pairs' candidate join) restricted to contained docs
    # with ≤ small_side_exact_max shingles, unioned with the banded
    # output. Values are computed by the same round(|A∩B|/|A|, 6), so
    # the pair-key dedup cannot pick between disagreeing rows.
    sets = g.withColumnRenamed("_grams", "_set")
    sizes = sets.select("_id", F.size("_set").alias("_sz"))
    prefix = (
        prefix_tokens(sets, threshold)
        .join(sizes.filter(F.col("_sz") <= int(small_side_exact_max)), "_id")
        .select(F.col("_id").alias("_ida"), F.col("_sz").alias("_sza"), "_tok")
    )
    full = sets.select(
        F.col("_id").alias("_idb"), F.size("_set").alias("_szb"),
        F.explode("_set").alias("_tok"),
    )
    cand_small = (
        prefix.join(full, "_tok")
        .filter(
            (F.col("_ida") != F.col("_idb"))
            & (F.col("_szb") >= F.ceil(F.lit(float(threshold)) * F.col("_sza")))
        )
        .select(F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"))
        .distinct()
    )
    sa = sets.select(F.col("_id").alias("id_a"), F.col("_set").alias("_sa"))
    sb = sets.select(F.col("_id").alias("id_b"), F.col("_set").alias("_sb"))
    cont = F.size(F.array_intersect("_sa", "_sb")).cast("double") / F.size("_sa")
    exact_small = (
        cand_small.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
        .filter(F.col("containment") >= float(threshold))
    )
    return out.unionByName(exact_small).dropDuplicates(["id_a", "id_b"])


def adaptive_containment_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    grams: DataFrame | None = None,
    cand_per_doc: float = SATURATION_CAND_PER_DOC,
    ratio_cap: float = CONTAINMENT_RATIO_CAP,
    target_recall: float = CONTAINMENT_TARGET_RECALL,
    rows_per_band: int = CONTAINMENT_ROWS_PER_BAND,
    route: str | None = None,
    max_bucket: int | str | None = "auto",
    small_side_exact_max: int | None = None,
) -> DataFrame:
    """Directional containment self-join with DATA-ADAPTIVE candidate
    generation — the containment twin of adaptive_jaccard_pairs (VERDICT
    r10 item 1: containment_prefix_keys was the last content-bounded key
    class routing only by prescription). Census the asymmetric
    prefix×full posting products (choose_containment_route) and

      - 'prefix'  (unsaturated): the lossless asymmetric prefix-filter
        scheme (containment_pairs) — EXACT output while the shingle
        vocabulary grows with the corpus;
      - 'minhash' (saturated): ratio-capped banded-MinHash candidates
        (containment_minhash_pairs — band keys grow with the corpus
        regardless of vocabulary) with the SAME exact directional
        containment verify, so every reported pair is true; recall ≥
        target_recall for pairs with |container| ≤ ratio_cap·|contained|
        (see containment_minhash_pairs for the reduction and its trade).

    Both routes return (id_a, id_b, containment ≥ threshold),
    directional. The census is one eager linear aggregate plus a
    metadata-cheap count — the same price adaptive_jaccard_pairs pays.
    `route` pins the decision for tests / pre-censused pipelines.
    `max_bucket` is the minhash route's hot-bucket backstop with the
    same "auto" → routed_max_bucket(n_docs) census-derived default as
    adaptive_jaccard_pairs (VERDICT r11: previously unreachable from
    the routed path); the prefix route has no buckets and ignores it.
    `small_side_exact_max` (ADVICE r11) forwards to the minhash route's
    exact small-side supplement — restores exact recall for pairs whose
    CONTAINED doc is ≤ that many shingles at any container ratio (the
    regime the ratio cap excludes); the prefix route is already exact
    and ignores it."""
    g = grams if grams is not None else gram_sets(df, content_col, id_col, shingle_n)
    if route is None:
        route = choose_containment_route(
            df, content_col, id_col, threshold, shingle_n,
            grams=g, cand_per_doc=cand_per_doc,
        )
    if route == "prefix":
        return containment_pairs(df, content_col, id_col, threshold, shingle_n, grams=g)
    if route != "minhash":
        raise ValueError(f"unknown route {route!r} (expected 'prefix' or 'minhash')")
    if max_bucket == "auto":
        max_bucket = routed_max_bucket(df.count(), cand_per_doc)
    return containment_minhash_pairs(
        df, content_col, id_col, threshold, shingle_n, grams=g,
        ratio_cap=ratio_cap, target_recall=target_recall,
        rows_per_band=rows_per_band, max_bucket=max_bucket,
        small_side_exact_max=small_side_exact_max,
    )


def decontaminate_neardup(
    corpus: DataFrame,
    benchmark: DataFrame,
    content_col: str,
    id_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-corpus NEAR-dup decontamination: MinHash/LSH-blocked
    corpus×benchmark candidate join, exact-Jaccard verify. Completes the
    decontamination trio — `decontaminate` catches verbatim n-gram
    overlap, `decontaminate_embeddings` semantic paraphrase; this one
    catches lightly-edited eval items (reworded question, renumbered
    options) that defeat exact n-grams but keep shingle-set Jaccard high.

    Scale shape: both sides sign in their scan pass (no shuffle); the
    benchmark's slim banded rows (eval sets are thousands of docs —
    bounded by construction, callers pass a limit() so the plan proves
    it) broadcast against the corpus's banded rows, so the corpus is
    NEVER shuffled — candidate cost is one broadcast-join pass, verify
    touches only candidates, benchmark shingle sets ride a second tiny
    broadcast. Returns flagged pairs (doc_id, bench_id, jaccard ≥
    threshold); candidates-only semantics match minhash_lsh_pairs (the
    banding is probabilistic; at the default r=4/16-band config misses at
    j ≥ 0.5 are (1-j⁴)¹⁶ ≈ <1% and the exact-oracle equality is pinned at
    the tested thresholds)."""
    cg = gram_sets(corpus, content_col, id_col, shingle_n)
    bg = gram_sets(benchmark, content_col, id_col, shingle_n)
    cs = minhash_signatures(corpus, content_col, id_col, num_hashes, shingle_n, grams=cg)
    bs = minhash_signatures(benchmark, content_col, id_col, num_hashes, shingle_n, grams=bg)
    cb = _banded_rows(cs, num_hashes, bands)
    bb = _banded_rows(bs, num_hashes, bands).withColumnRenamed("_id", "bench_id")
    cand = (
        cb.join(F.broadcast(bb), ["band", "bh"])
        .select(F.col("_id").alias("doc_id"), "bench_id")
        .dropDuplicates(["doc_id", "bench_id"])
    )
    cand = cand.join(
        cg.select(F.col("_id").alias("doc_id"), F.col("_grams").alias("ga")), "doc_id"
    ).join(
        F.broadcast(
            bg.select(F.col("_id").alias("bench_id"), F.col("_grams").alias("gb"))
        ),
        "bench_id",
    )
    jac = F.round(
        F.size(F.array_intersect("ga", "gb")).cast("double")
        / F.size(F.array_union("ga", "gb")),
        6,
    )
    return cand.select("doc_id", "bench_id", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def build_minhash_store(
    df: DataFrame,
    content_col: str,
    id_col: str,
    store_path: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> None:
    """Materialize the minhash signature store for continuous-ingest
    near-dup detection: the banded bucket keys (slim rows, partitioned by
    band so an incremental probe prunes to matching band files) plus the
    shingle sets for the verify stage. Built once over the historical
    corpus — each new batch probes it (incremental_minhash_candidates)
    without recomputing a single historical signature. This is the
    signature checkpoint table minhash_lsh_pairs' persist() stands in for
    within one job, made durable across jobs."""
    sigs = minhash_signatures(df, content_col, id_col, num_hashes, shingle_n)
    sigs = sigs.persist()
    (
        _banded_rows(sigs, num_hashes, bands)
        .write.mode("overwrite").partitionBy("band").parquet(f"{store_path}/bands")
    )
    sigs.select("_id", "_grams").write.mode("overwrite").parquet(f"{store_path}/grams")
    sigs.unpersist()


def update_minhash_store(
    batch: DataFrame,
    content_col: str,
    id_col: str,
    store_path: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    sigs: DataFrame | None = None,
) -> None:
    """Append a new batch's signatures to an existing store — the commit
    half of the probe-then-commit ingest cycle (probe:
    incremental_minhash_candidates). Append-only parquet, same layout as
    build_minhash_store, so the store grows by batch size per ingest and
    probing stays independent of ingest history length. A caller running
    probe AND commit on the same batch passes the (persisted) `sigs`
    frame so the 64-hash stage runs once per batch, not twice."""
    owned = sigs is None
    if owned:
        sigs = minhash_signatures(batch, content_col, id_col, num_hashes, shingle_n)
        sigs = sigs.persist()
    (
        _banded_rows(sigs, num_hashes, bands)
        .write.mode("append").partitionBy("band").parquet(f"{store_path}/bands")
    )
    sigs.select("_id", "_grams").write.mode("append").parquet(f"{store_path}/grams")
    if owned:  # a caller-provided frame stays under the caller's lifetime
        sigs.unpersist()


def incremental_minhash_candidates(
    batch: DataFrame,
    content_col: str,
    id_col: str,
    store_path: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.5,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup detection for a NEW batch against the persisted store:
    batch signatures (computed fresh, batch-sized) bucket-join the store's
    banded keys, candidates verify with exact Jaccard against the store's
    shingle sets. Returns (batch_id, store_id, jaccard ≥ threshold) — the
    batch rows to drop (or cluster) before appending to the corpus.
    `sigs` lets a probe-then-commit caller share one (persisted)
    signature frame across both halves.

    Scale: the join is (batch bands ∪ store bands) slim rows shuffled on
    (band, bh) — Catalyst broadcasts the batch side when it is small (the
    common shape); historical shingles are read ONLY for the candidate
    ids via the verify join, never scanned wholesale. Probing cost is
    independent of how many batches were ingested before. Hot-bucket
    note (r12, the routers' max_bucket concern checked here too): a hot
    band-hash expands as batch-posting × store-posting rows through this
    EQUI-JOIN — distributed across tasks and split further by AQE's
    skew-join handling — not the single-task collect_list b² shape the
    routed paths cap, so no bucket backstop is needed on this path."""
    spark = batch.sparkSession
    shared_sigs = sigs is not None
    if sigs is None:
        sigs = minhash_signatures(batch, content_col, id_col, num_hashes, shingle_n)
    bb = _banded_rows(sigs, num_hashes, bands)
    sb = spark.read.parquet(f"{store_path}/bands")
    cand = (
        bb.select(F.col("_id").alias("batch_id"), "band", "bh")
        .join(sb.select(F.col("_id").alias("store_id"), "band", "bh"), ["band", "bh"])
        .select("batch_id", "store_id")
        .dropDuplicates(["batch_id", "store_id"])
    )
    sg = spark.read.parquet(f"{store_path}/grams")
    # Batch grams: from the caller's persisted signature frame when one
    # was shared (probe-then-commit — already materialized, no recompute),
    # else an independent lazy frame, not a hidden persist() of sigs —
    # same no-hidden-cache rule as minhash_lsh_pairs.
    if shared_sigs:
        batch_grams = sigs.select("_id", "_grams")
    else:
        batch_grams = gram_sets(batch, content_col, id_col, shingle_n)
    cand = (
        cand.join(
            batch_grams.select(F.col("_id").alias("batch_id"), F.col("_grams").alias("ga")),
            "batch_id",
        ).join(
            sg.select(F.col("_id").alias("store_id"), F.col("_grams").alias("gb")),
            "store_id",
        )
    )
    jac = F.round(
        F.size(F.array_intersect("ga", "gb")).cast("double") / F.size(F.array_union("ga", "gb")),
        6,
    )
    return cand.select("batch_id", "store_id", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


# ----------------------------------------------------------------- simhash

def simhash(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash per doc: sign-sum of token xxhash64 bits.

    Implementation: explode tokens, then for each bit b a conditional sum
    (+1 if bit set else -1); sign of the sum sets the output bit. 64 agg
    expressions in one groupBy — one shuffle on the doc id (map-side
    combined). Returns (_id, simhash bigint)."""
    t = scan_parallelize(
        df.select(F.col(id_col).alias("_id"), F.col(content_col).alias("_c"))
    ).select("_id", F.explode(tokens(F.col("_c"))).alias("tok"))
    t = t.withColumn("h", F.xxhash64("tok"))
    # Parsed expr strings, not Column composition (r14, the _banded_rows
    # precedent): the 64 when/sum aggregates plus the 64-term XOR fold
    # issued ~900 py4j round-trips — ~1.6-2.0 s of pure driver time PER
    # CALL. The SQL spellings parse to the IDENTICAL analyzed plan (CASE
    # WHEN is `when`, `&`/`>>`/`^` are the same bitwise nodes), so the
    # plan fingerprint is unchanged; construct drops to a handful of
    # round-trips.
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        )
        for b in range(64)
    ]
    agg = t.groupBy("_id").agg(*bit_sums)
    sh = " ^ ".join(
        f"shiftleft(CASE WHEN b{b} > 0 THEN CAST(1 AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END, {b})"
        for b in range(64)
    )
    return agg.select("_id", F.expr(f"({sh}) AS simhash"))


def hamming_candidate_keys(
    hashes: DataFrame, hash_col: str, max_hamming: int = 3, chunks: int = 8
) -> DataFrame:
    """Combination-blocking keys for the banded hamming join (Manku, Jain
    & Das Sarma, "Detecting Near-Duplicates for Web Crawling", WWW'07):
    split the 64-bit hash into `chunks` pieces and emit one key per
    (chunks − max_hamming)-chunk COMBINATION — a pair within distance
    ≤ max_hamming has ≥ chunks − max_hamming clean chunks, so some
    combination matches on both sides (same completeness guarantee as
    single-chunk pigeonhole banding).

    Why combinations and not single chunks: a single-chunk key lives in a
    FIXED space of chunks·2^(64/chunks) values (4·2^16 at the old
    defaults) — expected candidates ≈ chunks·n²/2^(64/chunks), quadratic
    with a small constant once the corpus outgrows the key space (the
    fixed-cardinality-block trap, SCALE.md round-8). A combination key
    carries (chunks − max_hamming)·64/chunks hash bits — 40 at the
    defaults — so distinct keys keep growing with content for any
    realistic corpus and expected accidental collisions stay
    ≈ C(chunks, max_hamming)·n²/2^40: sub-linear in n until n ~ 10^10,
    vs quadratic onset at n ~ 10^4 before. The trade is constant row
    fan-out C(chunks, chunks − max_hamming) (56 at the defaults) instead
    of `chunks` (4) — slim (id, hash, key) rows, still ONE equi-join.

    The key is xxhash64(combo_id, chunk values…): constant 8-byte keys
    at any combination width, and a hash collision only ADDS a candidate
    pair (the exact bit_count verify drops it) — completeness never
    depends on the hash. Returns (_id, _h, key)."""
    from itertools import combinations

    if chunks <= max_hamming:
        raise ValueError(
            f"chunks ({chunks}) must exceed max_hamming ({max_hamming}): "
            "the guarantee needs at least one clean chunk combination"
        )
    if 64 % chunks:
        raise ValueError(f"chunks ({chunks}) must divide 64")
    width = 64 // chunks
    mask = (1 << width) - 1
    src = hashes.select("_id", F.col(hash_col).alias("_h"))
    # chunk c = bits [c·width, (c+1)·width): arithmetic shiftright's sign
    # extension is masked off, so extraction is logical on signed longs.
    # ONE parsed expr (r14, the _banded_rows precedent): the 56-key
    # Column composition issued ~400 py4j round-trips per call; the SQL
    # spelling is the same analyzed plan (& IS bitwiseAND, the int
    # combo-id literal IS F.lit) for ~2.
    def cv(c: int) -> str:
        return f"(shiftright(_h, {c * width}) & {mask})"

    keys = ", ".join(
        "xxhash64({}, {})".format(ci, ", ".join(cv(c) for c in combo))
        for ci, combo in enumerate(combinations(range(chunks), chunks - max_hamming))
    )
    return src.select("_id", "_h", F.expr(f"explode(array({keys})) AS key"))


def hamming_pairs(
    hashes: DataFrame, hash_col: str, max_hamming: int = 3, chunks: int = 8
) -> DataFrame:
    """Near-dup pairs within hamming distance ≤ max_hamming over ANY
    64-bit fingerprint frame (_id, <hash_col>) — the shared candidate
    core of simhash_pairs (text) and multimodal.phash_neardup_pairs
    (images/audio).

    Candidate generation is the WWW'07 combination blocking above
    (hamming_candidate_keys — growing key cardinality, constant fan-out,
    one equi-join); candidates are verified with the exact
    bit_count(xor), so the result is the COMPLETE pair set at distance
    ≤ max_hamming regardless of blocking parameters. The verify filter
    runs before the pair dedup so only true pairs reach that shuffle.

    The self-join evaluates the `hashes` frame's lineage on BOTH
    branches (Spark does no cross-branch CSE) — when the fingerprints
    are expensive to derive (simhash's 64 bit-sum aggregation), pass a
    caller-persisted frame to pay that cost once; same caller-owned
    cache contract as minhash's grams=. Measured r10: exchange reuse
    does NOT save this self-join under AQE — Catalyst broadcasts one
    side at test scale (duplicating the lineage), and even hinted to a
    shuffle join, Spark 4.1's adaptive planner does not dedup the two
    canonically-identical exchanges (the non-AQE planner does — but
    AQE's skew/coalesce handling is worth more here at 100 TB than the
    reuse). Returns (id_a, id_b, hamming)."""
    keyed = hamming_candidate_keys(hashes, hash_col, max_hamming, chunks)
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
    return (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_pairs(
    df: DataFrame, content_col: str, id_col: str, max_hamming: int = 3, chunks: int = 8
) -> DataFrame:
    """SimHash near-dup pairs within hamming distance ≤ max_hamming —
    simhash() fingerprints fed through the shared banded hamming join
    (hamming_pairs, WWW'07 combination blocking). Returns
    (id_a, id_b, hamming)."""
    return hamming_pairs(
        simhash(df, content_col, id_col), "simhash", max_hamming, chunks
    )


# ---------------------------------------------------- duplicate clustering

def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 10
) -> DataFrame:
    """Cluster near-dup pairs into duplicate groups: iterative min-label
    propagation over the undirected pair graph (the standard distributed
    connected-components loop — large-star/small-star simplified to
    neighbor-min, which converges in O(diameter) rounds; near-dup clusters
    are shallow, so a handful of rounds suffices).

    Each round is one groupBy shuffle on the node id; no driver-side
    union-find, no collect. Every round's labels are localCheckpoint'ed —
    WITHOUT lineage truncation an iterative DataFrame loop builds an
    exponentially deep plan and Catalyst analysis itself becomes the
    bottleneck after ~10 rounds (at any data size). Returns
    (node, cluster) where cluster is the min node id reachable.
    Early-stops when labels stop changing."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("cluster").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce(F.col("nmin"), F.col("cluster"))).alias(
                    "cluster"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


# -------------------------------------------------- embedding cosine dedup

def rademacher_signs(
    seed: int, n_bands: int, band_bits: int, dim: int
) -> list[list[list[int]]]:
    """Deterministic ±1 hyperplane matrix for the sign-band signature:
    sign[b][j][i] = +1 iff the first hex digit of
    md5(f"{seed}:{b}:{j}:{i}") is odd. md5 of a short ASCII string is
    engine-independent, so a SQL oracle (DuckDB md5()) derives the SAME
    matrix from the same literals — no PRNG whose stream an engine would
    have to replicate."""
    import hashlib

    return [
        [
            [
                1
                if int(hashlib.md5(f"{seed}:{b}:{j}:{i}".encode()).hexdigest()[0], 16) % 2
                else -1
                for i in range(dim)
            ]
            for j in range(band_bits)
        ]
        for b in range(n_bands)
    ]


def signband_signature(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_bands: int,
    band_bits: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """Seeded random-rotation sign signature: band value b = the
    band_bits-bit word whose bit j is 1 iff Σ_i q[i]·sign[b][j][i] > 0,
    where q = floor(v·10^6) (integer-quantized) and sign is the
    rademacher_signs matrix above.

    Integer quantization makes every dot product EXACT (64-dim sums of
    bounded longs — associative, order-free), so the signature is
    bit-reproducible across engines and partitionings; a double-precision
    dot would hinge sign decisions on summation order. All JVM
    higher-order functions (transform / zip_with / aggregate), no Python.
    Returns (_id, band, bv) — n_bands slim rows per input row."""
    signs = rademacher_signs(seed, n_bands, band_bits, dim)
    v = df.select(
        F.col(id_col).alias("_id"),
        F.expr(
            f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("q"),
    )
    # ONE parsed expr (r14, the _banded_rows precedent): the
    # n_bands × band_bits when/lit/add Column composition issued ~1000
    # py4j round-trips per call at the neardup sizing; the SQL spelling
    # analyzes to the identical plan for ~2.
    def bv_sql(b: int) -> str:
        return " + ".join(
            "CASE WHEN aggregate(zip_with(q, array({lits}), (x, s) -> x * s), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x) > 0 "
            "THEN CAST({bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END".format(
                lits=", ".join(str(s) for s in signs[b][j]), bit=1 << j
            )
            for j in range(band_bits)
        )

    bands = ", ".join(
        f"struct({b} AS band, ({bv_sql(b)}) AS bv)" for b in range(n_bands)
    )
    return v.select("_id", F.expr(f"explode(array({bands})) AS bb")).select(
        "_id", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
    )


def signband_signature_arrow(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_bands: int,
    band_bits: int,
    seed: int,
    dim: int,
) -> DataFrame:
    """Arrow-batched numpy twin of signband_signature: one int64 matmul
    per batch (quantized vectors × the dim×(n_bands·band_bits) sign
    matrix) instead of n_bands·band_bits interpreted zip_with/aggregate
    expressions per row. BIT-IDENTICAL by construction — the dots are
    exact int64 sums of the same floor(v·10^6) quantization, and integer
    addition is order-free, so numpy's summation order cannot flip a
    sign the way a double-precision matmul could (pinned equal in
    tests/test_keygrowth.py). The raw-throughput choice for corpus-scale
    signature sweeps (the same JVM-vs-Arrow split as similarity's
    _centroid_structs vs _cell_assign_udf) — and the DEFAULT path of
    embedding_signband_neardup (arrow=True), which therefore requires
    numpy+pandas; pass arrow=False there for the pure-JVM expression
    plan in environments without Arrow batching (ADVICE r9: default and
    doc used to contradict — the default IS Arrow)."""
    import numpy as np
    import pandas as pd

    signs = np.array(
        rademacher_signs(seed, n_bands, band_bits, dim), dtype=np.int64
    ).reshape(n_bands * band_bits, dim).T  # dim × (bands·bits)
    weights = np.array(
        [1 << j for j in range(band_bits)] * n_bands, dtype=np.int64
    )
    id_type = dict(df.dtypes)[id_col]
    slim = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.floor(
                np.stack(pdf["_v"].map(np.asarray).to_list()).astype(np.float64)
                * 1_000_000
            ).astype(np.int64)  # rows × dim, exact same quantization
            bits = (q @ signs > 0).astype(np.int64) * weights  # rows × (bands·bits)
            bvs = bits.reshape(len(pdf), n_bands, band_bits).sum(axis=2)
            yield pd.DataFrame(
                {
                    "_id": pdf["_id"].repeat(n_bands).to_numpy(),
                    "band": np.tile(np.arange(n_bands, dtype=np.int64), len(pdf)),
                    "bv": bvs.reshape(-1),
                }
            )

    return slim.mapInPandas(run, schema=f"`_id` {id_type}, band long, bv long")


def lsh_recall_bands(
    band_bits: int, target_recall: float = 0.9, cos: float = 0.99
) -> int:
    """How many sign-bands it takes to catch a pair at cosine `cos` with
    probability ≥ target_recall at the given band width — the standard
    LSH amplification identity: per-bit agreement p = 1 − acos(cos)/π
    (random-hyperplane collision probability, Charikar STOC'02), a band
    matches with p^band_bits, and bands independent bands give
    1 − (1 − p^band_bits)^bands ≥ recall ⇒
    bands = ceil(ln(1 − recall) / ln(1 − p^band_bits)).

    This is the concrete form of "hold recall by raising n_bands ~ n^ρ"
    in embedding_signband_neardup's contract: as adaptive_band_bits
    widens bands with log2(n), p^band_bits shrinks and the bands needed
    for the SAME (cos, recall) grow polynomially — the textbook LSH
    time/recall trade, made a one-call sizing decision instead of a
    folk knob."""
    import math

    if not 0 < target_recall < 1:
        raise ValueError(f"target_recall must be in (0, 1), got {target_recall}")
    p = 1 - math.acos(max(-1.0, min(1.0, cos))) / math.pi
    pb = p ** band_bits
    if pb >= 1:
        return 1
    if pb <= 0:
        raise ValueError(f"cos={cos} gives zero band-collision probability")
    return max(1, math.ceil(math.log(1 - target_recall) / math.log(1 - pb)))


def adaptive_band_bits(n: int, extra_bits: int = 8) -> int:
    """Band width that keeps the sign-band join linear as the corpus
    grows: ceil(log2 n) + extra_bits. Expected accidental (uncorrelated)
    band collisions are n²/2^band_bits per band = n/2^extra_bits · n —
    i.e. a vanishing fraction of n² and a bounded multiple of n, at any
    corpus size. A FIXED width is the quadratic trap: once n outgrows
    2^band_bits the mean bucket holds n/2^band_bits rows and the
    self-join degenerates to all-pairs-over-a-constant (SCALE.md
    round-8/round-9)."""
    import math

    return max(4, math.ceil(math.log2(max(n, 2))) + extra_bits)


def embedding_signband_neardup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.4,
    band_bits: int | None = None,
    n_bands: int | None = None,
    seed: int = 1,
    dim: int | None = None,
    arrow: bool = True,
    target_recall: float = 0.9,
    recall_cos: float = 0.99,
) -> DataFrame:
    """Embedding near-dup pairs via seeded sign-band LSH candidate
    generation + exact cosine verify — the scale path for the all-pairs
    operator below.

    Candidate generation is random-hyperplane bit-sampling LSH over the
    signband_signature above: n_bands bands of band_bits sign bits each,
    hyperplanes drawn from the deterministic md5-seeded Rademacher matrix
    (rademacher_signs) — reproducible in plain SQL, so the DuckDB oracle
    replays candidate generation bit-for-bit rather than settling for a
    rows-only check. A pair is a candidate iff it agrees on at least one
    whole band (the same banding scheme as minhash_lsh_pairs).

    Scale contract: band_bits must GROW with the corpus —
    ceil(log2 n) + 8 (adaptive_band_bits; computed from a count when not
    pinned by the caller) keeps expected accidental collisions ≈ n/256
    per band. The former AXIS-ALIGNED 4-bit banding had 16·2^4 = 256
    fixed join keys — all-pairs with a constant at corpus scale, and the
    64 axis signs capped the signature at dim bits so the width could
    never grow; the seeded rotation decouples signature length from dim.
    Per-band recall at band_bits = log2(n)+8 falls for weakly-similar
    pairs as n grows (the standard LSH trade); since r10 (VERDICT r9
    item 4) the DEFAULT n_bands is therefore SIZED, not fixed: when the
    caller does not pin it, n_bands = lsh_recall_bands(band_bits,
    target_recall, recall_cos) — enough bands to catch a pair at cosine
    `recall_cos` (default 0.99, the truly-near-duplicate regime) with
    probability ≥ target_recall (default 0.9) AT THE CURRENT WIDTH, so
    the count grows with band_bits (≈ n^ρ) exactly as the amplification
    identity demands instead of silently losing recall at 8 fixed bands
    (recall at the planted cos≈0.9999 dups is far higher still — pinned
    at two corpus sizes in tests/test_keygrowth.py). The verify stage
    re-attaches vectors to the (much smaller) candidate set; every
    reported pair is exact-cosine-verified ≥ threshold.
    Returns (id_a, id_b, cos ≥ threshold) over candidates."""
    v = df.select(
        F.col(id_col).alias("_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn(
        "norm", F.sqrt(F.expr("aggregate(v, cast(0 as double), (acc, x) -> acc + x * x)"))
    )
    if dim is None:  # fallback probe — pass dim to keep the builder lazy
        dim = len(df.select(vec_col).first()[0])
    if band_bits is None:  # fallback count — pin band_bits to stay lazy
        band_bits = adaptive_band_bits(df.count())
    if n_bands is None:  # sized for (recall_cos, target_recall) at this width
        n_bands = lsh_recall_bands(band_bits, target_recall, recall_cos)
    # Arrow matmul by default: bit-identical to the expression path
    # (exact int64 arithmetic, pinned in tests) and ~5x faster per pass —
    # which the self-join below pays TWICE, once per branch (Spark does
    # no cross-branch CSE). arrow=False keeps the pure-JVM expression
    # plan for environments without Arrow batching.
    sig_fn = signband_signature_arrow if arrow else signband_signature
    banded = sig_fn(df, vec_col, id_col, n_bands, band_bits, seed, dim)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        cand.join(
            v.select(F.col("_id").alias("id_a"), F.col("v").alias("va"), F.col("norm").alias("na")),
            "id_a",
        ).join(
            v.select(F.col("_id").alias("id_b"), F.col("v").alias("vb"), F.col("norm").alias("nb")),
            "id_b",
        )
    )
    dot = F.expr(
        "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"
    )
    cos = F.round(dot / (F.col("na") * F.col("nb")), 6)
    return cand.select("id_a", "id_b", cos.alias("cos")).filter(F.col("cos") >= threshold)

def build_fingerprint_store(
    df: DataFrame, content_col: str, id_col: str, store_path: str
) -> None:
    """Materialize the content-digest store: one row per distinct digest
    with the id that first claimed it. Built once over the historical
    corpus; each new ingest batch dedupes against it (incremental_dedup)
    and appends its survivors — the continuous-ingest pattern, where the
    corpus is never rescanned per batch."""
    (
        df.select(F.md5(F.col(content_col)).alias("digest"), F.col(id_col).alias("keep_id"))
        .groupBy("digest")
        .agg(F.min("keep_id").alias("keep_id"))
        .write.mode("overwrite")
        .parquet(store_path)
    )


def incremental_dedup(
    batch: DataFrame,
    content_col: str,
    id_col: str,
    store_path: str,
    update_store: bool = False,
) -> DataFrame:
    """Dedup a NEW batch against the persisted digest store: collapse the
    batch to one row per digest (keep the smallest id), then anti-join the
    store — survivors are content never seen in the historical corpus or
    earlier in this batch.

    Scale: the batch groupBy shuffles batch-sized rows on uniform digests;
    the anti-join shuffles (batch ∪ store) slim digest rows — linear in
    store size, and Catalyst broadcasts the batch side instead when it is
    small (the common shape: GB-scale batch vs PB-scale store, where the
    anti-join is exactly a shuffled hash join on the digest, never a
    rescan of content). With update_store the survivors append to the
    store (eagerly — the returned frame is already materialized by the
    write). Returns (id, digest) survivors."""
    spark = batch.sparkSession
    b = (
        batch.select(F.md5(F.col(content_col)).alias("digest"), F.col(id_col).alias("_id"))
        .groupBy("digest")
        .agg(F.min("_id").alias("_id"))
    )
    store = spark.read.parquet(store_path).select("digest")
    out = b.join(store, "digest", "left_anti").select(
        F.col("_id"), F.col("digest")
    )
    if update_store:
        out.select("digest", F.col("_id").alias("keep_id")).write.mode("append").parquet(
            store_path
        )
    return out


def _span_hashes(tok_col: str, n: int):
    """Distinct token-n-gram span hashes (16-hex-char md5 prefix — 64 bits,
    collision-negligible below ~10^9 distinct spans per comparison scope;
    lexicographic compare == numeric). Built-in higher-order functions only."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(size({tok_col}) - {n - 1}, 1)), "
        f"i -> substring(md5(concat_ws(' ', slice({tok_col}, i, {n}))), 1, 16)))"
    )


def duplicated_span_stats(
    df: DataFrame, content_col: str, id_col: str, n: int = 10, min_docs: int = 2
) -> DataFrame:
    """Exact-substring duplication profile — the span-level dedup signal
    from Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (ACL 2022): instead of whole-document hashes, count how much of
    each document's token stream also occurs verbatim elsewhere in the
    corpus. Lee et al. use a suffix array over the concatenated corpus;
    the distributed equivalent is an n-gram-span census — every duplicated
    run of ≥ n tokens is caught because all its length-n sub-spans are.

    Plan, all linear: (1) per-doc distinct span hashes in the scan
    projection (zero shuffle); (2) census as count-over-window on the
    span key — the span stream shuffles ONCE on uniform md5 hashes and
    is computed once (the groupBy-census + join-back form shuffled the
    same full stream for the join anyway AND planned the explode twice);
    (3) one groupBy(doc) roll-up. No pairwise stage exists anywhere, so
    cost is O(total tokens), independent of how duplicated the corpus
    is. A span duplicated across a large fraction of the corpus
    concentrates its rows in one span partition — the same residence the
    join-back form had; pre-filtering exact duplicates bounds it.

    Returns one row per doc: (id, n_spans, n_dup_spans, dup_span_frac)
    where n_spans counts DISTINCT spans and a span is "dup" if it appears
    in ≥ min_docs distinct documents. Docs shorter than n tokens get one
    clamped span (same convention as shingles/winnowing above)."""
    d = scan_parallelize(
        df.select(F.col(id_col).alias("_id"), F.col(content_col).alias("_c"))
    ).select("_id", tokens(F.col("_c")).alias("_t"))
    from pyspark.sql import Window as W

    spans = d.select("_id", F.explode(_span_hashes("_t", n)).alias("span"))
    # census as a count-over-window on the span key: the same shuffle a
    # groupBy(span) would cost, but the span stream is computed ONCE —
    # the census+join-back form planned the whole explode pipeline twice
    nd = F.count("*").over(W.partitionBy("span"))
    return (
        spans.withColumn("_nd", nd)
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("_nd") >= min_docs).cast("bigint")).alias("n_dup_spans"),
        )
        .withColumn(
            "dup_span_frac", F.round(F.col("n_dup_spans") / F.col("n_spans"), 6)
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    content_col: str,
    id_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ≥ min_hits
    distinct n-gram spans with an evaluation/benchmark set — the standard
    train-set hygiene pass (GPT-3 appendix C / PaLM-style n-gram overlap).

    Scale: the benchmark side is tiny relative to a 100 TB corpus (eval
    sets are MBs), so its distinct span-hash set is BROADCAST — corpus
    spans are probed in place in the scan stage and never shuffle for the
    join; the only exchange is the per-doc roll-up on the uniform doc id.
    The broadcast left join keeps zero-hit docs so the output is a total
    labeling, not just the contaminated subset.

    Returns one row per corpus doc: (id, n_spans, n_bench_hits,
    contaminated∈{0,1}); n_spans counts the doc's distinct spans."""
    bench = (
        benchmark.select(tokens(F.col(content_col)).alias("_t"))
        .select(F.explode(_span_hashes("_t", n)).alias("span"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    spans = (
        scan_parallelize(
            corpus.select(F.col(id_col).alias("_id"), F.col(content_col).alias("_c"))
        )
        .select("_id", tokens(F.col("_c")).alias("_t"))
        .select("_id", F.explode(_span_hashes("_t", n)).alias("span"))
    )
    return (
        spans.join(F.broadcast(bench), "span", "left")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_bench_hits"),
        )
        .withColumn(
            "contaminated", (F.col("n_bench_hits") >= min_hits).cast("int")
        )
    )


def embedding_neardup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95, block_col: str | None = None
) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    Exact variant: pairwise within an optional block column. Cosine is
    computed with built-in higher-order functions (zip_with + aggregate) in
    double precision — no UDF. At 100 TB use the LSH variant in
    similarity.py for candidate generation; this is the verify stage.
    Returns (id_a, id_b, cos)."""
    v = df.select(
        F.col(id_col).alias("_id"),
        *( [F.col(block_col)] if block_col else [] ),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).withColumn(
        "norm", F.sqrt(F.expr("aggregate(v, cast(0 as double), (acc, x) -> acc + x * x)"))
    )
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a._id") < F.col("b._id")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    dot = F.expr(
        "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"
    )
    cos = F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6)
    return (
        a.join(b, cond)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def simhash_md5(df: DataFrame, content_col: str, id_col: str, bits: int = 60) -> DataFrame:
    """Oracle-checkable SimHash twin: token hash = first 15 hex chars of
    md5 (60 bits — fits signed 64-bit ranges in any engine), bit
    extraction by integer div/mod, sign-sum per bit — so a SQL oracle can
    replay the arithmetic bit-for-bit. The xxhash64-based simhash() above
    stays the production variant (no string hashing pass); both share the
    sign-sum construction, so value-checking this twin pins the whole
    bit-pipeline shape. Same plan as simhash: one map-side-combined
    groupBy on the doc id. Returns (_id, simhash bigint)."""
    t = scan_parallelize(
        df.select(F.col(id_col).alias("_id"), F.col(content_col).alias("_c"))
    ).select("_id", F.explode(tokens(F.col("_c"))).alias("tok"))
    t = t.withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    )
    # parsed exprs, not Column composition — see simhash() (r14)
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN ((h div {1 << b}) % 2) = 1 THEN 1 ELSE -1 END) AS b{b}"
        )
        for b in range(bits)
    ]
    agg = t.groupBy("_id").agg(*bit_sums)
    sh = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return agg.select("_id", F.expr(f"({sh}) AS simhash"))


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: list[tuple[int, list[float]]],
    threshold: float = 0.9,
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings by nearest centroid, then
    within each cluster drop every document whose cosine similarity to a
    SMALLER-ID cluster-mate exceeds `threshold` — the deterministic
    keep-first rule (the paper keeps one representative per
    eps-neighborhood; keeper choice there is heuristic, here pinned to
    the smallest id so any engine reproduces the exact keep set).

    Scale shape (the paper's own recipe): quadratic work appears ONLY
    within clusters, and k — the centroid count — is the knob that bounds
    cluster size (they scale k with the corpus so n/k stays ~constant).
    Assignment is the zero-shuffle literal-centroid projection
    (similarity.assign_to_centroids); pairing is one shuffle on the
    cluster key. With `max_cluster` set, clusters larger than the cap are
    sub-blocked by a deterministic id-hash into ceil(n/max_cluster)
    blocks — quadratic cost stays bounded at max_cluster² per block at
    the price of missing cross-block pairs inside oversized clusters
    (the max_bucket recall trade of minhash_lsh_pairs, documented there).

    Returns (id, cluster, keep) for every input row; cosine is rounded
    to 6 places BEFORE the threshold compare so the keep set is
    reproducible across engines."""
    from dataux_spark.operators.similarity import assign_to_centroids

    assign = assign_to_centroids(df, vec_col, id_col, centroids)
    v = df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"),
    ).withColumn(
        "_vn", F.sqrt(F.expr("aggregate(_v, cast(0 as double), (acc, x) -> acc + x * x)"))
    )
    m = assign.select(id_col, "cluster").join(v, id_col)
    if max_cluster is not None:
        sizes = m.groupBy("cluster").agg(F.count("*").alias("_csz"))
        m = m.join(F.broadcast(sizes), "cluster").withColumn(
            "_blk",
            F.when(
                F.col("_csz") > max_cluster,
                F.pmod(F.xxhash64(F.col(id_col)), F.ceil(F.col("_csz") / max_cluster)),
            ).otherwise(F.lit(0)),
        )
    else:
        m = m.withColumn("_blk", F.lit(0))
    a = m.select(
        F.col(id_col).alias("_aid"), F.col("cluster"), F.col("_blk"),
        F.col("_v").alias("_av"), F.col("_vn").alias("_an"),
    )
    b = m.select(
        F.col(id_col).alias("_bid"), F.col("cluster"), F.col("_blk"),
        F.col("_v").alias("_bv"), F.col("_vn").alias("_bn"),
    )
    dot = F.expr(
        "aggregate(zip_with(_av, _bv, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"
    )
    cos = F.round(dot / (F.col("_an") * F.col("_bn")), 6)
    dropped = (
        a.join(b, ["cluster", "_blk"])
        .filter(F.col("_aid") < F.col("_bid"))
        .filter(cos > threshold)
        .select(F.col("_bid").alias(id_col))
        .distinct()
    )
    return (
        assign.select(id_col, "cluster")
        .join(dropped.withColumn("_drop", F.lit(True)), id_col, "left_outer")
        .select(id_col, "cluster", F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
    )


def decontaminate_embeddings(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.9,
) -> DataFrame:
    """Benchmark decontamination by embedding similarity — the semantic
    complement of the n-gram `decontaminate` pass: a paraphrased or
    reformatted eval item shares no 8-gram with its source, but its
    embedding still sits next to it. Flags every corpus doc whose cosine
    to ANY benchmark embedding exceeds `threshold` (rounded to 6dp
    before the compare, so the flag set is engine-reproducible).

    Scale shape: the benchmark side is tiny (eval sets), so it is
    BROADCAST — the corpus is scanned once against the in-memory bench
    vectors and never shuffles for the probe; the per-doc max-cosine
    roll-up keys on the uniform doc id. Returns a total labeling:
    (id, max_bench_cos, contaminated∈{0,1})."""
    c = corpus.select(
        F.col(id_col).alias("_id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"),
    ).withColumn(
        "_vn", F.sqrt(F.expr("aggregate(_v, cast(0 as double), (acc, x) -> acc + x * x)"))
    )
    b = benchmark.select(
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_bv")
    ).withColumn(
        "_bn", F.sqrt(F.expr("aggregate(_bv, cast(0 as double), (acc, x) -> acc + x * x)"))
    )
    dot = F.expr(
        "aggregate(zip_with(_v, _bv, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"
    )
    cos = F.round(dot / (F.col("_vn") * F.col("_bn")), 6)
    scored = (
        c.crossJoin(F.broadcast(b))
        .select("_id", cos.alias("_cos"))
        .groupBy("_id")
        .agg(F.max("_cos").alias("max_bench_cos"))
    )
    # total labeling even at the edges: an EMPTY benchmark (or a NULL
    # embedding) must yield contaminated = 0, not a vanished doc or a
    # NULL flag — the left join back to the corpus ids guarantees it
    return (
        c.select("_id")
        .join(scored, "_id", "left")
        .select(
            F.col("_id"),
            "max_bench_cos",
            F.coalesce(
                (F.col("max_bench_cos") > threshold).cast("int"), F.lit(0)
            ).alias("contaminated"),
        )
    )


def remove_duplicated_spans(
    df: DataFrame, content_col: str, id_col: str, n: int = 8, min_docs: int = 2
) -> DataFrame:
    """Exact-substring span REMOVAL — the cut half of Lee et al. ACL'22
    (duplicated_span_stats is the measurement half): every token covered
    by an n-token span occurring in ≥ min_docs distinct docs is dropped,
    and each doc's text is rebuilt from the surviving tokens in order.
    The canonical dedup for boilerplate sentences shared across pages
    that document-level dedup cannot touch.

    Scale shape — O(total tokens), no pairwise stage at any duplication
    rate: the census is one groupBy on distinct-per-doc span hashes
    (uniform 64-bit keys, map-side combine absorbs hot boilerplate
    spans); positional spans join the (census-filtered) duplicated-hash
    set on the same uniform key; coverage explodes to ≤ n rows per
    duplicated span; the rebuild is one doc-keyed roll-up. Returns a
    total labeling (id, n_tokens, n_kept, text_clean) — fully-removed
    docs keep a row with n_kept = 0."""
    d = scan_parallelize(
        df.select(F.col(id_col).alias("_id"), F.col(content_col).alias("_c"))
    ).select("_id", tokens(F.col("_c")).alias("_toks"))
    dup = (
        d.select("_id", F.explode(_span_hashes("_toks", n)).alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("nd"))  # hashes are distinct per doc
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    pos_spans = F.expr(
        f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)), "
        f"i -> struct(i AS pos, "
        f"substring(md5(concat_ws(' ', slice(_toks, i, {n}))), 1, 16) AS h))"
    )
    cov = (
        d.select("_id", F.explode(pos_spans).alias("s"))
        .select("_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
        .join(dup, "h")
        .select("_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("tpos"))
        .distinct()
    )
    tokpos = d.select(
        "_id", F.posexplode("_toks").alias("p0", "tk")
    ).select("_id", (F.col("p0") + 1).alias("tpos"), "tk")
    rebuilt = (
        tokpos.join(cov, ["_id", "tpos"], "left_anti")
        .groupBy("_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.concat_ws(
                " ",
                F.expr("transform(array_sort(collect_list(struct(tpos, tk))), x -> x.tk)"),
            ).alias("text_clean"),
        )
    )
    return (
        d.select("_id", F.size("_toks").alias("n_tokens"))
        .join(rebuilt, "_id", "left")
        .select(
            "_id",
            "n_tokens",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def dedup_savings_report(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Preflight ROI report for a dedup pass: given (node, cluster)
    assignments from connected_components above and the document frame,
    how much would dropping non-keepers save — per cluster SIZE, so the
    answer reads "37 pair-clusters, 4 triples, 1.2 MB reclaimed" before
    anyone commits to the rewrite. The keeper is the cluster's min id,
    which IS the cluster label (min-label propagation converges to
    exactly that), so keeper weight needs no window — one equality
    filter.

    Work: clusters is pair-graph-node-sized (only docs that appear in
    some near-dup pair), one join to fetch weights, one cluster groupBy,
    one size groupBy — everything downstream of the banded pair
    generation is tiny. Returns
    (cluster_size, n_clusters, dup_docs, chars_saved) for sizes >= 2."""
    sized = clusters.join(
        docs.select(F.col(id_col).alias("node"), F.col(weight_col).alias("_w")),
        "node",
    )
    per = sized.groupBy("cluster").agg(
        F.count("*").alias("sz"), F.sum("_w").alias("_tw")
    )
    keeper = sized.filter(F.col("node") == F.col("cluster")).select(
        "cluster", F.col("_w").alias("_kw")
    )
    return (
        per.join(keeper, "cluster")
        .groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum(F.col("sz") - 1).alias("dup_docs"),
            F.sum(F.col("_tw") - F.col("_kw")).alias("chars_saved"),
        )
    )


def cross_group_dup_matrix(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Corpus-mixing diagnostic: fold near-dup pairs into a GROUP x GROUP
    duplication matrix — "how much does source A repeat source B" — the
    table that decides which crawl/source to down-weight before mixing
    (a high off-diagonal cell means two sources ship the same content;
    a high diagonal means a source repeats itself). Same role as
    dedup_savings_report for sizes, sliced by provenance instead.

    Works over ANY pair frame from this module (ngram/minhash/simhash/
    containment). Each pair is counted once under the lexicographically
    canonical (group_a <= group_b) cell so A-vs-B and B-vs-A land
    together. Two id-keyed lookups against a slim (id, group) projection
    + one cell groupBy — everything after pair generation is pair-sized.
    Returns (group_a, group_b, n_pairs, avg_jaccard) when the pair frame
    carries `jaccard` (avg NULL otherwise)."""
    score = "jaccard" if "jaccard" in pairs.columns else None
    slim = docs.select(F.col(id_col).alias("_nid"), F.col(group_col).alias("_g"))
    ga = slim.select(F.col("_nid").alias("id_a"), F.col("_g").alias("_ga"))
    gb = slim.select(F.col("_nid").alias("id_b"), F.col("_g").alias("_gb"))
    joined = pairs.join(ga, "id_a").join(gb, "id_b")
    out = joined.groupBy(
        F.least("_ga", "_gb").alias("group_a"),
        F.greatest("_ga", "_gb").alias("group_b"),
    ).agg(
        F.count("*").alias("n_pairs"),
        (F.round(F.avg(score), 6) if score else F.lit(None).cast("double")).alias(
            "avg_jaccard"
        ),
    )
    return out
