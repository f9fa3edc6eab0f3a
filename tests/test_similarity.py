"""Similarity-search tests: LSH recall against the exact brute-force top-k."""

import pytest
from pyspark.sql import functions as F

from dataux_spark.operators import similarity
from dataux_spark.queries import read_table

K = 5
N_QUERIES = 10


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


def _topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_brute_force_topk_shape(emb):
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    res = similarity.brute_force_topk(emb, q, "embedding", "vec_id", k=K)
    rows = res.collect()
    assert len(rows) == N_QUERIES * K
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert -1.0 <= r.cos <= 1.0
    # ranks are 1..K per query, cos non-increasing within a query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, K + 1))
        assert all(rs[i].cos >= rs[i + 1].cos for i in range(len(rs) - 1))


@pytest.mark.slow  # multi-10s (r13 fast-path trim): recall now ALSO gate-checked by ann_lsh_topk's contract oracle
def test_lsh_recall_vs_brute_force(emb):
    """Sign-LSH with 64 bits / 4-bit bands: recall@5 ≥ 0.7 on random-ish
    embeddings (low-similarity corpus is the worst case for sign-LSH;
    this asserts the mechanism works, not SOTA recall)."""
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_map(similarity.brute_force_topk(emb, q, "embedding", "vec_id", k=K))
    approx = _topk_map(
        similarity.lsh_topk(emb, q, "embedding", "vec_id", k=K, nbits=64, band_bits=4)
    )
    hits = total = 0
    for qid, nbrs in exact.items():
        total += len(nbrs)
        hits += len(nbrs & approx.get(qid, set()))
    assert total == N_QUERIES * K
    assert hits / total >= 0.7, f"recall {hits}/{total}"


@pytest.mark.slow  # multi-10s (r13 fast-path trim)
def test_lsh_deterministic(emb):
    q = emb.filter(F.col("vec_id") < 3)
    a = similarity.lsh_topk(emb, q, "embedding", "vec_id", k=3, seed=7).collect()
    b = similarity.lsh_topk(emb, q, "embedding", "vec_id", k=3, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ivf_recall_vs_brute_force(emb):
    """IVF with 16 cells / nprobe=4 probes ~25% of the corpus per query;
    recall@5 ≥ 0.6 on random-ish embeddings (worst case: true neighbors
    are barely above the similarity floor, so cell boundaries cut them)."""
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_map(similarity.brute_force_topk(emb, q, "embedding", "vec_id", k=K))
    approx = _topk_map(
        similarity.ivf_topk(emb, q, "embedding", "vec_id", k=K, n_centroids=16, nprobe=4)
    )
    hits = total = 0
    for qid, nbrs in exact.items():
        total += len(nbrs)
        hits += len(nbrs & approx.get(qid, set()))
    assert total == N_QUERIES * K
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_ivf_deterministic_and_shape(emb):
    q = emb.filter(F.col("vec_id") < 3)
    a = similarity.ivf_topk(emb, q, "embedding", "vec_id", k=3, seed=7).collect()
    b = similarity.ivf_topk(emb, q, "embedding", "vec_id", k=3, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert r.neighbor_id != r.query_id and 1 <= r.rank <= 3


@pytest.mark.slow  # multi-10s (r13 fast-path trim): equality now ALSO gate-checked by ann_ivf_index_topk's matches_memory contract
def test_persisted_ivf_index_matches_inmemory(emb, spark, tmp_path):
    """build_ivf_index + ivf_index_topk returns the same top-k as the
    one-shot ivf_topk with identical hyperparameters — the on-disk cell
    layout must be a pure materialization of the in-memory plan."""
    path = str(tmp_path / "ivf_index")
    similarity.build_ivf_index(
        emb, "embedding", "vec_id", path, n_centroids=16, seed=7
    )
    # index layout: cell is a parquet partition column
    cells = spark.read.parquet(f"{path}/cells")
    assert "cell" in cells.columns and "cnorm" in cells.columns
    n_cells = spark.read.parquet(f"{path}/centroids").count()
    assert n_cells == 16

    q = emb.filter(F.col("vec_id") < N_QUERIES)
    from_index = similarity.ivf_index_topk(
        spark, path, q, "embedding", "vec_id", k=K, nprobe=4
    ).collect()
    in_memory = similarity.ivf_topk(
        emb, q, "embedding", "vec_id", k=K, n_centroids=16, nprobe=4, seed=7
    ).collect()
    assert sorted(map(tuple, from_index)) == sorted(map(tuple, in_memory))


@pytest.mark.slow  # multi-10s (r13 fast-path trim): the signband pipeline is fully value-checked by the ann_signband_topk oracle
def test_signband_topk_recall_and_shape(emb):
    """Axis-sign-band ANN (the oracle-checkable deterministic twin of
    lsh_topk): valid rank/cos shape, decent recall@5, and determinism."""
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_map(similarity.brute_force_topk(emb, q, "embedding", "vec_id", k=K))
    res = similarity.signband_topk(emb, q, "embedding", "vec_id", k=K, dim=64)
    rows = res.collect()
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert 1 <= r.rank <= K
    approx = {}
    for r in rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for qid, nbrs in exact.items():
        total += len(nbrs)
        hits += len(nbrs & approx.get(qid, set()))
    assert hits / total >= 0.6, f"recall {hits}/{total}"
    again = similarity.signband_topk(emb, q, "embedding", "vec_id", k=K, dim=64).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


@pytest.mark.slow  # multi-10s (r13 fast-path trim)
def test_signband_topk_candidates_only(emb):
    """Every returned neighbor must share ≥1 (band, value) with its query
    — signband_topk never falls back to brute force."""
    q = emb.filter(F.col("vec_id") < 3)
    rows = similarity.signband_topk(emb, q, "embedding", "vec_id", k=K, dim=64).collect()
    vecs = {r.vec_id: list(r.embedding) for r in emb.select("vec_id", "embedding").collect()}

    def bands(v):
        out = set()
        for b in range(16):
            bv = sum((1 << j) for j in range(4) if v[b * 4 + j] > 0)
            out.add((b, bv))
        return out

    for r in rows:
        assert bands(vecs[r.query_id]) & bands(vecs[r.neighbor_id])


@pytest.mark.slow  # multi-10s (r13 fast-path trim)
def test_lsh_arrow_signature_matches_expression_path(emb):
    """The Arrow-batched signature (plan-lean path for BERT-scale dims)
    must produce the identical result set as the inlined-literal
    expression path — same hyperplanes, same band packing."""
    q = emb.filter(F.col("vec_id") < 3)
    expr_rows = {
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in similarity.lsh_topk(
            emb, q, "embedding", "vec_id", k=K, dim=64, arrow_threshold=10**9
        ).collect()
    }
    udf_rows = {
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in similarity.lsh_topk(
            emb, q, "embedding", "vec_id", k=K, dim=64, arrow_threshold=0
        ).collect()
    }
    assert udf_rows == expr_rows and len(udf_rows) > 0


def test_assign_to_centroids_is_argmax_cosine(emb):
    """Every row's assigned centroid must be the true cosine argmax
    (smallest id on ties) — checked against a numpy brute force."""
    import numpy as np

    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    got = {
        r.vec_id: (r.cluster, r.cos)
        for r in similarity.assign_to_centroids(emb, "embedding", "vec_id", cents).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    c = np.asarray([v for _, v in cents], dtype=np.float64)
    cn = np.linalg.norm(c, axis=1)
    assert len(got) == len(rows)
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        cos = (c @ v) / (cn * np.linalg.norm(v))
        best = int(np.argmax(cos))  # ties: argmax takes first == smallest id
        assert got[r.vec_id][0] == cents[best][0]
        assert abs(got[r.vec_id][1] - round(cos[best], 6)) <= 1e-6


def test_kmeans_clusters_partition_and_profile(emb):
    """k-means assignment must partition the corpus; the profile sizes
    must sum back to the corpus and cohesion must be a valid cosine."""
    assigned = similarity.kmeans_clusters(emb, "embedding", "vec_id", k=8)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("vec_id").distinct().count() == n
    prof = similarity.cluster_profile(assigned).collect()
    assert 1 < len(prof) <= 8
    assert sum(r.n_docs for r in prof) == n
    assert all(-1.0 <= r.mean_cos <= 1.0 for r in prof)
    # assignment optimality: each doc's cluster is its best trained centroid
    cents = similarity.train_centroids(emb, "embedding", "vec_id", 8)
    import numpy as np

    rows = {r.vec_id: r.cluster for r in assigned.collect()}
    for r in emb.select("vec_id", "embedding").limit(50).collect():
        v = np.asarray(r.embedding, dtype=np.float64)
        v = v / np.linalg.norm(v)
        assert rows[r.vec_id] == int(np.argmax(cents @ v))


def test_ivf_fixed_topk_probe_semantics(emb):
    """The deterministic IVF twin must honor its own contract: results
    come only from the query's nprobe best cells, each neighbor lives in
    its argmax cell, and per-query ranks are contiguous with descending
    cosine — all checked against a numpy recompute."""
    import numpy as np

    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    out = similarity.ivf_fixed_topk(
        emb, emb.filter(F.col("vec_id") < 5), "embedding", "vec_id",
        cents, k=5, nprobe=2,
    ).collect()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
            for r in emb.select("vec_id", "embedding").collect()}
    c = np.asarray([v for _, v in cents])
    cn = np.linalg.norm(c, axis=1)

    def cells(v, n):
        cos = (c @ v) / (cn * np.linalg.norm(v))
        order = sorted(range(len(cents)), key=lambda i: (-cos[i], cents[i][0]))
        return [cents[i][0] for i in order[:n]]

    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        coss = [r.cos for r in rows]
        assert coss == sorted(coss, reverse=True)
        probed = set(cells(vecs[qid], 2))
        for r in rows:
            assert cells(vecs[r.neighbor_id], 1)[0] in probed


def test_hard_negative_mining_excludes_same_label_and_margin(spark):
    """Hard negatives: same-label items never appear; max_cos drops
    near-duplicate false negatives; ranks are dense per anchor."""
    import math

    from dataux_spark.operators.similarity import hard_negative_mining

    rows = []
    for i in range(12):
        ang = i * 0.5
        rows.append((i, i % 3, [math.cos(ang), math.sin(ang), 0.5]))
    # a different-label near-duplicate of anchor 0 (cos ~1): a false
    # negative the margin must drop
    rows.append((100, 1, [1.0, 0.0001, 0.5]))
    df = spark.createDataFrame(
        [(i, l, [float(x) for x in v]) for i, l, v in rows],
        "vec_id: long, label: int, embedding: array<float>",
    )
    anchors = df.filter("vec_id = 0")
    out = hard_negative_mining(df, anchors, "embedding", "vec_id", "label", k=4)
    got = [(r.neighbor_id, r.neighbor_label, r.rank) for r in
           out.orderBy("rank").collect()]
    assert all(lbl != 0 for _, lbl, _ in got)
    assert [r for _, _, r in got] == [1, 2, 3, 4]
    assert got[0][0] == 100  # the near-dup ranks first without a margin

    margin = hard_negative_mining(
        df, anchors, "embedding", "vec_id", "label", k=4, max_cos=0.99
    )
    assert all(r.neighbor_id != 100 for r in margin.collect())


def test_hard_negatives_equal_python_model(spark):
    """Brute-force model equality for hard-negative mining on a random-ish
    fixed vector set: label exclusion, rounded-cos ranking, id tie-breaks."""
    import math

    from dataux_spark.operators.similarity import hard_negative_mining

    rows = []
    for i in range(30):
        ang, lift = (i * 37) % 17 * 0.37, ((i * 13) % 7) * 0.1
        rows.append((i, i % 3, [math.cos(ang), math.sin(ang), lift]))
    df = spark.createDataFrame(
        [(i, l, [float(x) for x in v]) for i, l, v in rows],
        "vec_id: long, label: int, embedding: array<float>",
    )
    stored = {r.vec_id: (r.label, list(r.embedding))
              for r in df.collect()}  # float32-stored values

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    anchors = df.filter("vec_id < 3")
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in hard_negative_mining(df, anchors, "embedding", "vec_id",
                                         "label", k=4).collect()}
    for q in range(3):
        ql, qv = stored[q]
        cands = sorted(
            ((-cos(v, qv), i) for i, (l, v) in stored.items()
             if i != q and l != ql)
        )[:4]
        for rank, (_, nid) in enumerate(cands, 1):
            assert got[(q, rank)] == nid, (q, rank)


def test_quantized_topk_recall_and_lattice(emb, spark):
    """int8-quantized cosine top-k: (a) high overlap with the exact
    float baseline (quantization error only — no candidate pruning);
    (b) the quantized values really live on the int8 lattice and the
    scale inverts them to ~the original vector; (c) zero vectors are
    safe."""
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = _topk_map(similarity.brute_force_topk(emb, q, "embedding", "vec_id", k=K))
    quant = _topk_map(similarity.quantized_topk(emb, q, "embedding", "vec_id", k=K))
    overlap = sum(len(exact[k_] & quant[k_]) for k_ in exact) / (len(exact) * K)
    assert overlap >= 0.9, overlap

    qz = similarity.quantize_vectors(emb, "embedding", "vec_id", "vid").collect()
    import math
    for r in qz[:50]:
        assert all(-127 <= v <= 127 for v in r.qv)
        assert max(abs(v) for v in r.qv) == 127  # scale saturates the lattice
        assert math.isfinite(r.qscale) and r.qscale > 0

    # zero vector: quantizes to zeros, cosine guard keeps scores finite
    z = spark.createDataFrame([(99991, [0.0] * 8), (99992, [1.0] * 8)],
                              "vec_id: long, embedding: array<double>")
    rz = similarity.quantize_vectors(z, "embedding", "vec_id", "vid").collect()
    zq = {r.vid: r.qv for r in rz}
    assert all(v == 0 for v in zq[99991])
    out = similarity.quantized_topk(z, z.filter("vec_id = 99991"),
                                    "embedding", "vec_id", k=1).collect()
    assert len(out) == 1 and math.isfinite(out[0].cos)


def test_quantized_topk_arrow_kernel_bit_identical(emb, spark):
    """The corpus-side Arrow matmul kernel (impl='arrow', the size-gated
    scale path) must be BIT-identical to the JVM expression fold
    (impl='jvm') — same integer lattice, same IEEE float64 norm/division,
    round+rank shared in the JVM. Covers the normal corpus plus the
    degenerate shapes whose NULL semantics the kernel reproduces:
    ragged dims (zip_with NULL-pads → cos NULL), NULL vectors, NULL
    elements (norm NULL), zero-vector plateaus bigger than k, duplicate
    cosines at the rounding boundary, and near-zero norms."""
    q = emb.filter(F.col("vec_id") < N_QUERIES)

    def canon(df):
        return sorted(map(tuple, df.collect()))

    a = canon(similarity.quantized_topk(emb, q, "embedding", "vec_id", k=K, impl="jvm"))
    b = canon(similarity.quantized_topk(emb, q, "embedding", "vec_id", k=K, impl="arrow"))
    assert a == b

    rows = [
        (0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [-1.0, -2.0, -3.0]),
        (3, [0.0, 0.0, 0.0]), (4, [0.0, 0.0, 0.0]),
        (5, [1.0, 2.0]), (6, None), (7, [1.0, None, 3.0]),
        (8, [2.0, 4.0, 6.0]), (9, [3.0, 6.0, 9.0]), (10, [1e-13, 0.0, 0.0]),
        (None, [1.0, 1.0, 1.0]),  # NULL id: joins nothing on either side
    ]
    edge = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = edge.filter(F.col("vec_id").isin(0, 3, 5, 6) | F.col("vec_id").isNull())
    a = canon(similarity.quantized_topk(edge, qs, "embedding", "vec_id", k=3, impl="jvm"))
    b = canon(similarity.quantized_topk(edge, qs, "embedding", "vec_id", k=3, impl="arrow"))
    assert a == b

    # auto gate: a sub-MB corpus plan must choose the JVM fold (level 1),
    # and the byte bar itself is the documented constant
    assert similarity._plan_size_bytes(emb) < similarity._QUANT_ARROW_MIN_BYTES


@pytest.mark.slow  # ~1 min: 60k-vector corpus, exercises many Arrow batches
def test_quantized_arrow_kernel_multibatch_identity(spark):
    """At 60k corpus vectors the kernel sees many 10k-row Arrow batches
    across many partitions, so the per-BATCH margin top-k must merge
    exactly through the JVM window — the property the single-batch edge
    test cannot reach. Deterministic hash-derived vectors, 300k pairs."""
    from pyspark.sql import functions as F

    corpus = spark.range(60_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j -> "
            "cast(pmod(xxhash64(id * 64 + j), 2000) - 1000 as double) / 250.0)"
        ).alias("embedding"),
    )
    q = corpus.filter(F.col("vec_id") < 5).limit(5)
    a = sorted(map(tuple, similarity.quantized_topk(
        corpus, q, "embedding", "vec_id", k=5, impl="jvm").collect()))
    b = sorted(map(tuple, similarity.quantized_topk(
        corpus, q, "embedding", "vec_id", k=5, impl="arrow").collect()))
    assert a == b and len(a) == 25


def test_pq_encode_seed_rows_round_trip(emb, spark):
    # a corpus row that IS a seed encodes to its own code in every
    # subspace (distance 0 to itself)
    seeds = [3, 17, 42, 99]
    cbs = similarity.pq_codebooks_from_seeds(emb, "embedding", "vec_id", seeds, 4)
    assert len(cbs) == 4 and all(len(cb) == 4 and len(cb[0]) == 16 for cb in cbs)
    codes = {
        r.vid: list(r.pq_codes)
        for r in similarity.pq_encode(
            emb.filter(F.col("vec_id").isin(seeds)), "embedding", "vec_id", "vid", cbs
        ).collect()
    }
    for c, s in enumerate(seeds):
        assert codes[s] == [c, c, c, c], (s, codes[s])


def test_pq_encode_tie_breaks_to_smaller_code(spark):
    # two identical codebook entries: the smaller code must win
    cbs = [[[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]]
    df = spark.createDataFrame([(1, [1.0, 0.05])], "vec_id: long, embedding: array<double>")
    r = similarity.pq_encode(df, "embedding", "vec_id", "vid", cbs).collect()[0]
    assert list(r.pq_codes) == [0]


def test_pq_adc_exact_on_reconstructable_vectors(spark):
    # corpus vectors composed EXACTLY of codebook entries: ADC score ==
    # the true dot product (the approximation error is exactly the
    # reconstruction error, zero here)
    cbs = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[2.0, 0.0], [0.0, 2.0]],
    ]
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0, 2.0, 0.0]), (11, [0.0, 1.0, 0.0, 2.0])],
        "vec_id: long, embedding: array<double>",
    )
    queries = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0])], "vec_id: long, embedding: array<double>"
    )
    out = {
        r.neighbor_id: r.adc_score
        for r in similarity.pq_adc_topk(
            corpus, queries, "embedding", "vec_id", cbs, k=2
        ).collect()
    }
    assert out[10] == 1.0 * 1 + 3.0 * 2  # q . [1,0,2,0]
    assert out[11] == 2.0 * 1 + 4.0 * 2  # q . [0,1,0,2]


def test_pq_adc_ranks_against_true_dot(emb):
    # with a seed-derived codebook the ADC ordering should broadly agree
    # with the exact dot ordering: the true nearest neighbor set and the
    # ADC top set must overlap (loose bound - 4x4 codebooks are coarse)
    seeds = [3, 17, 42, 99]
    cbs = similarity.pq_codebooks_from_seeds(emb, "embedding", "vec_id", seeds, 4)
    q = emb.filter(F.col("vec_id") < 5)
    adc = _topk_map(similarity.pq_adc_topk(emb, q, "embedding", "vec_id", cbs, k=25))
    exact = _topk_map(similarity.brute_force_topk(emb, q, "embedding", "vec_id", k=25))
    overlap = sum(len(exact[k] & adc[k]) for k in exact) / (len(exact) * 25)
    assert overlap > 0.1, overlap


def test_pq_encode_zero_shuffle_plan(emb):
    seeds = [3, 17, 42, 99]
    cbs = similarity.pq_codebooks_from_seeds(emb, "embedding", "vec_id", seeds, 4)
    plan = (
        similarity.pq_encode(emb, "embedding", "vec_id", "vid", cbs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pq_missing_seed_raises(emb):
    with pytest.raises(ValueError, match="seed ids not found"):
        similarity.pq_codebooks_from_seeds(emb, "embedding", "vec_id", [3, 10**9], 4)


def test_incremental_index_equals_one_shot(emb, spark, tmp_path):
    """build(half) + update(other half) must probe identically to the
    in-memory one-shot ivf_fixed_topk over the full corpus: the frozen
    quantizer means old rows never move and new rows use the same
    scorer, so the grown index IS the full index."""
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    root = str(tmp_path / "ivf")
    similarity.build_ivf_index_fixed(
        emb.filter(F.col("vec_id") % 2 == 0), "embedding", "vec_id", root, cents
    )
    similarity.update_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 1), "embedding", "vec_id", root
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    got = sorted(
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in similarity.ivf_index_fixed_topk(
            spark, root, q, "embedding", "vec_id", k=K, nprobe=2
        ).collect()
    )
    want = sorted(
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in similarity.ivf_fixed_topk(
            emb, q, "embedding", "vec_id", cents, k=K, nprobe=2
        ).collect()
    )
    assert got == want and len(got) == N_QUERIES * K


def test_incremental_update_appends_only(emb, spark, tmp_path):
    """O(batch) maintenance: the update writes NEW part-files into the
    affected cell directories and never rewrites or deletes an existing
    file — maintenance cost is independent of index size."""
    import os

    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    root = str(tmp_path / "ivf2")
    similarity.build_ivf_index_fixed(
        emb.filter(F.col("vec_id") % 2 == 0), "embedding", "vec_id", root, cents
    )

    def snap():
        out = {}
        for dirp, _, files in os.walk(f"{root}/cells"):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(dirp, f)
                    out[p] = os.stat(p).st_mtime_ns
        return out

    before = snap()
    similarity.update_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 1), "embedding", "vec_id", root
    )
    after = snap()
    assert set(before) <= set(after)            # nothing deleted
    assert all(after[p] == before[p] for p in before)  # nothing rewritten
    assert len(after) > len(before)             # batch landed as new files


def test_knn_join_matches_broadcast_twin_and_plan_has_no_forced_broadcast(emb):
    """knn_join with the corpus as BOTH sides must agree with the
    broadcast-query twin on any left subset (same cells, same rerank), and
    its plan must not carry a forced broadcast of either corpus side."""
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 16).select("vec_id", "embedding").collect()
    ]
    full = similarity.knn_join(emb, emb, "embedding", "vec_id", cents, k=3, nprobe=2)
    # restrict the all-pairs result to a query subset: must equal the
    # broadcast-variant run on that subset
    sub = emb.filter(F.col("vec_id") < 8)
    twin = similarity.ivf_fixed_topk(emb, sub, "embedding", "vec_id", cents, k=3, nprobe=2)
    got = {
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in full.filter(F.col("query_id") < 8).collect()
    }
    want = {(r.query_id, r.neighbor_id, r.cos, r.rank) for r in twin.collect()}
    assert got == want and len(want) > 0
    # no ResolvedHint in the analyzed plan of the no-broadcast variant
    analyzed = full._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed


def test_random_projection_numpy_replay_and_jl_preservation(emb):
    """Projection must equal the numpy replay of the same seeded matrix
    exactly (6dp), and must exhibit the JL guarantees it exists for:
    squared norms preserved in expectation (mean ratio ≈ 1) and
    high-similarity pair cosines preserved within the k=16 distortion
    bound. (Top-5 recall over the near-isotropic synthetic corpus is NOT
    asserted — neighbor margins there are noise-level by construction,
    which no 16-dim sketch can rank; JL promises distance preservation,
    not rank preservation of ~0-margin ties.) Deterministic end to end."""
    import numpy as np

    out = similarity.random_projection(
        emb, "embedding", "vec_id", in_dim=64, out_dim=16, seed=42
    )
    got = {r.vec_id: list(r.proj) for r in out.collect()}
    mat = np.asarray(similarity.rademacher_matrix(64, 16, seed=42))
    src = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()}
    for vid, v in list(src.items())[:50]:
        want = [round(float(x), 6) for x in (mat @ v) / 4.0]
        assert got[vid] == want
    # E[||Rv||^2] = ||v||^2: corpus-mean ratio tight around 1
    ratios = [
        float(np.dot(p := mat @ v / 4.0, p) / np.dot(v, v)) for v in src.values()
    ]
    assert 0.9 <= float(np.mean(ratios)) <= 1.1
    # planted high-similarity pairs (cos_full ≈ 0.9) stay close after
    # projection: measured max error 0.104 at this seed, bound 0.25
    for vid, v in list(src.items())[:50]:
        w = 0.9 * v + 0.45 * v[::-1]
        cf = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
        pv, pw = mat @ v / 4.0, mat @ w / 4.0
        cp = float(pv @ pw / (np.linalg.norm(pv) * np.linalg.norm(pw)))
        assert abs(cp - cf) < 0.25, (vid, cf, cp)


def test_knn_join_broadcast_assignment_equals_literal_path(spark):
    """The large-quantizer broadcast-join cell assignment must be
    bit-identical to the literal-centroid projection (same zip_with dot,
    same precomputed centroid norms, same max-cos/min-cid tie-break) —
    pinned by forcing the join path (literal_max=0) against the default
    on the same quantizer."""
    from dataux_spark.operators.similarity import knn_join
    from dataux_spark.queries import read_table

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [
        (r.vec_id, list(r.embedding))
        for r in emb.filter(F.col("vec_id") < 23).select("vec_id", "embedding").collect()
    ]
    lit = knn_join(emb, emb, "embedding", "vec_id", cents, k=3, nprobe=2)
    jn = knn_join(emb, emb, "embedding", "vec_id", cents, k=3, nprobe=2,
                  literal_max=0)
    a = sorted(map(tuple, lit.collect()))
    b = sorted(map(tuple, jn.collect()))
    assert a == b and len(a) > 0
    # the ann_knn_join plan audit must accept BOTH paths: the literal
    # path plans zero BNLJ, the join path's only BNLJ is the bounded
    # broadcast centroid table (cvec) — ADVICE r8 flagged the unscoped
    # ban false-failing exactly when the scale path activates
    from tools.explain_audit import CHECKS, plan_of

    name, pred = CHECKS["ann_knn_join"][0]
    assert pred(plan_of(lit)), f"literal path fails audit: {name}"
    assert pred(plan_of(jn)), f"large-quantizer path fails audit: {name}"
