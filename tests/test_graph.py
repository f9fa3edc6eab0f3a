"""PageRank tests: hand-computed fixed points, dangling-mass handling,
mass conservation, and edge-multiset insensitivity."""

from pyspark.sql import functions as F

from dataux_spark.operators.graph import pagerank
import pytest


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_stays_uniform(spark):
    # a <-> b is already the stationary distribution
    got = _ranks(spark, [(1, 2), (2, 1)], iters=5)
    assert got == {1: 0.5, 2: 0.5}


def test_dangling_mass_redistributed_hand_computed(spark):
    # a -> b, b dangling. One iteration from (0.5, 0.5):
    #   dmass = 0.5; rank(a) = 0.15/2 + 0.85*(0 + 0.25) = 0.2875
    #   rank(b) = 0.075 + 0.85*(0.5 + 0.25) = 0.7125
    got = _ranks(spark, [(1, 2)], iters=1)
    assert got == {1: 0.2875, 2: 0.7125}


def test_mass_conserved_and_positive(spark):
    edges = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(0, 5), (2, 6)]
    got = _ranks(spark, edges, iters=4)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert all(r > 0 for r in got.values())


def test_parallel_edges_collapse(spark):
    once = _ranks(spark, [(1, 2), (2, 3), (3, 1)], iters=3)
    dup = _ranks(spark, [(1, 2), (1, 2), (2, 3), (3, 1), (3, 1)], iters=3)
    assert once == dup


def test_hub_outranks_leaves(spark):
    # everyone points at node 0; node 0 points at node 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    got = _ranks(spark, edges, iters=5)
    assert got[0] == max(got.values())
    assert got[1] > got[2]  # 0's single out-edge boosts 1 over other leaves


def test_checkpoint_variant_matches(spark):
    edges = [(i, (i * 5 + 2) % 9) for i in range(9)]
    plain = _ranks(spark, edges, iters=4)
    ck = _ranks(spark, edges, iters=4, checkpoint_every=2)
    assert plain == ck


def _tri(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    from dataux_spark.operators.graph import triangle_stats

    return {r.node: (r.degree, r.triangles, r.clustering_coeff)
            for r in triangle_stats(df).collect()}


def test_triangle_k4_hand_computed(spark):
    # K4: every node has degree 3, sits in 3 triangles, coeff 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _tri(spark, k4)
    assert got == {i: (3, 3, 1.0) for i in range(4)}


def test_triangle_pendant_and_open_wedge(spark):
    # triangle 0-1-2, pendant 3 off node 0, isolated wedge 4-5-6 (open)
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (4, 5), (5, 6)]
    got = _tri(spark, edges)
    assert got[0] == (3, 1, round(2 * 1 / (3 * 2), 9))
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (1, 0, 0.0)
    assert got[5] == (2, 0, 0.0)


def test_triangle_direction_loops_parallels_ignored(spark):
    # same undirected triangle spelled with reversals, dups, a self-loop
    messy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)]
    got = _tri(spark, messy)
    assert got == {1: (2, 1, 1.0), 2: (2, 1, 1.0), 3: (2, 1, 1.0)}


def _lpa(spark, edges, **kw):
    from dataux_spark.operators.graph import label_propagation

    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.label for r in label_propagation(df, **kw).collect()}


def test_lpa_two_cliques_with_bridge(spark):
    # two 4-cliques joined by one bridge edge: each clique collapses to
    # its min label; the bridge is outvoted by clique-internal neighbors
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    got = _lpa(spark, c1 + c2 + [(3, 10)], iters=4)
    assert all(got[n] == got[0] for n in range(4))
    assert all(got[n] == got[10] for n in range(10, 14))
    assert got[0] != got[10]


def test_lpa_deterministic_tie_breaks_to_min_label(spark):
    # a path 0-1-2 after one round: 1 sees {0, 2} equally — adopts 0
    got = _lpa(spark, [(0, 1), (1, 2)], iters=1)
    assert got[1] == 0


def test_lpa_checkpoint_variant_matches(spark):
    edges = [(i, (i * 5 + 2) % 9) for i in range(9)]
    assert _lpa(spark, edges, iters=4) == _lpa(spark, edges, iters=4,
                                               checkpoint_every=2)


def test_trustrank_flows_from_seeds_only(spark):
    from dataux_spark.operators.graph import trustrank

    # seed 0 links to 1; isolated pair 5-6 never receives trust
    edges = [(0, 1), (1, 2), (5, 6), (6, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.rank for r in trustrank(df, seeds=[0], iters=4).collect()}
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    assert got[5] == 0.0 and got[6] == 0.0  # unreachable from the seed
    assert abs(sum(got.values()) - 1.0) < 1e-6  # mass conserved


@pytest.mark.slow  # multi-10s property/soundness check — full suite only
def test_trustrank_spam_farm_cannot_self_trust(spark):
    from dataux_spark.operators.graph import pagerank, trustrank

    # a dense self-linking farm (10-13) vs a small trusted chain (0->1)
    farm = [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    edges = [(0, 1)] + farm
    df = spark.createDataFrame(edges, ["src", "dst"])
    pr = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    tr = {r.node: r.rank for r in trustrank(df, seeds=[0], iters=5).collect()}
    assert max(pr[n] for n in range(10, 14)) > pr[1]  # farm wins centrality
    assert all(tr[n] == 0.0 for n in range(10, 14))   # farm gets zero trust
    assert tr[1] > 0
