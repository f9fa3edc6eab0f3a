"""Link-graph operators — the web-graph quality signals crawl curation
pipelines compute next to content quality (PageRank-family centrality
feeds domain trust scores; degree stats feed spam heuristics). Beyond-
reference extension; sibling of operators/web.py's URL/domain hygiene.

pagerank here is the FIXED-ITERATION power method, not run-to-
convergence: a curation signal needs a deterministic, reproducible
ranking, and a fixed iteration count makes the whole computation a
finite dataflow any engine can replay exactly (the oracle unrolls the
same iterations as CTEs). Convergence at web scale is a tuning choice
(10-20 iterations is the classic operating point); the per-iteration
cost model is what matters:

  one shuffle per iteration — contributions group by dst — plus a
  broadcast of the 1-row dangling-mass aggregate; ranks are rounded to
  9dp each iteration so the trajectory (not just the fixed point) is
  engine-independent. The rank frame is node-sized (#distinct nodes),
  orders of magnitude smaller than the edge frame at web scale; edges
  are re-read per iteration from their (ideally cached/bucketed-on-src)
  frame, never mutated. For iteration counts beyond ~10, checkpoint the
  rank frame every few rounds (lineage growth — the connected-
  components lesson, dedup.py) — pagerank() takes checkpoint_every for
  exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Power-method PageRank over a directed edge list, `iters` rounds:

      rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + dangling/N)

    with dangling mass (rank parked on nodes without out-edges)
    redistributed uniformly — the standard stochastic-matrix fix, kept
    as a lazy 1-row cross-joined aggregate (no driver action). Parallel
    edges are collapsed and self-loops kept (a self-loop is a valid
    out-edge). All ranks round to 9dp per iteration; the invariant
    Σ rank ≈ 1 survives rounding to ~N·5e-10.

    Returns (node, rank double) for every node appearing as src or dst.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    n = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    ranks = nodes.join(F.broadcast(n)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), 9).alias("rank")
    )
    d = float(damping)
    for i in range(int(iters)):
        with_deg = ranks.join(outdeg, ranks.node == outdeg.src, "left").select(
            ranks.node, "rank", "outdeg"
        )
        dangling = with_deg.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), F.col("rank"))), F.lit(0.0)
            ).alias("dmass")
        )
        contrib = (
            e.join(with_deg.filter(F.col("outdeg").isNotNull()),
                   e.src == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("csum"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .join(F.broadcast(n))
            .join(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (1.0 - d) / F.col("n_nodes")
                    + d
                    * (
                        F.coalesce(F.col("csum"), F.lit(0.0))
                        + F.col("dmass") / F.col("n_nodes")
                    ),
                    9,
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    UNDIRECTED simple graph induced by the edge list (direction, parallel
    edges, and self-loops discarded) — the classic link-spam / community
    density signal next to pagerank above.

    Algorithm is compact-forward / degree-ordered counting (Latapy 2008;
    the same orientation trick as Schank & Wagner): orient every edge
    from its (degree, node)-smaller endpoint to the larger, so each
    triangle {x,y,z} with x ≺ y ≺ z is found EXACTLY once as the wedge
    (y,z) at x closed by the oriented edge y→z. The orientation is the
    whole scale story: out-degree under ≺ is bounded by O(sqrt(m)), so
    the wedge join emits O(m^1.5) rows worst-case instead of
    sum(deg^2) — a hub with a million neighbors contributes wedges only
    through its few higher-degree peers, never deg² pairs. Plan is
    three hash equi-joins on node keys plus one count groupBy; no
    cartesian stage, no driver-side graph.

    Everything is integer arithmetic until the final coefficient
    (rounded 9dp), so an oracle can replay it bit-for-bit.

    Returns (node, degree, triangles, clustering_coeff) for every node
    of the undirected graph; coefficient is 0.0 where degree < 2.
    """
    s, d = F.col(src_col), F.col(dst_col)
    e = (
        edges.select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    # Orient a—b from the (degree, node)-smaller endpoint to the larger;
    # carry the target's (degree, node) so the wedge join can order the
    # two out-neighbors without another degree lookup.
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
    ab = e.join(da, "a").join(db, "b")
    fwd = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = ab.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("degb")).otherwise(F.col("dega")).alias("degv"),
    )
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedges = e1.join(e2, F.col("e1.u") == F.col("e2.u")).filter(
        (F.col("e1.degv") < F.col("e2.degv"))
        | (
            (F.col("e1.degv") == F.col("e2.degv"))
            & (F.col("e1.v") < F.col("e2.v"))
        )
    )
    closing = o.select(F.col("u").alias("cu"), F.col("v").alias("cv"))
    tri = wedges.join(
        closing,
        (F.col("e1.v") == F.col("cu")) & (F.col("e2.v") == F.col("cv")),
    ).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    per_node = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1.0)),
                    9,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Community detection by SYNCHRONOUS deterministic label propagation
    (Raghavan et al. 2007, the sync variant) over the undirected simple
    graph: every node starts as its own label; each round it adopts the
    most frequent label among its neighbors, ties broken by SMALLEST
    label. Async LPA with random tie-breaks converges faster but is not
    reproducible; fixed-iteration sync with a total tie order makes the
    whole trajectory a finite dataflow an oracle can replay (the
    pagerank design argument above, applied to communities — crawl
    curation wants "this link farm is one community" to be the same
    answer on every run).

    Per round: one label-lookup join (edges x node-sized label frame),
    one (node, label) count groupBy, one per-node argmax window — all
    keyed on node ids, no cartesian stage; the label frame stays
    node-sized forever. Isolated nodes keep their own label. Lineage
    grows per round — checkpoint_every as in pagerank.

    Returns (node, label) — nodes sharing a label are one community."""
    s, d = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = und.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    from pyspark.sql import Window as W

    for i in range(int(iters)):
        nbr = e.join(
            labels.select(F.col("node").alias("v"), F.col("label").alias("lbl")),
            "v",
        )
        freq = nbr.groupBy(F.col("u").alias("node"), "lbl").agg(
            F.count("*").alias("c")
        )
        w = W.partitionBy("node").orderBy(F.col("c").desc(), F.col("lbl"))
        best = (
            freq.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("lbl").alias("_new"))
        )
        labels = labels.join(best, "node", "left").select(
            "node", F.coalesce(F.col("_new"), F.col("label")).alias("label")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels


def trustrank(
    edges: DataFrame,
    seeds: list,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 0,
) -> DataFrame:
    """TrustRank (Gyöngyi et al., VLDB'04) — personalized PageRank whose
    teleport mass lands ONLY on a trusted seed set instead of uniformly:
    trust flows outward from hand-vetted good domains, so a page's score
    measures its link-distance from known-good territory — the
    complement of pagerank's raw centrality (a spam farm can accumulate
    centrality by linking to itself; it cannot accumulate trust unless
    trusted pages link INTO it, which is the whole point).

      rank'(v) = (1-d)·s(v) + d · (Σ_{u→v} rank(u)/outdeg(u)
                                   + dangling · s(v))

    with s uniform over the seed set and zero elsewhere — dangling mass
    also re-teleports through s, keeping Σ rank = 1. Same fixed-
    iteration, 9dp-per-round determinism contract as pagerank above
    (the oracle unrolls the identical CTEs); the seed set rides as a
    broadcast literal frame, everything else is the same one
    contribution shuffle + two 1-row aggregates per round. Nodes
    unreachable from the seeds converge to 0 — that IS the signal.

    Returns (node, rank double) for every node of the graph."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    seed_vals = sorted(set(seeds))
    s_frac = 1.0 / len(seed_vals)
    seed_col = F.when(
        F.col("node").isin(seed_vals), F.lit(s_frac)
    ).otherwise(F.lit(0.0))
    ranks = nodes.select("node", F.round(seed_col, 9).alias("rank"))
    d = float(damping)
    for i in range(int(iters)):
        with_deg = ranks.join(outdeg, ranks.node == outdeg.src, "left").select(
            ranks.node, "rank", "outdeg"
        )
        dangling = with_deg.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), F.col("rank"))), F.lit(0.0)
            ).alias("dmass")
        )
        contrib = (
            e.join(with_deg.filter(F.col("outdeg").isNotNull()),
                   e.src == F.col("node"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("csum"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .join(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (1.0 - d) * seed_col
                    + d
                    * (
                        F.coalesce(F.col("csum"), F.lit(0.0))
                        + F.col("dmass") * seed_col
                    ),
                    9,
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
