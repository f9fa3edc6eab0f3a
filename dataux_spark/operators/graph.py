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
