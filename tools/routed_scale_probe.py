"""Third-scale-decade probe for the adaptive candidate routers (r11,
VERDICT r10 item 5): measure the census decision and the routed pair
stage's wall time at three corpus sizes — sf0.01 (500 docs), sf0.1
(5,000), and a vocabulary-pinned 10x repeat of sf0.1 (50,000 docs, the
keygrowth harness's _repeat_docs construction, so the third point is a
full extra decade of SATURATED data: every doc gains 9 exact twins and
the organic near-dup structure replicates 100x).

Records, per routed family (Jaccard router + containment router):
  n_docs, census est-candidates/doc, chosen route, pair-stage wall (s),
  pair count. The wall ratios across the three points are the growth
  curve SCALE.md's r11 section cites; the decision column shows where
  each census flips. Run:  python tools/routed_scale_probe.py
Extra repeat factors extend the curve (each adds an "sf0.1 xK" point):
  python tools/routed_scale_probe.py 30 100
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import repeat_docs  # noqa: E402


def main() -> None:
    from dataux_spark import get_spark
    from dataux_spark.operators import dedup
    from dataux_spark.queries import read_table

    spark = get_spark("routed-scale-probe")
    corpora = [
        ("sf0.01", read_table(spark, "/root/testdata/sf0.01", "documents")),
        ("sf0.1", read_table(spark, "/root/testdata/sf0.1", "documents")),
        ("sf0.1 x10", repeat_docs(
            read_table(spark, "/root/testdata/sf0.1", "documents"), 10
        )),
    ]
    for arg in sys.argv[1:]:
        k = int(arg)
        corpora.append((f"sf0.1 x{k}", repeat_docs(
            read_table(spark, "/root/testdata/sf0.1", "documents"), k
        )))
    print(f"{'corpus':10s} {'docs':>7s} {'family':12s} {'est/doc':>9s} "
          f"{'route':8s} {'wall_s':>8s} {'pairs':>9s}")
    for label, docs in corpora:
        docs = docs.persist()
        n = docs.count()
        g = dedup.gram_sets(docs, "text", "doc_id", 3).persist()
        g.count()
        sets = g.withColumnRenamed("_grams", "_set")
        toks = sets.select("_id", F.explode("_set").alias("_tok"))

        # --- Jaccard router (dedup_prefix_jaccard family, t=0.5) ---
        _, _, est = dedup.prefix_candidate_census(dedup.prefix_tokens(sets, 0.5))
        t0 = time.perf_counter()
        pairs = dedup.adaptive_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5, grams=g
        ).count()
        wall = time.perf_counter() - t0
        route = "minhash" if est > dedup.SATURATION_CAND_PER_DOC * n else "prefix"
        print(f"{label:10s} {n:7d} {'jaccard':12s} {est / n:9.2f} "
              f"{route:8s} {wall:8.2f} {pairs:9d}")

        # --- containment router (dedup_containment_pairs family, t=0.8) ---
        _, _, cest = dedup.containment_candidate_census(
            dedup.prefix_tokens(sets, 0.8), toks
        )
        t0 = time.perf_counter()
        cpairs = dedup.adaptive_containment_pairs(
            docs, "text", "doc_id", threshold=0.8, grams=g
        ).count()
        cwall = time.perf_counter() - t0
        croute = "minhash" if cest > dedup.SATURATION_CAND_PER_DOC * n else "prefix"
        print(f"{label:10s} {n:7d} {'containment':12s} {cest / n:9.2f} "
              f"{croute:8s} {cwall:8.2f} {cpairs:9d}")
        g.unpersist()
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
