"""Growth-curve probe for the adaptive candidate routers (r11, extended
r12): measure the census decision and the routed pair stage's wall time
at increasing corpus sizes — sf0.01 (500 docs), sf0.1 (5,000), and a
vocabulary-pinned 10x repeat of sf0.1 (50,000 docs, the keygrowth
harness's repeat_docs construction, so the third point is a full extra
decade of SATURATED data: every doc gains 9 exact twins and the organic
near-dup structure replicates 100x).

Records, per routed family (Jaccard router + containment router):
  n_docs, census est-candidates/doc, chosen route, pair-stage wall (s),
  pair count. The wall ratios across the points are the growth curve
SCALE.md cites; the decision column shows where each census flips. The
route is resolved by the LIVE deciders (choose_jaccard_route /
choose_containment_route — ADVICE r11: no inline re-derivation of the
threshold comparison that can drift from the routers) and passed into
the timed call, so the timed wall is the pair stage alone, not a second
census. Run:  python tools/routed_scale_probe.py
Extra repeat factors extend the curve (each adds an "sf0.1 xK" point):
  python tools/routed_scale_probe.py 30 100

Adversarial-clique mode (r12, VERDICT r11 item 2): the growth curve
above measures vocabulary saturation only — uniform posting growth, max
bucket ~50. A boilerplate CLIQUE (k identical docs planted into the x10
repeat) is the other failure axis: one band bucket of size k, whose
in-bucket expansion is k^2/2 pairs inside a single collect_list task.
  python tools/routed_scale_probe.py --clique 1000 2000 4000
times the routed Jaccard pair stage on each planted corpus twice —
max_bucket="auto" (the routed default, routed_max_bucket(n)) vs
max_bucket=None (the pre-r12 behavior) — so SCALE.md can show the
capped route's wall flat in clique size while the uncapped one grows
~k^2. The clique sits above the auto cap at every k probed (cap ~900 at
n~50k), so the capped run drops exactly the clique's buckets; organic
pairs are unaffected (pinned by tests/test_dedup.py's routed backstop
test and the hot-bucket hypothesis property).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import repeat_docs  # noqa: E402

BOILERPLATE = (
    "all rights reserved terms of service privacy policy cookie settings "
    "subscribe to our newsletter follow us on social media contact support"
)


def growth_curve(spark, extra_factors: list[int]) -> None:
    from dataux_spark.operators import dedup
    from dataux_spark.queries import read_table

    corpora = [
        ("sf0.01", read_table(spark, "/root/testdata/sf0.01", "documents")),
        ("sf0.1", read_table(spark, "/root/testdata/sf0.1", "documents")),
        ("sf0.1 x10", repeat_docs(
            read_table(spark, "/root/testdata/sf0.1", "documents"), 10
        )),
    ]
    for k in extra_factors:
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
        # est/doc printed from the same census function the router runs;
        # the ROUTE comes from the live decider and is passed into the
        # timed call (one decision, no duplicated threshold logic)
        _, _, est = dedup.prefix_candidate_census(dedup.prefix_tokens(sets, 0.5))
        route = dedup.choose_jaccard_route(
            docs, "text", "doc_id", threshold=0.5, grams=g
        )
        t0 = time.perf_counter()
        pairs = dedup.adaptive_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5, grams=g, route=route
        ).count()
        wall = time.perf_counter() - t0
        print(f"{label:10s} {n:7d} {'jaccard':12s} {est / n:9.2f} "
              f"{route:8s} {wall:8.2f} {pairs:9d}")

        # --- containment router (dedup_containment_pairs family, t=0.8) ---
        _, _, cest = dedup.containment_candidate_census(
            dedup.prefix_tokens(sets, 0.8), toks
        )
        croute = dedup.choose_containment_route(
            docs, "text", "doc_id", threshold=0.8, grams=g
        )
        t0 = time.perf_counter()
        cpairs = dedup.adaptive_containment_pairs(
            docs, "text", "doc_id", threshold=0.8, grams=g, route=croute
        ).count()
        cwall = time.perf_counter() - t0
        print(f"{label:10s} {n:7d} {'containment':12s} {cest / n:9.2f} "
              f"{croute:8s} {cwall:8.2f} {cpairs:9d}")
        g.unpersist()
        docs.unpersist()


# Above this clique size the uncapped (pre-r12) run is skipped: its wall
# and pair count grow ~k² (measured through k=4000; 49.7 s containment at
# k=2000 already), so a k=10,000 uncapped run would only re-demonstrate
# the quadratic the capped default exists to remove. The capped run and
# the recovered-pair fraction ARE measured at every k.
CLIQUE_UNCAPPED_MAX = 4000


def clique_curve(spark, clique_sizes: list[int]) -> None:
    from dataux_spark.operators import dedup
    from dataux_spark.queries import read_table

    base = repeat_docs(
        read_table(spark, "/root/testdata/sf0.1", "documents"), 10
    ).select("doc_id", "text")
    print(f"{'corpus':16s} {'docs':>7s} {'family':12s} {'cap':>6s} "
          f"{'wall_s':>8s} {'pairs':>12s} {'clq_rec':>8s}")
    for k in clique_sizes:
        clique = spark.range(k).select(
            (F.col("id") + 100_000_000).alias("doc_id"),
            F.lit(BOILERPLATE).alias("text"),
        )
        docs = base.unionByName(clique).persist()
        n = docs.count()
        g = dedup.gram_sets(docs, "text", "doc_id", 3).persist()
        g.count()
        for family, pair_fn, kw, clique_total in [
            ("jaccard", dedup.adaptive_jaccard_pairs, {"threshold": 0.5},
             k * (k - 1) // 2),
            ("containment", dedup.adaptive_containment_pairs,
             {"threshold": 0.8}, k * (k - 1)),
        ]:
            for cap in [dedup.routed_max_bucket(n), None]:
                if cap is None and k > CLIQUE_UNCAPPED_MAX:
                    print(f"{'x10+clique ' + str(k):16s} {n:7d} {family:12s} "
                          f"{'none':>6s} {'skip':>8s} {'~k^2':>12s} {'1.0':>8s}"
                          f"  (uncapped measured through k={CLIQUE_UNCAPPED_MAX})")
                    continue
                # recovered-pair fraction (VERDICT r12 item 6): of the
                # clique's own pairs, how many the route still returns —
                # the docstring claim "clique members collide on EVERY
                # band" predicts 0.0 under the cap (identical docs have
                # identical signatures, so every band bucket holds the
                # whole clique and is dropped); measured, not argued.
                # Both counters ride ONE aggregate on the lazy frame so
                # the timed region stays the pair stage itself — a
                # persist-then-two-counts form would bill the cache
                # write into the wall and break comparability with the
                # r12 tables (r13 review).
                t0 = time.perf_counter()
                row = pair_fn(
                    docs, "text", "doc_id", grams=g,
                    route="minhash", max_bucket=cap, **kw,
                ).agg(
                    F.count("*").alias("pairs"),
                    F.sum(
                        (
                            (F.col("id_a") >= 100_000_000)
                            & (F.col("id_b") >= 100_000_000)
                        ).cast("long")
                    ).alias("clq"),
                ).collect()[0]
                wall = time.perf_counter() - t0
                pairs, clq = row.pairs, row.clq or 0
                cap_str = str(cap) if cap is not None else "none"
                print(f"{'x10+clique ' + str(k):16s} {n:7d} {family:12s} "
                      f"{cap_str:>6s} {wall:8.2f} {pairs:12d} "
                      f"{clq / clique_total:8.4f}")
        g.unpersist()
        docs.unpersist()


def main() -> None:
    from dataux_spark import get_spark

    spark = get_spark("routed-scale-probe")
    args = sys.argv[1:]
    if args and args[0] == "--clique":
        clique_curve(spark, [int(a) for a in args[1:]] or [1000, 2000, 4000])
    else:
        growth_curve(spark, [int(a) for a in args])
    spark.stop()


if __name__ == "__main__":
    main()
