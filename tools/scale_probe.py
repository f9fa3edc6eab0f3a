"""Scaling probe: run the headline queries at two scale factors and report
the wall-time ratio against the 10× data ratio.

A query whose time grows ~linearly (ratio ≈ data ratio on the scan-bound
ones, much less on fixed-output aggregations) is evidence the plan has no
super-linear term (no cartesian blowup, no driver-side loop, no per-row
Python hot path). Run occasionally; paste the table into SCALE.md.

    python3 tools/scale_probe.py [sf_small] [sf_big] [query ...]

Extra args restrict the probe to the named registered queries (default:
the bench HEADLINE set).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # the same query set the driver benches


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or HEADLINE
    runs = int(os.environ.get("BENCH_RUNS", "3"))

    from dataux_spark import get_spark
    from dataux_spark import queries as Q

    spark = get_spark("scale_probe")
    registry = Q.queries()
    for d in (small, big):
        Q.read_table(spark, d, "lineitem").count()  # warm listings

    def run(name: str, sf_dir: str) -> float:
        fn = registry[name]
        fn(spark, sf_dir).count()  # warm
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        return statistics.median(times)

    print(f"{'query':34s} {'t(small)':>9s} {'t(big)':>9s} {'ratio':>6s}")
    ratios = []
    for name in names:
        ts, tb = run(name, small), run(name, big)
        r = tb / ts if ts > 0 else float("inf")
        ratios.append(r)
        print(f"{name:34s} {ts:9.3f} {tb:9.3f} {r:6.2f}")
    print(
        f"\n10x data -> median time ratio {statistics.median(ratios):.2f}x "
        f"(max {max(ratios):.2f}x); ratios well under 10 mean fixed costs "
        f"still dominate at this scale, none should exceed ~10 (linear)."
    )


if __name__ == "__main__":
    main()
