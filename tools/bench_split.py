"""Per-query wall decomposition for the headline bench set (r13 §1).

bench.py times `fn(spark, sf_dir).count()` — which includes (a) Python
DataFrame construction, (b) Catalyst analysis+optimization+physical
planning, and (c) execution. Optimization targets differ wildly between
those buckets, so this tool splits them per headline query:

  construct_ms — fn(spark, sf_dir) wall (Python-side plan building; any
                 EAGER work the entry does — censuses, store builds —
                 lands here too)
  plan_ms      — time for the JVM to produce the executed plan
                 (`df._jdf.queryExecution().executedPlan()`), measured on
                 a FRESH frame so nothing is pre-cached
  exec_ms      — .count() wall on a third fresh frame, i.e. the same
                 number bench.py reports (includes its own plan cost
                 again: exec_ms ≈ bench per-query median)

Medians over --runs (default 3). Output: one JSON line per query to
stdout; sorted summary at the end.

Usage: python3 tools/bench_split.py [query ...]   (default: all HEADLINE)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (HEADLINE list)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))

    from dataux_spark import get_spark
    from dataux_spark import queries as Q

    spark = get_spark("bench_split")
    registry = Q.queries()
    names = sys.argv[1:] or bench.HEADLINE

    Q.read_table(spark, sf_dir, "lineitem").count()

    rows = []
    for name in names:
        fn = registry[name]
        if name in Q.BENCH_PHASES:
            ph = Q.BENCH_PHASES[name]
            ctx = ph["build"](spark, sf_dir)
            fn = lambda s, d, _p=ph, _c=ctx: _p["probe"](s, _c)  # noqa: E731
        try:
            fn(spark, sf_dir).count()  # warm-up
            con, pln, exe = [], [], []
            for _ in range(runs):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                fn(spark, sf_dir).count()
                t3 = time.perf_counter()
                con.append((t1 - t0) * 1e3)
                pln.append((t2 - t1) * 1e3)
                exe.append((t3 - t2) * 1e3)
            row = {
                "query": name,
                "construct_ms": round(statistics.median(con), 1),
                "plan_ms": round(statistics.median(pln), 1),
                "exec_ms": round(statistics.median(exe), 1),
            }
        except Exception as e:  # noqa: BLE001
            row = {"query": name, "error": f"{type(e).__name__}: {e}"[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        spark.catalog.clearCache()

    ok = [r for r in rows if "error" not in r]
    ok.sort(key=lambda r: -(r["construct_ms"] + r["plan_ms"] + r["exec_ms"]))
    print("\n== sorted by total (construct+plan+exec ms) ==")
    for r in ok:
        tot = r["construct_ms"] + r["plan_ms"] + r["exec_ms"]
        print(
            f"{r['query']:34s} total {tot:8.1f}  construct {r['construct_ms']:7.1f}"
            f"  plan {r['plan_ms']:7.1f}  exec {r['exec_ms']:8.1f}"
        )
    print(
        "TOTALS construct %.1f plan %.1f exec %.1f"
        % (
            sum(r["construct_ms"] for r in ok),
            sum(r["plan_ms"] for r in ok),
            sum(r["exec_ms"] for r in ok),
        )
    )


if __name__ == "__main__":
    main()
