"""Dump `.explain("formatted")` for headline queries to plans/<tag>/.

Usage: python3 tools/dump_plans.py <tag-dir> <suffix> [query ...]
e.g.   python3 tools/dump_plans.py plans/r13 before text_dsir_weights ...
(default: every bench.HEADLINE entry). Streaming-sink entries (their
returned frame is just a memory-table scan) are dumped as-is — the
interesting plan is the streaming one, which explain cannot show after
the fact; their file still pins the sink read.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from dataux_spark import get_spark
    from dataux_spark import queries as Q

    spark = get_spark("dump_plans")
    registry = Q.queries()
    for name in names:
        try:
            if name in Q.BENCH_PHASES:
                ph = Q.BENCH_PHASES[name]
                df = ph["probe"](spark, ph["build"](spark, sf_dir))
            else:
                df = registry[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {type(e).__name__}: {e}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{suffix}.txt", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
