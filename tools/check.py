"""Local correctness harness — mimics the driver's DuckDB-oracle gate.

Runs every __spark_entry__.queries() entry at the given sf_dir, runs the
matching oracle_sql() in DuckDB over the same parquet (tables registered as
views), and compares: row count, column-name set, and order-insensitive
cell values (exact; floats must match after the query's own rounding).

Usage: python3 tools/check.py [--vanilla] [--types] [sf_dir] [query ...]

--vanilla: use a bare SparkSession (no dataux_spark.get_spark configs) —
simulates the external driver, which builds its own session; catches
queries that accidentally depend on our session configuration.

--types: column-TYPE audit instead of value comparison. The local value
comparator normalizes cells to strings, but the driver's hash is typed —
a DuckDB HUGEINT (what DuckDB types any sum over an integer column as)
against Spark's BIGINT matches on rows, schema, and stringified values
yet still hash-mismatches driver-side (CORRECTNESS_r06's
compaction_roundtrip). This mode runs `DESCRIBE <oracle>` in DuckDB,
takes the Spark query's schema, maps both into a common spelling, and
flags every column where the two engines' types disagree, making that
whole mismatch class structurally impossible.

NOTE on scale: the driver gate runs at sf0.01. Since r12 the full
registry sweep (every entry — the count grows each round; see
queries._REGISTRY for the current total) passes at sf0.1 too, with NO
skips: the eight near-dup
oracles that used to be exact all-pairs joins (quadratic — ~10 min each
in DuckDB at sf0.1: dedup_minhash_lsh, dedup_ngram_jaccard,
dedup_clusters, training_prep_pipeline, dedup_containment_pairs,
dedup_prefix_jaccard, dedup_source_matrix, dedup_savings_report) now
replay the prefix-filter candidate scheme + exact verify in SQL
(queries._prefix_candidate_pairs_ctes / _containment_candidate_pairs_ctes
— equal to the all-pairs answer by the prefix-filtering theorem, at
candidate-linear cost: each runs in seconds at sf0.1).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


# Map each engine's type spelling into a shared vocabulary so the audit
# compares semantics, not surface syntax. Unmapped spellings pass through
# lowercased — a disagreement between two pass-throughs still flags.
_DUCK_TYPE = {
    "tinyint": "tinyint", "smallint": "smallint", "integer": "int",
    "bigint": "bigint", "hugeint": "hugeint",  # no Spark equivalent
    "utinyint": "smallint", "usmallint": "int", "uinteger": "bigint",
    "ubigint": "hugeint",
    "float": "float", "double": "double", "varchar": "string",
    "date": "date", "timestamp": "timestamp", "boolean": "boolean",
    "blob": "binary",
}


def _norm_duck_type(t: str) -> str:
    t = t.strip().lower()
    if t.endswith("[]"):
        return f"array<{_norm_duck_type(t[:-2])}>"
    if t.startswith("decimal"):
        return t.replace(" ", "")
    return _DUCK_TYPE.get(t, t)


def _norm_spark_type(t: str) -> str:
    t = t.strip().lower()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_norm_spark_type(t[6:-1])}>"
    # DuckDB's TIMESTAMP is zone-less — semantically Spark's timestamp_ntz.
    # Parquet-written ntz columns hash identically driver-side (q3/q18/
    # order_multi_offset green across rounds 1-6), so the audit treats the
    # two spellings as one type.
    if t == "timestamp_ntz":
        return "timestamp"
    return t


def type_audit(name, sdf, con, osql):
    """Return per-column type disagreements between Spark and DuckDB."""
    duck = {
        r[0]: _norm_duck_type(r[1])
        for r in con.execute(f"DESCRIBE {osql}").fetchall()
    }
    spark_t = {f.name: _norm_spark_type(f.dataType.simpleString())
               for f in sdf.schema.fields}
    diffs = []
    for col in sorted(set(duck) | set(spark_t)):
        d, s = duck.get(col, "<absent>"), spark_t.get(col, "<absent>")
        if d != s:
            diffs.append(f"{col}: spark={s} oracle={d}")
    return diffs


def compare(name, sdf, con, osql):
    cols = sdf.columns
    t0 = time.time()
    srows = [tuple(r) for r in sdf.collect()]
    spark_s = time.time() - t0
    res = con.execute(osql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    problems = []
    if sorted(cols) != sorted(ocols):
        problems.append(f"schema: spark={sorted(cols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
    if not problems:
        a, b = normalize(srows, cols), normalize(orows, ocols)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            problems.append(f"values differ; first diffs: {bad}")
    return problems, spark_s, len(srows)


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    types_mode = "--types" in args
    if types_mode:
        args.remove("--types")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    else:
        from dataux_spark import get_spark

        spark = get_spark("check")
    con = duck_connect(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    failed = []
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            spark.catalog.clearCache()  # isolate queries (minhash persists etc.)
            sdf = fn(spark, sf_dir)
            if types_mode:
                if name in oracles:
                    diffs = type_audit(name, sdf, con, oracles[name])
                    status = "OK " if not diffs else "TYPE"
                    print(f"{status} {name:32s} {diffs or ''}")
                    if diffs:
                        failed.append(name)
                continue
            if name in oracles:
                problems, secs, n = compare(name, sdf, con, oracles[name])
                status = "OK " if not problems else "FAIL"
                print(f"{status} {name:32s} rows={n:<7d} {secs:5.2f}s {problems or ''}")
                if problems:
                    failed.append(name)
            else:
                n = sdf.count()
                print(f"ROWS {name:32s} rows={n:<7d} (no oracle)")
        except Exception as e:
            print(f"ERR  {name:32s} {type(e).__name__}: {str(e).splitlines()[0][:100]}")
            failed.append(name)
    print(f"\n{ran - len(failed)}/{ran} passing"
          + (f" (of {len(qs)} registered)" if ran != len(qs) else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
