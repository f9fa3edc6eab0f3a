"""Small shared session helpers.

The session-scoped metadata-cache pattern appears in multiple places
(read_table, stream harness); it lives here once. So does the
driver-literal VALUES frame (store-meta writers, r14).
"""

from __future__ import annotations

import math


def _sql_double(x: float) -> str:
    """One double as a Spark SQL expression that parses back to the exact
    same IEEE value: repr() is the shortest round-tripping decimal, and
    DECIMAL -> DOUBLE casting yields the nearest double = the original.
    NaN/Infinity have no decimal spelling, so those go through the string
    cast Spark defines for them."""
    x = float(x)
    if math.isnan(x):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(x):
        return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
    return f"CAST({x!r} AS DOUBLE)"


def values_frame(spark, rows: list[tuple], schema: list[tuple[str, str]]):
    """Tiny driver-literal frame as a constant-folded VALUES SELECT (a JVM
    LocalRelation) instead of spark.createDataFrame: a local-list frame is
    Python-RDD-backed, so any task that computes it pays one Python-worker
    round-trip PER PARENT PARTITION — a coalesce(1) parquet write of a
    ONE-ROW meta frame serialized ~32 of those and measured ~4 s flat
    (r14 store-build profile; jstack pinned the write task inside
    PythonRunner reads), while the identical rows as a VALUES literal
    write in ~0.15 s with no Python at execution. Same rows, same types.

    schema: [(col_name, sql_type)] with sql_type one of
    'double' | 'int' | 'bigint' | 'string' | 'array<double>'.
    rows must be non-empty (VALUES has no zero-row spelling)."""
    assert rows, "values_frame needs at least one row"

    def cell(v, t: str) -> str:
        if t == "double":
            return _sql_double(v)
        if t in ("int", "bigint"):
            return f"CAST({int(v)} AS {t.upper()})"
        if t == "string":
            # escaping assumes the DEFAULT parser: with
            # spark.sql.parser.escapedStringLiterals=true, \' stops
            # escaping — callers binding untrusted strings under that
            # conf should use parameterized spark.sql(..., args=...)
            # (the bm25/cms probe pattern) instead
            s = str(v).replace("\\", "\\\\").replace("'", "\\'")
            return f"'{s}'"
        if t == "array<double>":
            return f"ARRAY({', '.join(_sql_double(x) for x in v)})"
        raise ValueError(f"unsupported values_frame type: {t}")

    vals = ", ".join(
        "(" + ", ".join(cell(v, t) for v, (_, t) in zip(r, schema)) + ")"
        for r in rows
    )
    cols = ", ".join(name for name, _ in schema)
    return spark.sql(f"SELECT {cols} FROM (VALUES {vals}) AS t({cols})")


def session_cache(spark, attr: str) -> dict:
    """A dict cached as an attribute on the SparkSession object — the
    metadata-catalog memo pattern (read_table / stream_events): survives
    exactly as long as the session object, so cross-session isolation
    (e.g. check.py --vanilla's bare session) is automatic and nothing
    outlives the engine that created it."""
    cache = getattr(spark, attr, None)
    if cache is None:
        cache = {}
        setattr(spark, attr, cache)
    return cache
