"""Whole-query passthrough source — the FULL pushdown tier.

The reference's BigQuery backend re-writes the entire SELECT in the target
dialect and runs it remotely (backends/bigquery/sql_to_bq.go:99-104, results
read back at resultreader.go:134-159); the dialect re-write is a quote-char
swap via expr.NewDialectWriter (backends/bigquery/resultreader.go:134).

Offline stand-in: DuckDB plays the remote engine. The engine offers a FULL
source the whole (already dialect-normalized) query text; the source either
executes it natively and returns the result, or declines — and the engine
falls back to the Spark plan over `load()`ed tables. That accept-or-polyfill
negotiation is the reference's core federation contract (`needsPolyFill`
flags); the polyfill-equivalence test asserts both paths return identical
rows.

Scale: FULL passthrough is precisely the tier where shipping the query beats
shipping the data — the remote engine scans its own 100 TB and returns an
aggregate. Results come back through Arrow on the driver, sized like query
results, not tables; a query whose *result* is table-sized should be run
against `load()` tables instead (the engine does this automatically when the
source declines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import PushdownTier, Source


class DuckDBPassthroughSource(Source):
    """A FULL-tier source backed by DuckDB over parquet files."""

    tier = PushdownTier.FULL
    default_limit = 5000  # BigQuery-style cap (sql_to_bq.go default)

    def __init__(self, name: str, table_paths: dict[str, str]):
        self.name = name
        self._paths = dict(table_paths)

    def tables(self) -> list[str]:
        return list(self._paths)

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        # The polyfill path: when passthrough declines, the engine plans the
        # query in Spark over these DataFrames.
        return spark.read.parquet(self._paths[table])

    def to_native_sql(self, sql: str) -> str:
        """Dialect writer parity (expr.NewDialectWriter('\\'', '"')):
        identifier quoting swaps from backtick to double-quote; the rest of
        the normalized SQL is ANSI enough for the target."""
        return sql.replace("`", '"')

    def execute_full(self, spark: SparkSession, sql: str) -> DataFrame | None:
        """Run the whole query natively; None = decline (engine polyfills)."""
        try:
            import duckdb

            con = duckdb.connect()
            for t, p in self._paths.items():
                con.execute(
                    f'CREATE VIEW "{t}" AS SELECT * FROM read_parquet(?)', [p]
                )
            result = con.execute(self.to_native_sql(sql)).fetch_arrow_table()
        except Exception:
            return None  # unsupported syntax/function → polyfill in Spark
        return spark.createDataFrame(result.to_pandas())
