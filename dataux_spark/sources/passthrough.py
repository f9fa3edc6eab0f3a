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


def _arrow_to_spark(spark: SparkSession, tbl) -> DataFrame:
    """Arrow table → DataFrame WITHOUT the pandas hop: pandas coerces
    nullable integer columns to float64 (schema drift vs native results)
    and cannot infer a schema from an empty frame. Spark 4 accepts Arrow
    tables directly; fall back to pandas only on older runtimes and only
    for non-empty results."""
    try:
        return spark.createDataFrame(tbl)
    except Exception:
        return spark.createDataFrame(tbl.to_pandas())


class DuckDBPassthroughSource(Source):
    """A FULL-tier source backed by DuckDB — over parquet files
    (query-only), or over a persistent .duckdb database file (`db_path`),
    which also accepts whole-statement DML the way the reference's
    BigQuery backend executes writes remotely (streaming insert
    sql_to_bq.go:178-304, DML shipped in the target dialect)."""

    tier = PushdownTier.FULL
    default_limit = 5000  # BigQuery-style cap (sql_to_bq.go default)

    def __init__(
        self,
        name: str,
        table_paths: dict[str, str] | None = None,
        db_path: str | None = None,
    ):
        self.name = name
        self._paths = dict(table_paths or {})
        self.db_path = db_path
        # db mode mutates remotely — re-register views per query so a
        # declined-to-polyfill SELECT sees remote writes (read-your-writes)
        self.fresh_scan_per_query = bool(db_path)
        self._db_tables: list[str] = []
        if db_path:
            import duckdb

            con = duckdb.connect(db_path)
            try:
                self._db_tables = [r[0] for r in con.execute("SHOW TABLES").fetchall()]
            finally:
                con.close()

    def _connect(self):
        import duckdb

        # db mode still registers the parquet views: a source constructed
        # with BOTH table_paths and db_path must serve whole-query pushdown
        # for both table kinds on one connection
        import os

        con = duckdb.connect(self.db_path) if self.db_path else duckdb.connect()
        for t, p in self._paths.items():
            # a Spark-written "table.parquet" is a DIRECTORY of part files —
            # glob it; literal (escaped) path because IF NOT EXISTS
            # statements cannot carry prepared parameters in duckdb
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            lit = pat.replace("'", "''")
            con.execute(
                f'CREATE VIEW IF NOT EXISTS "{t}" AS '
                f"SELECT * FROM read_parquet('{lit}')"
            )
        return con

    def tables(self) -> list[str]:
        return list(self._paths) + list(self._db_tables)

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        # The polyfill path: when passthrough declines, the engine plans the
        # query in Spark over these DataFrames. In db mode the table ships
        # through Arrow — correct for the remote-engine stand-in, where the
        # polyfill's own contract is "read the remote table"; a real
        # connector streams this through its partitioned reader instead.
        if table in self._paths:
            return spark.read.parquet(self._paths[table])
        con = self._connect()
        try:
            tbl = con.execute(f'SELECT * FROM "{table}"').fetch_arrow_table()
        finally:
            con.close()
        return _arrow_to_spark(spark, tbl)

    def writable(self) -> bool:
        return self.db_path is not None

    def execute_full_dml(self, sql: str) -> int | None:
        """Whole-statement remote DML (the FULL-tier analog of the mutator
        contract): run the INSERT/UPDATE/DELETE natively and return the
        affected-row count, or None to decline (unsupported syntax) — the
        engine then rejects, since a FULL source's tables have no local
        truth to polyfill a write against. DuckDB returns the count as the
        statement's single result cell, exactly the affected-rows contract
        the reference renders (results_mysql.go:295-348)."""
        if not self.db_path:
            return None
        import duckdb

        con = self._connect()
        try:
            cur = con.execute(self.to_native_sql(sql))
            row = cur.fetchone()
            return int(row[0]) if row else 0
        except (
            duckdb.ParserException,
            duckdb.BinderException,
            duckdb.CatalogException,
            duckdb.NotImplementedException,
        ):
            # genuinely can't express/resolve the statement → decline;
            # EXECUTION errors (constraint/conversion) propagate — hiding
            # a data error behind "declined" would misdiagnose the failure
            return None
        finally:
            con.close()

    def to_native_sql(self, sql: str) -> str:
        """Dialect writer parity (expr.NewDialectWriter('\\'', '"')):
        identifier quoting swaps from backtick to double-quote; the rest of
        the normalized SQL is ANSI enough for the target."""
        return sql.replace("`", '"')

    def execute_full(self, spark: SparkSession, sql: str) -> DataFrame | None:
        """Run the whole query natively; None = decline (engine polyfills)."""
        try:
            con = self._connect()  # db tables AND parquet views alike
            try:
                result = con.execute(self.to_native_sql(sql)).fetch_arrow_table()
            finally:
                con.close()
        except Exception:
            return None  # unsupported syntax/function → polyfill in Spark
        return _arrow_to_spark(spark, result)
