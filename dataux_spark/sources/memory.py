"""Static in-memory tables.

Reference: memdb/membtree static sources back system/introspection tables
(/root/reference/models/serverctx.go:119-134,
 frontends/mysqlfe/build_show.go:46-64).

Spark-first: `spark.createDataFrame(rows, schema)` — these tables are tiny
(system metadata), so they always broadcast in joins; no scale concern.
Also the writable fixture store for DML tests (INSERT/UPDATE/DELETE
semantics, reference backends/cassandra/sql_to_cql.go:246-394).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataux_spark.sources.base import PushdownTier, Source


class MemorySource(Source):
    tier = PushdownTier.SCAN_ONLY

    def __init__(self, name: str, tables: dict[str, DataFrame] | None = None):
        self.name = name
        self._tables: dict[str, DataFrame] = dict(tables or {})

    def add(self, table: str, df: DataFrame) -> None:
        self._tables[table] = df
        df.createOrReplaceTempView(table)

    def tables(self) -> list[str]:
        return list(self._tables)

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        if table not in self._tables:
            raise KeyError(f"unknown table {table!r} in source {self.name!r}")
        return self._tables[table]

    def writable(self) -> bool:
        return True
