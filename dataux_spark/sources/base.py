"""Source abstraction — the federation layer.

The reference is a federated engine: each backend (ES, Mongo, Cassandra,
BigQuery, BigTable, Datastore, files, REST) discovers table schemas at
startup and declares what part of a query it can execute natively; the engine
"poly-fills" the rest (/root/reference/README.md:10-16, and per-backend
WalkSourceSelect sites, e.g. backends/mongo/sql_to_mgo.go:75-166).

Spark-first mapping: a Source produces DataFrames. Pushdown is Catalyst's job
(DSv2 SupportsPushDownFilters/Limit/RequiredColumns are built-in for file
formats); what remains of the reference's "pushdown tier negotiation" is a
*declaration* per source, used by tests to verify the polyfill contract —
a query must return identical results whether the source accepted pushdown
or the engine recomputed it (the core federation correctness property,
reference flags `needsWherePolyFill` etc.).

At 100 TB the tier also matters operationally: a `FULL` source (BigQuery
style, backends/bigquery/sql_to_bq.go:99-104) should receive the whole query
text; a SCAN_ONLY source must be partitioned aggressively and filtered
engine-side. `Source.load()` receives optional hints for this.
"""

from __future__ import annotations

import enum
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession


class PushdownTier(enum.Enum):
    """Mirrors the reference's per-backend capability levels (SURVEY §7.1)."""

    FULL = "full"                      # whole-query passthrough (BigQuery)
    FILTERS_LIMIT_AGGS = "filters_limit_aggs"  # ES-style
    FILTERS_LIMIT = "filters_limit"    # Mongo-style
    KEY_FILTERS = "key_filters"        # Cassandra-style (partition/cluster keys)
    SCAN_ONLY = "scan_only"            # Kube/BigTable REST-style


class Source(ABC):
    """A named backend exposing tables as DataFrames."""

    name: str
    tier: PushdownTier = PushdownTier.SCAN_ONLY
    #: Reference parity (SURVEY §2.5): each backend caps un-LIMITed reads at
    #: a default page size (ES 1000 sqltoes.go:22, Mongo 20 sql_to_mgo.go:25,
    #: Cass/BT/BQ/Kube 5000, Datastore 1000). Applied by the engine ONLY when
    #: the source result is final (plain single-table SELECT, no aggregation
    #: — the reference lifts the cap when a polyfill stage follows,
    #: sql_to_mgo.go:103-105). None = unlimited (file/memory sources).
    default_limit: int | None = None

    @abstractmethod
    def tables(self) -> list[str]:
        """Discovered table names (reference: per-backend schema discovery,
        SURVEY §1.3 — e.g. ES GET /_aliases, Mongo collection sampling)."""

    @abstractmethod
    def load(self, spark: SparkSession, table: str) -> DataFrame:
        """Return the table as a DataFrame. Must be lazy (no action)."""

    def writable(self) -> bool:
        return False

    def files_table(self, spark: SparkSession) -> DataFrame | None:
        """Optional `<source>_files` virtual table (reference:
        backends/files/filesource_test.go:221-238)."""
        return None

    def register_all(self, spark: SparkSession) -> None:
        """Register every table (and the files virtual table) as temp views."""
        for t in self.tables():
            self.load(spark, t).createOrReplaceTempView(t)
        ft = self.files_table(spark)
        if ft is not None:
            ft.createOrReplaceTempView(f"{self.name}_files")
