"""BigTable-style source — column families exposed as tables.

Reference: the bigtable backend makes each **column family a table** whose
`Parent` is the physical bigtable, inferring columns by reading ~10 rows,
and scans each family with a `FamilyFilter`
(/root/reference/backends/bigtable/source.go:186-274, scan at :205-235).

Spark-first: the physical table is a wide document listing whose cells are
keyed `family:qualifier`. Discovery (infer.infer_family_tables) samples a
fixed N rows — constant cost at any table size — and each family table is a
projection: rowkey + that family's qualifiers, rows limited to those with at
least one cell in the family (the FamilyFilter contract). Recomposing
families is a rowkey equi-join, which Spark plans as a broadcast/SMJ like
any other join; at 100 TB each family projection prunes to its own column
set before any shuffle.

SCAN_ONLY tier: like Kube/BigTable REST scans, every relational operator on
top is the engine's polyfill (Catalyst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataux_spark.infer import BT_SAMPLE_N, infer_family_tables
from dataux_spark.sources.base import PushdownTier, Source
from dataux_spark.sources.rest import _fetch_json


class FamilyTableSource(Source):
    """name → {physical_table: url}; each discovered family becomes a table.

    Family tables are named after the family (reference semantics) with the
    physical table as `parent`; on cross-physical name collision the table
    is prefixed `<physical>_<family>`.
    """

    tier = PushdownTier.SCAN_ONLY
    default_limit = 5000

    def __init__(
        self,
        name: str,
        physical: dict[str, str],
        rowkey: str = "rowkey",
        sep: str = ":",
        sample_n: int = BT_SAMPLE_N,
    ):
        self.name = name
        self.rowkey = rowkey
        self.sep = sep
        self._docs: dict[str, list[dict]] = {
            phys: _fetch_json(url) for phys, url in physical.items()
        }
        # discovery: sample N rows per physical table, one table per family
        self._tables: dict[str, tuple[str, str]] = {}  # table → (physical, family)
        self.parent: dict[str, str] = {}
        self._schemas = {}
        for phys, docs in self._docs.items():
            for fam, schema in infer_family_tables(
                docs, rowkey=rowkey, sep=sep, sample_n=sample_n
            ).items():
                tname = fam if fam not in self._tables else f"{phys}_{fam}"
                self._tables[tname] = (phys, fam)
                self.parent[tname] = phys
                self._schemas[tname] = schema

    def tables(self) -> list[str]:
        return list(self._tables)

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        if table not in self._tables:
            raise KeyError(f"unknown table {table!r} in source {self.name!r}")
        phys, fam = self._tables[table]
        schema = self._schemas[table]
        prefix = f"{fam}{self.sep}"
        quals = [f.name for f in schema.fields[1:]]
        rows = [
            tuple([d.get(self.rowkey)] + [d.get(prefix + q) for q in quals])
            for d in self._docs[phys]
            # FamilyFilter: only rows with ≥1 cell in this family appear
            if any(k.startswith(prefix) for k in d)
        ]
        return spark.createDataFrame(rows, schema)
