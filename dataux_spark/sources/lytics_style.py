"""Lytics-style source — SQL WHERE regenerated as a SegmentQL filter.

Reference: the Lytics backend does not walk the WHERE into API calls —
it lifts the WHOLE where expression into a qlbridge FilterStatement
(SegmentQL: `FILTER <boolean tree> FROM <table>`) and sends that text to
the entity-scan REST API; no WHERE → `FILTER *`
(/root/reference/backends/lytics/generator.go:62-111, filterAll fallback
:103-107; result paging resultreader.go:53-128).

Spark-first: the Catalyst half stays the standard pushFilters negotiation,
but the accepted subset is RENDERED AS SegmentQL text — the artifact the
reference ships over the wire — and recorded in the push log, so tests can
pin the generated statement exactly. Filters SegmentQL can't express from
the V2 vocabulary (none today — the expression language covers the whole
set) would decline into Catalyst residuals like every other tier.

Scale: the SegmentQL text executes remotely (entity scan API); only
matching entities transfer. partitions() would slice the scan API's
paging segments at cluster scale.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from dataux_spark.infer import infer_from_documents
from dataux_spark.sources.base import PushdownTier, Source
from dataux_spark.sources.mongo_style import _eval  # same doc-eval semantics
from dataux_spark.sources.rest import _fetch_json, _flatten

_ACCEPTED = (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNull,
    IsNotNull,
    StringStartsWith,
    StringEndsWith,
    StringContains,
)


def _sq_val(v) -> str:
    if isinstance(v, str):
        return '"' + v.replace('"', '\\"') + '"'
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _sq_clause(f) -> str:
    """One SegmentQL clause per accepted filter (FilterQL expression
    syntax: the qlbridge dialect the reference's FilterStatement prints)."""
    if isinstance(f, Not):
        return f"NOT {_sq_clause(f.child)}"
    col = f.attribute[0]
    if isinstance(f, EqualTo):
        return f"{col} == {_sq_val(f.value)}"
    if isinstance(f, GreaterThan):
        return f"{col} > {_sq_val(f.value)}"
    if isinstance(f, GreaterThanOrEqual):
        return f"{col} >= {_sq_val(f.value)}"
    if isinstance(f, LessThan):
        return f"{col} < {_sq_val(f.value)}"
    if isinstance(f, LessThanOrEqual):
        return f"{col} <= {_sq_val(f.value)}"
    if isinstance(f, In):
        return f"{col} IN ({', '.join(_sq_val(v) for v in f.value)})"
    if isinstance(f, IsNull):
        return f"NOT EXISTS {col}"
    if isinstance(f, IsNotNull):
        return f"EXISTS {col}"
    if isinstance(f, StringStartsWith):
        return f'{col} LIKE {_sq_val(f.value + "%")}'
    if isinstance(f, StringEndsWith):
        return f'{col} LIKE {_sq_val("%" + f.value)}'
    if isinstance(f, StringContains):
        return f'{col} CONTAINS {_sq_val(f.value)}'
    raise ValueError(f"unrenderable filter {f!r}")


def segmentql(table: str, filters) -> str:
    """Render the pushed conjunction as a FilterStatement — `FILTER *` when
    nothing pushed (generator.go:103-107 filterAll)."""
    if not filters:
        return f"FILTER * FROM {table}"
    if len(filters) == 1:
        return f"FILTER {_sq_clause(filters[0])} FROM {table}"
    clauses = ", ".join(_sq_clause(f) for f in filters)
    return f"FILTER AND ( {clauses} ) FROM {table}"


def _acceptable(f) -> bool:
    if isinstance(f, Not):
        return _acceptable(f.child)
    return isinstance(f, _ACCEPTED) and len(f.attribute) == 1


class LyticsStyleReader(DataSourceReader):
    def __init__(self, schema, options):
        self._schema = schema
        self._url = options["url"]
        self._table = options.get("table", "entities")
        self._qid = options.get("qid", self._url)
        self._log_dir = options.get("push_log_dir")
        self._pushed = []

    def pushFilters(self, filters):
        accepted, residual = [], []
        for f in filters:
            (accepted if _acceptable(f) else residual).append(f)
        self._pushed = accepted
        if self._log_dir:
            import os

            with open(os.path.join(self._log_dir, f"{self._qid}.json"), "w") as fh:
                json.dump(
                    {"pushed": [repr(f) for f in accepted],
                     "residual": [repr(f) for f in residual],
                     "segmentql": segmentql(self._table, accepted)},
                    fh,
                )
        return residual

    def partitions(self):
        # consume-and-clear; see es_style.EsStyleReader.partitions
        pushed, self._pushed = self._pushed, []
        return [InputPartition((0, pushed))]

    def read(self, partition):
        _, pushed = partition.value
        docs = _fetch_json(self._url)
        docs = [_flatten(d) if isinstance(d, dict) else d for d in docs]
        cols = [f.name for f in self._schema.fields]
        for d in docs:
            if all(_eval(f, d) is True for f in pushed):
                yield tuple(d.get(c) for c in cols)


class LyticsStyleDataSource(DataSource):
    @classmethod
    def name(cls):
        return "dataux_lytics"

    def schema(self):
        docs = _fetch_json(self.options["url"])
        docs = [_flatten(d) if isinstance(d, dict) else d for d in docs]
        return infer_from_documents(docs)

    def reader(self, schema):
        return LyticsStyleReader(schema, self.options)


class LyticsStyleSource(Source):
    """name → {entity-table: url}; WHERE pushes as generated SegmentQL."""

    tier = PushdownTier.FILTERS_LIMIT
    default_limit = 1000
    fresh_scan_per_query = True
    _registered_sessions: set[int] = set()

    def __init__(self, name: str, endpoints: dict[str, str], push_log_dir: str | None = None):
        self.name = name
        self.endpoints = dict(endpoints)
        self.push_log_dir = push_log_dir

    @classmethod
    def _ensure_format(cls, spark: SparkSession) -> None:
        key = id(spark)
        if key not in cls._registered_sessions:
            spark.dataSource.register(LyticsStyleDataSource)
            cls._registered_sessions.add(key)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")

    def tables(self) -> list[str]:
        return list(self.endpoints)

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        if table not in self.endpoints:
            raise KeyError(f"unknown table {table!r} in source {self.name!r}")
        self._ensure_format(spark)
        reader = (
            spark.read.format("dataux_lytics")
            .option("url", self.endpoints[table])
            .option("table", table)
            .option("qid", f"{self.name}.{table}")
        )
        if self.push_log_dir:
            reader = reader.option("push_log_dir", self.push_log_dir)
        return reader.load()
