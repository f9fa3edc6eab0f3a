"""ES-style source with REAL filter pushdown — the FILTERS_LIMIT_AGGS tier.

Reference: the Elasticsearch backend walks the WHERE tree and translates the
subset it can express as a native `_search` body — term (=), range
(<,<=,>,>=), terms (IN), exists/missing, prefix — flagging everything else
`needsWherePolyFill`; the engine re-applies the flagged residue after the
scan (/root/reference/backends/elasticsearch/sqltoes.go:403-586, residual
polyfill contract per README.md:10-16).

Spark-first: that accept-or-residual negotiation IS Catalyst's DataSource
filter pushdown, so the backend is a Spark 4 Python DataSource whose
reader's ``pushFilters()`` keeps the ES-expressible subset and returns the
rest — Catalyst then plans the residual Filter node automatically (the
polyfill). Nothing is hand-scheduled: the engine half of the reference's
contract is Catalyst itself.

Scale: filters accepted here execute "remotely" (inside the source read, the
`_search` analog), so a 100 TB index transfers only matching documents. At
cluster scale ``partitions()`` would slice the scroll/entity API by shard or
key range into many InputPartitions — one task per shard, each shipping its
own pushed-filter query; the single-partition shape below matches the
control-plane-sized fixtures this offline environment exercises.
"""

from __future__ import annotations

import json
import urllib.request

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
    StringStartsWith,
)

from dataux_spark.infer import infer_from_documents
from dataux_spark.sources.base import PushdownTier, Source
from dataux_spark.sources.rest import _fetch_json, _flatten

# What the ES walker can express natively (sqltoes.go:403-586): term, range,
# terms-IN, exists/missing, prefix; NOT via bool must_not.  Everything else
# (contains/endswith wildcards, null-safe =, unknown nodes) is declined and
# becomes a Catalyst residual Filter — the polyfill.
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
)

def read_push_log(log_dir: str, qid: str) -> dict[str, list[str]]:
    """Read the pushdown-negotiation record a scan wrote for ``qid``.

    pushFilters() runs inside a Spark Python planning worker (a separate
    process), so the record travels through a file, not module state:
    {"pushed": [filter reprs], "residual": [filter reprs]}.
    """
    import os

    with open(os.path.join(log_dir, f"{qid}.json")) as fh:
        return json.load(fh)


def _acceptable(f) -> bool:
    if isinstance(f, Not):
        return _acceptable(f.child)
    if not isinstance(f, _ACCEPTED):
        return False
    return len(f.attribute) == 1  # flattened dotted columns are one segment


def _eval(f, doc):
    """Three-valued filter evaluation over a document (the remote `_search`
    execution analog). Returns True/False/None; a row is kept iff True."""
    if isinstance(f, Not):
        inner = _eval(f.child, doc)
        return None if inner is None else not inner
    v = doc.get(f.attribute[0])
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return None
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    if isinstance(f, In):
        return v in f.value
    if isinstance(f, StringStartsWith):
        return isinstance(v, str) and v.startswith(f.value)
    return None


class EsStyleReader(DataSourceReader):
    def __init__(self, schema, options):
        self._schema = schema
        self._url = options["url"]
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
                     "residual": [repr(f) for f in residual]},
                    fh,
                )
        return residual  # Catalyst re-applies these — the polyfill

    def partitions(self):
        # One task for a control-plane-sized listing; a sharded index would
        # return one InputPartition per shard/scroll-slice here.
        return [InputPartition(0)]

    def read(self, partition):
        docs = _fetch_json(self._url)
        docs = [_flatten(d) if isinstance(d, dict) else d for d in docs]
        cols = [f.name for f in self._schema.fields]
        for d in docs:
            if all(_eval(f, d) is True for f in self._pushed):
                yield tuple(d.get(c) for c in cols)


class EsStyleDataSource(DataSource):
    @classmethod
    def name(cls):
        return "dataux_es"

    def schema(self):
        docs = _fetch_json(self.options["url"])
        docs = [_flatten(d) if isinstance(d, dict) else d for d in docs]
        return infer_from_documents(docs, sample_n=len(docs) or 1)

    def reader(self, schema):
        return EsStyleReader(schema, self.options)


class EsStyleRestSource(Source):
    """name → {table: url}; each table scans through the pushdown reader."""

    tier = PushdownTier.FILTERS_LIMIT_AGGS
    default_limit = 1000
    _registered_sessions: set[int] = set()

    def __init__(self, name: str, endpoints: dict[str, str], push_log_dir: str | None = None):
        self.name = name
        self.endpoints = dict(endpoints)
        self.push_log_dir = push_log_dir

    @classmethod
    def _ensure_format(cls, spark: SparkSession) -> None:
        key = id(spark)
        if key not in cls._registered_sessions:
            spark.dataSource.register(EsStyleDataSource)
            cls._registered_sessions.add(key)
        # runtime conf so a vanilla (driver-owned) session works too
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")

    def tables(self) -> list[str]:
        return list(self.endpoints)

    def load(self, spark: SparkSession, table: str) -> DataFrame:
        if table not in self.endpoints:
            raise KeyError(f"unknown table {table!r} in source {self.name!r}")
        self._ensure_format(spark)
        reader = (
            spark.read.format("dataux_es")
            .option("url", self.endpoints[table])
            .option("qid", f"{self.name}.{table}")
        )
        if self.push_log_dir:
            reader = reader.option("push_log_dir", self.push_log_dir)
        return reader.load()
