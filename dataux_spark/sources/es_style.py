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
        #
        # CRITICAL lifecycle detail: the reader object LIVES ACROSS QUERIES
        # (a registered view holds one relation), and Spark only calls
        # pushFilters() when the query has candidate filters — so read()
        # must never consult self._pushed (a filterless query after a
        # filtered one would silently reuse the previous query's filters).
        # partitions() runs during each query's planning, after any
        # pushFilters(): consume the pushed set here, embed it in the
        # InputPartition, and clear it.
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

    # --------------------------------------------- aggregate pushdown (ES)

    def _docs(self, table: str) -> list[dict]:
        docs = _fetch_json(self.endpoints[table])
        return [_flatten(d) if isinstance(d, dict) else d for d in docs]

    @staticmethod
    def _filter_docs(docs: list[dict], filters) -> list[dict]:
        from dataux_spark.sources.base import filter_documents

        return filter_documents(docs, filters)

    def _log_agg(self, table: str, payload: dict, kind: str = "agg") -> None:
        if self.push_log_dir:
            import os

            with open(
                os.path.join(self.push_log_dir, f"{self.name}.{table}.{kind}.json"), "w"
            ) as fh:
                json.dump(payload, fh)

    def execute_agg(self, spark, table, items, filters, group_by):
        """Whole-aggregation execution inside the source — the `_search`
        aggs body analog (/root/reference/backends/elasticsearch/
        sqltoes.go:285-365; stats aggs :599-612, count-as-exists :635-647;
        GROUP BY as nested terms buckets :334-365).

        The result is a handful of rows (that is the point of pushing an
        agg: a 100 TB index returns one stats object, not 100 TB), built
        driver-side exactly like the reference's resultreader decodes the
        ES response (esresults.go:183-219). Differences from real ES kept
        deliberately engine-faithful: cardinality is exact here (ES HLL is
        approximate), and NULL group keys form a group (ES terms drops
        missing) — the polyfill-equivalence contract wins over remote
        quirks."""
        if table not in self.endpoints:
            return None
        from pyspark.sql import types as T

        docs = self._filter_docs(self._docs(table), filters)
        schema = infer_from_documents(docs or self._docs(table))
        ftypes = {f.name: f.dataType for f in schema.fields}

        def agg_type(fn, arg):
            if fn in ("count", "approx_count_distinct"):
                return T.LongType()
            if fn == "avg":
                return T.DoubleType()
            t = ftypes.get(arg, T.DoubleType())
            if fn == "sum":
                return t if isinstance(t, T.LongType) else T.DoubleType()
            return t  # min/max keep the column type

        def compute(group_docs):
            row = []
            for fn, arg, _alias in items:
                if fn == "key":
                    row.append(group_docs[0].get(arg) if group_docs else None)
                    continue
                vals = (
                    [1] * len(group_docs)
                    if arg == "*"
                    else [d[arg] for d in group_docs if d.get(arg) is not None]
                )
                if fn == "count":
                    row.append(len(vals))
                elif fn == "approx_count_distinct":
                    row.append(len(set(vals)))
                elif not vals:
                    row.append(None)
                elif fn == "sum":
                    s = sum(vals)
                    row.append(float(s) if not isinstance(agg_type("sum", arg), T.LongType) else s)
                elif fn == "avg":
                    row.append(sum(vals) / len(vals))
                elif fn == "min":
                    row.append(min(vals))
                elif fn == "max":
                    row.append(max(vals))
            return tuple(row)

        if group_by:
            # nested terms buckets: one level per group column
            # (sqltoes.go:334-365); a composite tuple key is the flattened
            # equivalent of the recursion
            groups: dict = {}
            for d in docs:
                groups.setdefault(tuple(d.get(c) for c in group_by), []).append(d)
            rows = [compute(g) for g in groups.values()]
        else:
            rows = [compute(docs)]
        fields = []
        for fn, arg, alias in items:
            if fn == "key":
                name = alias or arg
                fields.append(T.StructField(name, ftypes.get(arg, T.StringType()), True))
            else:
                # mirror Catalyst's default output names (count(*) plans
                # as count(1)) so the result schema is identical whether
                # the source accepted the pushdown or the polyfill ran
                name = alias or (f"{fn}({arg})" if arg != "*" else f"{fn}(1)")
                fields.append(T.StructField(name, agg_type(fn, arg), True))
        self._log_agg(table, {
            "aggs": [[fn, arg] for fn, arg, _ in items],
            "filters": [[c, o, v] for c, o, v in filters],
            "group_by": group_by,
        })
        return spark.createDataFrame(rows, T.StructType(fields))

    def execute_topk(self, spark, table, cols, order, limit, filters):
        """Sort + size inside `_search` (sqltoes.go:170-186 sort array;
        size at :22): the index returns the top n hits, not the index."""
        if table not in self.endpoints:
            return None
        from dataux_spark.sources.base import topk_documents

        # top-k logs to its own file (.topk.json, matching the other
        # tiers) so it never clobbers the last agg log entry
        self._log_agg(table, {"sort": [[c, d] for c, d in order], "limit": limit,
                              "filters": [[c, o, v] for c, o, v in filters]},
                      kind="topk")
        return topk_documents(spark, self._docs(table), cols, order, limit, filters)

    def execute_terms(self, spark, table, field, size, filters):
        """terms(field, k) inside the source (sqltoes.go:612-634): per-key
        doc counts, top-k by count desc then key — the multi-row agg result
        the reference decodes at esresults.go:183-219."""
        if table not in self.endpoints:
            return None
        from pyspark.sql import types as T

        docs = self._filter_docs(self._docs(table), filters)
        counts: dict = {}
        for d in docs:
            k = d.get(field)
            counts[k] = counts.get(k, 0) + 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], str(kv[0])))[:size]
        ktype = infer_from_documents(self._docs(table)).fields
        ktype = next((f.dataType for f in ktype if f.name == field), T.StringType())
        self._log_agg(table, {"terms": [field, size],
                              "filters": [[c, o, v] for c, o, v in filters]})
        return spark.createDataFrame(
            [(k, v) for k, v in top],
            T.StructType([T.StructField("key", ktype, True),
                          T.StructField("count", T.LongType(), False)]),
        )
