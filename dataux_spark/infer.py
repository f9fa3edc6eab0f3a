"""Schema inference — the reference's per-backend discovery semantics
(SURVEY §1.3), re-expressed for Spark sources:

  infer_from_documents — Mongo-style: sample N documents, infer field types
      from runtime values, widen across samples, nullable when missing
      (/root/reference/backends/mongo/mgo_source.go:241-333, discoverType
      at :335-366; sample size 30 hardcoded there).
  flatten_mapping — Elasticsearch-style: recursive `properties` walk
      producing dotted field names with mapped types; injects the ES
      meta-fields (/root/reference/backends/elasticsearch/source.go:154-255,
      meta-fields at :201-203).
  TableMeta — key metadata (partition/clustering keys) preserved on the
      table for pushdown decisions, Cassandra-style
      (/root/reference/backends/cassandra/source.go:150-262; consumed by
      the query translator at sql_to_cql.go:396-408).

At 100 TB inference cost must not scale with table size — every routine
here samples a fixed N and never scans. The inferred StructType feeds
`spark.read.schema(...)` so production reads skip Spark's own full-scan
inference pass.
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

SAMPLE_N = 30  # the reference's mongo sample size (mgo_source.go:241)


# ------------------------------------------------------- value → Spark type

def _type_of(value) -> T.DataType | None:
    if value is None:
        return None
    if isinstance(value, bool):  # before int: bool is an int subclass
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, dt.datetime):
        return T.TimestampType()
    if isinstance(value, dt.date):
        return T.DateType()
    if isinstance(value, (list, tuple)):
        elem: T.DataType | None = None
        for v in value:
            elem = _widen(elem, _type_of(v))
        return T.ArrayType(elem or T.StringType())
    if isinstance(value, dict):
        fields = [
            T.StructField(k, _type_of(v) or T.StringType(), True) for k, v in value.items()
        ]
        return T.StructType(fields)
    return T.StringType()


def _widen(a: T.DataType | None, b: T.DataType | None) -> T.DataType | None:
    """Type widening across sampled documents (the reference folds types per
    field over its 30 samples)."""
    if a is None:
        return b
    if b is None or a == b:
        return a
    numeric = (T.LongType(), T.DoubleType())
    if a in numeric and b in numeric:
        return T.DoubleType()
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_widen(a.elementType, b.elementType) or T.StringType())
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        names = list(dict.fromkeys([f.name for f in a.fields] + [f.name for f in b.fields]))
        am = {f.name: f.dataType for f in a.fields}
        bm = {f.name: f.dataType for f in b.fields}
        return T.StructType(
            [T.StructField(n, _widen(am.get(n), bm.get(n)) or T.StringType(), True) for n in names]
        )
    return T.StringType()  # incompatible → string (loosest)


def infer_from_documents(docs: list[dict], sample_n: int = SAMPLE_N) -> T.StructType:
    """Mongo-style sampled schema inference. Field order = first-seen order
    (the reference preserves ordered Fields on schema.Table)."""
    merged: dict[str, T.DataType | None] = {}
    for doc in docs[:sample_n]:
        for k, v in doc.items():
            merged[k] = _widen(merged.get(k), _type_of(v))
    return T.StructType(
        [T.StructField(k, ty or T.StringType(), True) for k, ty in merged.items()]
    )


def infer_json_file(spark: SparkSession, path: str, sample_n: int = SAMPLE_N) -> T.StructType:
    """Sample the first N lines of a JSON-lines file and infer — constant
    cost regardless of file size."""
    docs = []
    with open(path) as f:
        for i, line in enumerate(f):
            if i >= sample_n:
                break
            line = line.strip()
            if line:
                docs.append(json.loads(line))
    return infer_from_documents(docs, sample_n)


# -------------------------------------------------------- ES mapping walk

_ES_TYPES = {
    "string": T.StringType(),
    "text": T.StringType(),
    "keyword": T.StringType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.TimestampType(),
    "binary": T.BinaryType(),
    "ip": T.StringType(),
    "geo_point": T.StringType(),
}

ES_META_FIELDS = [("_id", T.StringType()), ("type", T.StringType()), ("_score", T.DoubleType())]


def flatten_mapping(properties: dict, inject_meta: bool = True) -> list[tuple[str, T.DataType]]:
    """Recursive ES-mapping flatten: nested `properties` become dotted field
    names (`repository.name`), exactly the reference's walk
    (source.go:217-255). Returns ordered (dotted_name, spark_type)."""
    out: list[tuple[str, T.DataType]] = []

    def walk(props: dict, prefix: str):
        for name, spec in props.items():
            dotted = f"{prefix}{name}"
            if isinstance(spec, dict) and "properties" in spec:
                walk(spec["properties"], f"{dotted}.")
            else:
                es_type = (spec or {}).get("type", "string") if isinstance(spec, dict) else "string"
                out.append((dotted, _ES_TYPES.get(es_type, T.StringType())))

    walk(properties, "")
    if inject_meta:
        out.extend(ES_META_FIELDS)
    return out


# ----------------------------------------------- BigTable family discovery

BT_SAMPLE_N = 10  # the reference reads ~10 rows per family (source.go:186-274)


def infer_family_tables(
    docs: list[dict], rowkey: str = "rowkey", sep: str = ":", sample_n: int = BT_SAMPLE_N
) -> dict[str, T.StructType]:
    """BigTable-style discovery: each column family becomes its OWN table
    whose Parent is the physical bigtable; columns are inferred by reading
    ~10 rows (/root/reference/backends/bigtable/source.go:186-274).

    Cells are keyed `family:qualifier`; the returned table schema per family
    is (rowkey, *qualifiers) with qualifier types widened across samples."""
    fams: dict[str, dict[str, T.DataType | None]] = {}
    key_ty: T.DataType | None = None
    for doc in docs[:sample_n]:
        key_ty = _widen(key_ty, _type_of(doc.get(rowkey)))
        for k, v in doc.items():
            if k == rowkey or sep not in k:
                continue
            fam, qual = k.split(sep, 1)
            quals = fams.setdefault(fam, {})
            quals[qual] = _widen(quals.get(qual), _type_of(v))
    return {
        fam: T.StructType(
            [T.StructField(rowkey, key_ty or T.StringType(), True)]
            + [T.StructField(q, ty or T.StringType(), True) for q, ty in quals.items()]
        )
        for fam, quals in fams.items()
    }


# ------------------------------------------------------------ key metadata

@dataclass
class TableMeta:
    """Table + key metadata for pushdown decisions (Cassandra-style: only
    partition/clustering-key predicates push to the source; ORDER BY is
    only pushable on clustering keys — sql_to_cql.go:396-408,570-600).

    Spark mapping: partition_keys inform repartition()/bucketing choices;
    a connector can consult `can_push_filter`/`can_push_order`."""

    name: str
    schema: T.StructType
    partition_keys: list[str] = field(default_factory=list)
    clustering_keys: list[str] = field(default_factory=list)

    def can_push_filter(self, column: str) -> bool:
        return column in self.partition_keys or column in self.clustering_keys

    def can_push_order(self, columns: list[str]) -> bool:
        return bool(columns) and all(c in self.clustering_keys for c in columns)
