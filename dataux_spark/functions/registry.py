"""Dialect function shims registered on the SparkSession.

The reference loads qlbridge's whole builtin function library
(frontends/mysqlfe/testmysql/runtestserver.go:74 — builtins.LoadAllBuiltins)
and exposes a custom-function registry as a first-class feature
(/root/reference/README.md:40, expr.FuncAdd at mysql_functions.go:20).

Spark-first: pyspark.sql.functions is a superset of qlbridge's builtins; we
register *names* Spark lacks under the reference's spelling so reference
queries run unchanged. Everything here is either a SQL-expression macro
(JVM-side, codegen'd — preferred) or, only for the loose date parser, an
Arrow-vectorized pandas UDF.

Custom user functions: Engine.add_function(name, fn_or_sql) mirrors
expr.FuncAdd (reference mysql_functions.go:53-78).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.TimestampType())
def _todate(s: pd.Series) -> pd.Series:
    """Loose date parsing — reference parses timestamps via dateparse
    (testutil/testsetup.go:42-46, builtin `todate` used at
    backends/mongo/mgo_test.go:719). Arrow-vectorized; literal args are
    constant-folded by Catalyst before reaching the UDF in most plans."""
    out = pd.to_datetime(s, errors="coerce", utc=True, format="mixed")
    try:
        return out.dt.tz_localize(None)
    except (TypeError, AttributeError):
        return out


def register_all(spark: SparkSession) -> None:
    spark.udf.register("todate", _todate)

    # qlbridge-builtin spellings Spark lacks (qlbridge builtins loaded
    # wholesale at runtestserver.go:74; usage shapes in SURVEY §2.8).
    # Scalar python UDFs are fine here: these appear in predicates over
    # short strings, and the heavily-used names (exists/missing/cardinality/
    # terms/cast/char_length) are handled as rewrites in dialect.py, staying
    # JVM-side.
    spark.udf.register("hasprefix", lambda s, p: s.startswith(p) if s is not None and p is not None else None, T.BooleanType())
    spark.udf.register("hassuffix", lambda s, p: s.endswith(p) if s is not None and p is not None else None, T.BooleanType())
