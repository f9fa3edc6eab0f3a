"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query smoke check on sf0.001.
queries()       — operator inventory from SURVEY.md §2 (+ LLM-pipeline ops),
                  each (spark, sf_dir) -> DataFrame.
oracle_sql()    — DuckDB-equivalent SQL per query; omitted entries are
                  genuinely non-SQL-expressible (approx sketches, LSH) and
                  get the driver's rows-only check.

Implementation lives in dataux_spark/queries.py (relational surface) and
dataux_spark/operators/ (dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from dataux_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing-summary shape) on sf0.001."""
    return _q.pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
