"""dataux_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the dataux/dataux federated SQL engine.

Reference semantics: /root/reference (dataux/dataux, Go). This package is a
brand-new Spark-first implementation, NOT a port: SQL is executed by Spark SQL
(Catalyst/Tungsten) after a light MySQL-dialect rewrite pass; federation is a
source registry producing DataFrames; dataux's distributed actor machinery
(planner/) is replaced wholesale by Spark's own partitioned execution.

Entry points:
    from dataux_spark import Engine, get_spark
    eng = Engine(get_spark())
    eng.register_parquet_dir("tpch", "/root/testdata/sf0.01")
    eng.sql('SELECT count(*) AS ct FROM lineitem').show()
"""

from dataux_spark.engine import Engine
from dataux_spark.spark_session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
