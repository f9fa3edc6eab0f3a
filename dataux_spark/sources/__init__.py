from dataux_spark.sources.base import PushdownTier, Source
from dataux_spark.sources.es_style import EsStyleRestSource
from dataux_spark.sources.file_source import CsvDirSource, JsonDirSource, ParquetDirSource
from dataux_spark.sources.memory import MemorySource
from dataux_spark.sources.cassandra_style import CassandraStyleSource
from dataux_spark.sources.datastore_style import DatastoreStyleSource
from dataux_spark.sources.lytics_style import LyticsStyleSource
from dataux_spark.sources.mongo_style import MongoStyleSource

__all__ = [
    "Source",
    "PushdownTier",
    "ParquetDirSource",
    "CsvDirSource",
    "JsonDirSource",
    "MemorySource",
    "EsStyleRestSource",
    "MongoStyleSource",
    "CassandraStyleSource",
    "DatastoreStyleSource",
    "LyticsStyleSource",
]
