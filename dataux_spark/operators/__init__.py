"""LLM-training-data pipeline operators (beyond-reference extensions,
BASELINE.json north star): deduplication, similarity search, text analysis,
multimodal column plumbing. All Spark-first: built-in higher-order functions
where possible, Arrow-batched pandas UDFs only where semantics require."""

from dataux_spark.operators import dedup, multimodal, similarity, skew, text, timeseries

__all__ = ["dedup", "similarity", "text", "multimodal", "timeseries", "skew"]
