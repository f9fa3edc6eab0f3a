from dataux_spark.functions.registry import register_all

__all__ = ["register_all"]
