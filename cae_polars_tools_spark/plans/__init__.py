from cae_polars_tools_spark.plans.registry import CORPUS, QuerySpec, register

__all__ = ["CORPUS", "QuerySpec", "register"]
