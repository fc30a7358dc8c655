from stacktrend_spark.plans.registry import QuerySpec, all_queries, register

__all__ = ["QuerySpec", "all_queries", "register"]
