from core2_spark.queries.registry import all_oracles, all_queries, query

__all__ = ["all_queries", "all_oracles", "query"]
