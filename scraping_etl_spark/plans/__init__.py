"""Query plans: the engine's declared query surface + oracle SQL."""

from scraping_etl_spark.plans.registry import QUERIES, QuerySpec, oracle_sql_map, queries_map

__all__ = ["QUERIES", "QuerySpec", "queries_map", "oracle_sql_map"]
