from ecommerce_analytics_spark.plans.registry import (  # noqa: F401
    QUERIES, Query, all_queries, oracle_map, query, query_map,
)
