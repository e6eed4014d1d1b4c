"""ecommerce_analytics_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame / Spark SQL / Structured
Streaming) engine with the query and data-processing capabilities of the
Ajay6601/Ecommerce-Analytics reference platform (pandas batch ETL +
stateful Flink streaming + declared materialized views), re-expressed
Spark-first and extended with large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design notes (SURVEY.md §4):
- Everything is declarative DataFrame/SQL; Catalyst handles pushdown,
  pruning, join strategy, AQE skew handling. No custom rules needed.
- UDFs only where semantics demand them (stateful streaming processors,
  multimodal decode) — always Arrow-batched, never row-at-a-time.
- All timestamps are ``TimestampType`` in UTC internally; ISO strings
  only at JSON edges.
"""

__version__ = "0.1.0"

from ecommerce_analytics_spark.session import get_spark  # noqa: F401
