"""Operator modules. Importing this package registers every query."""

from ecommerce_analytics_spark.operators import (  # noqa: F401
    aggregates,
    classification,
    cleaning,
    dedup,
    events_enrichment,
    joins,
    similarity,
    sorts,
    star,
    text,
    windows_extra,
)
