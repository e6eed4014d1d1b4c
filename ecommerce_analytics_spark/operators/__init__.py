"""Operator modules. Importing this package registers every query."""

from ecommerce_analytics_spark.operators import (  # noqa: F401
    aggregates,
    classification,
    cleaning,
    corpus_quality,
    decontam,
    dedup,
    dedup_index,
    dedup_resolve,
    events_enrichment,
    fingerprint,
    funnels,
    graph,
    joins,
    quantiles,
    similarity,
    sketches,
    sorts,
    star,
    text,
    text_pipeline,
    timeseries,
    tpch_extra,
    validate,
    windows_extra,
)
from ecommerce_analytics_spark.plans import star_schema  # noqa: F401
