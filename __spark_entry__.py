"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``ecommerce_analytics_spark`` package;
this module just re-exports its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.8 sequential event classification)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.session import tune
    tune(spark)
    return query_map()["event_classification"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.session import tune

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in query_map().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    from ecommerce_analytics_spark.plans.registry import oracle_map
    return oracle_map()
