"""Operator modules. Importing this package registers every query."""

from ecommerce_analytics_spark.operators import (  # noqa: F401
    classification,
)
