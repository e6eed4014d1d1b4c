"""Query registry — the single source of truth for the driver contract.

Each operator from SURVEY.md §2 registers here as a named ``Query``:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB-runnable ANSI-SQL oracle over
the same parquet tables. ``__spark_entry__.py`` re-exports this
registry to the driver; the local test suite runs the same comparison
the driver runs (row count + schema + order-insensitive value hash).

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, "Query"] = {}


@dataclass
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Local-harness float tolerance (significant digits). None = exact
    # comparison, matching the driver's raw value hash. Only queries whose
    # outputs are genuinely unrounded floats (and whose arithmetic cannot
    # be made engine-deterministic) should set this — the driver still
    # hashes them exactly, so it flags residual cross-engine risk.
    float_sig: int | None = None


def query(name: str, oracle: str | None, doc: str = "",
          tags: tuple[str, ...] = (),
          float_sig: int | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, spark_fn=fn, oracle=oracle,
                              doc=doc or (fn.__doc__ or ""), tags=tuple(tags),
                              float_sig=float_sig)
        return fn
    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import ecommerce_analytics_spark.operators  # noqa: F401
    import ecommerce_analytics_spark.ml.anomaly  # noqa: F401
    import ecommerce_analytics_spark.ml.forecast  # noqa: F401
    import ecommerce_analytics_spark.ml.recommend  # noqa: F401
    import ecommerce_analytics_spark.ml.segmentation  # noqa: F401
    import ecommerce_analytics_spark.multimodal.blobs  # noqa: F401
    import ecommerce_analytics_spark.sources.docstore  # noqa: F401
    import ecommerce_analytics_spark.sources.simulator  # noqa: F401
    import ecommerce_analytics_spark.streaming.e2e_pipeline  # noqa: F401


def all_queries() -> dict[str, "Query"]:
    _load_all()
    return dict(QUERIES)


def query_map() -> dict[str, SparkQuery]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items()
            if q.oracle is not None}
