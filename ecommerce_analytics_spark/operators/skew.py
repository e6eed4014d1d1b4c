"""Skew mitigation utilities (SURVEY §4.3, brief: 'skewed keys →
salting or AQE skew-join').

AQE's skew-join split handles sort-merge skew automatically; salting is
the manual tool for the cases AQE can't touch — skewed *aggregations*
and skewed broadcast-probe joins. Both utilities are semantics-
preserving rewrites, parity-tested against their naive forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_sum(df: DataFrame, key: str, value: str,
                       n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for a hot group key.

    Phase 1 shuffles on (key, salt) — the hot key spreads over n_salts
    reducers; phase 2 combines the n_salts partials per key (tiny).
    Semantics == df.groupBy(key).sum(value) exactly (sum is
    associative; no row is dropped or duplicated).

    The salt must be deterministic per ROW yet spread uniformly —
    a content hash of the whole row tuple does both without RNG.
    """
    salt = F.pmod(F.hash(F.struct(*df.columns)), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{value}"))


def salted_join(skewed: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16) -> DataFrame:
    """Replicated-salt join: the skewed side gets a per-row salt, the
    small side is replicated n_salts times, and the join key becomes
    (key, salt) — a single hot key fans out over n_salts tasks.

    Use when the small side is broadcastable-but-not-quite or when a
    shuffle join must survive one pathological key. Row multiset of the
    output == plain inner join.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    skewed_s = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.struct(*skewed.columns)), F.lit(n_salts)))
    small_s = small.withColumn("_salt", F.explode(salts))
    out = skewed_s.join(small_s, [key, "_salt"]).drop("_salt")
    return out


def _register() -> None:
    """Registered driver-certified query for the salting rewrite —
    upgrades the salting surface from pytest-parity-only to a
    driver-green oracle row. Deferred import to keep this module's
    library functions dependency-free."""
    from pyspark.sql import DataFrame, SparkSession  # noqa: F401

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.numerics import cents, money_sum_sql
    from ecommerce_analytics_spark.plans.registry import query

    @query(
        "salted_event_value_sum",
        f"""
        SELECT event_type, {money_sum_sql('value')} AS total_value
        FROM events GROUP BY event_type
        """,
        doc="Two-phase salted aggregation over the (few, hot) "
            "event_type keys: phase 1 shuffles integer-cents partials "
            "on (key, salt16), phase 2 combines 16 tiny partials per "
            "key — the manual rewrite for aggregations whose hot key "
            "AQE can't split. The oracle is the PLAIN group-by: the "
            "driver hash certifies the rewrite is semantics-"
            "preserving (associative integer-cents sums make the "
            "two-phase total bit-exact).",
        tags=("agg", "skew", "scale"),
    )
    def q_salted_event_value_sum(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
        from pyspark.sql import functions as F
        events = (load_table(spark, sf_dir, "events")
                  .select("event_type", cents("value").alias("_cents")))
        salted = salted_groupby_sum(events, "event_type", "_cents")
        return salted.select(
            "event_type",
            (F.col("sum__cents").cast("decimal(28,0)")
             * F.lit("0.01").cast("decimal(3,2)"))
            .cast("double").alias("total_value"))


_register()
