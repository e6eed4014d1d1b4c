"""Stream-enrichment semantics as batch column/window ops (SURVEY §2.2/2.3).

The reference's Flink EnrichmentFunction keeps per-user ValueState and
derives user_segment / customer_ltv / risk_score per event
(EnrichmentFunction.java:31-168). Batch formulation: the running LTV is
a window sum over (user, time) — one hash shuffle on user_id, no
driver-side state; segment and risk are pure column expressions. The
streaming twin lives in ``ecommerce_analytics_spark.streaming`` and is
parity-tested against this formulation.

Binding to the driver ``events`` table (FIXTURES.md §C): 'purchase'
adds value, 'error' plays the return role and subtracts abs(value)
(EnrichmentFunction.java:112-115 subtracts abs of the already-negative
amount), other event types carry the running value unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

# Reference thresholds (amount > 100 / > 500, EnrichmentFunction.java:
# 151-160) rescaled to the synthetic value distribution (p90 ≈ 114,
# max ≈ 490) so both branches actually fire.
RISK_MID_AMOUNT = 100.0
RISK_HIGH_AMOUNT = 300.0


def signed_amount() -> F.Column:
    """LTV contribution per event (EnrichmentFunction.java:70-130)."""
    return (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.abs(F.col("value")))
        .otherwise(F.lit(0.0))
    )


def signed_amount_dec() -> F.Column:
    """Exact-decimal twin of ``signed_amount`` for sums (see
    SIGNED_AMOUNT_DEC_SQL — associative, engine-deterministic)."""
    v = F.col("value").cast("decimal(18,2)")
    return (
        F.when(F.col("event_type") == "purchase", v)
        .when(F.col("event_type") == "error", -F.abs(v))
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    )


SIGNED_AMOUNT_SQL = """
CASE WHEN event_type = 'purchase' THEN value
     WHEN event_type = 'error' THEN -abs(value)
     ELSE 0.0 END
"""

# Sum variant in exact DECIMAL: DuckDB evaluates window sums with a
# segment tree (different association order than Spark's running
# accumulation), so double sums differ ~1e-12 between engines. `value`
# is losslessly DECIMAL(18,2)-representable (verified at all SFs);
# decimal addition is associative, so both engines agree exactly.
SIGNED_AMOUNT_DEC_SQL = """
CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
     WHEN event_type = 'error' THEN -abs(CAST(value AS DECIMAL(18,2)))
     ELSE CAST(0 AS DECIMAL(18,2)) END
"""

_LTV_ORACLE = f"""
SELECT event_id, user_id, ts, event_type, value,
       {SIGNED_AMOUNT_SQL} AS signed_amount,
       CAST(sum({SIGNED_AMOUNT_DEC_SQL}) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS customer_ltv
FROM events
"""


@query(
    "ltv_running",
    _LTV_ORACLE,
    doc="A5: per-user running lifetime value, the Flink ValueState "
        "read-modify-write (EnrichmentFunction.java:70-130) as a window "
        "sum — distributed, replayable, no state backend.",
    tags=("window", "tier-a", "stream-parity"),
)
def q_ltv_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.select(
        "event_id", "user_id", "ts", "event_type", "value",
        signed_amount().alias("signed_amount"),
        F.sum(signed_amount_dec()).over(w).cast("double")
        .alias("customer_ltv"),
    )


_SEGMENT_RISK_ORACLE = f"""
SELECT event_id, user_id, ts, event_type, value,
       CASE WHEN user_id % 7 = 0 THEN 'anonymous'
            WHEN event_type = 'signup' THEN 'new'
            WHEN event_type = 'purchase' AND value > {RISK_MID_AMOUNT} THEN 'vip'
            WHEN event_type = 'purchase' AND value > 50 THEN 'wholesale'
            WHEN event_type = 'error' THEN 'return_customer'
            ELSE 'regular' END AS user_segment,
       least(1.0,
             (CASE WHEN event_type = 'purchase' AND value > {RISK_MID_AMOUNT}
                   THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN event_type = 'signup' THEN 0.2 ELSE 0.0 END)
             + (CASE WHEN value > {RISK_HIGH_AMOUNT} THEN 0.5
                     WHEN value > {RISK_MID_AMOUNT} THEN 0.2
                     ELSE 0.0 END)) AS risk_score
FROM events
"""


def segment_expr() -> F.Column:
    """P13 user-segment CASE (EnrichmentFunction.java:38-52) — shared by
    the batch query and the streaming/Kafka enrichment pipeline."""
    v = F.col("value")
    is_hv_purchase = (F.col("event_type") == "purchase") & (v > RISK_MID_AMOUNT)
    return (
        F.when(F.col("user_id") % 7 == 0, "anonymous")
        .when(F.col("event_type") == "signup", "new")
        .when(is_hv_purchase, "vip")
        .when((F.col("event_type") == "purchase") & (v > 50), "wholesale")
        .when(F.col("event_type") == "error", "return_customer")
        .otherwise("regular")
    )


def risk_expr() -> F.Column:
    """P14 capped additive risk score (EnrichmentFunction.java:132-168)."""
    v = F.col("value")
    is_hv_purchase = (F.col("event_type") == "purchase") & (v > RISK_MID_AMOUNT)
    return F.least(
        F.lit(1.0),
        F.when(is_hv_purchase, 0.3).otherwise(0.0)
        + F.when(F.col("event_type") == "signup", 0.2).otherwise(0.0)
        + F.when(v > RISK_HIGH_AMOUNT, 0.5)
        .when(v > RISK_MID_AMOUNT, 0.2).otherwise(0.0),
    )


@query(
    "segment_and_risk",
    _SEGMENT_RISK_ORACLE,
    doc="P13 user-segment CASE (EnrichmentFunction.java:38-52) + P14 "
        "capped additive risk score (:132-168) as pure column arithmetic. "
        "P15 processing_time is wall-clock and excluded from the "
        "deterministic output (it exists in the streaming sink path).",
    tags=("projection", "tier-a", "stream-parity"),
)
def q_segment_and_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id", "user_id", "ts", "event_type", "value",
        segment_expr().alias("user_segment"), risk_expr().alias("risk_score"),
    )


_FINAL_LTV_ORACLE = f"""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum({SIGNED_AMOUNT_DEC_SQL}) AS DOUBLE) AS final_ltv,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_returns
FROM events
GROUP BY user_id
"""


@query(
    "final_ltv_per_user",
    _FINAL_LTV_ORACLE,
    doc="A5 terminal state: the value the Flink ValueState would hold "
        "after the whole stream — a plain partial-aggregable groupBy "
        "(map-side combine, one shuffle), used as the streaming-parity "
        "invariant (SURVEY §5.2.5).",
    tags=("agg", "tier-a", "stream-parity"),
)
def q_final_ltv_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(signed_amount_dec()).cast("double").alias("final_ltv"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").alias("n_returns"),
    )
