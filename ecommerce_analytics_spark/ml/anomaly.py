"""Anomaly detection — rolling z-score over the revenue series (C5,
README.md:61). Pure window arithmetic (no model), so it is fully
oracle-checked: hourly revenue → trailing mean/stddev over the prior
24 windows → flag |z| > 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import money_sum, money_sum_sql
from ecommerce_analytics_spark.plans.registry import query

TRAIL = 24
Z_FLAG = 3.0

_ANOMALY_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_ts, {money_sum_sql('value')} AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY date_trunc('hour', ts)
),
rolled AS (
  SELECT hour_ts, revenue,
         round(avg(revenue) OVER w, 6) AS trailing_mean,
         round(coalesce(stddev_samp(revenue) OVER w, 0.0), 6) AS trailing_std,
         CAST(count(*) OVER w AS BIGINT) AS n_trailing
  FROM hourly
  WINDOW w AS (ORDER BY hour_ts ROWS BETWEEN {TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT hour_ts, revenue, trailing_mean, trailing_std, n_trailing,
       round(CASE WHEN trailing_std > 0
                  THEN (revenue - trailing_mean) / trailing_std
                  ELSE 0.0 END, 4) AS z_score,
       (n_trailing >= 12 AND trailing_std > 0
        AND abs((revenue - trailing_mean) / trailing_std) > {Z_FLAG})
         AS is_anomaly
FROM rolled
"""


@query(
    "revenue_anomaly_zscore",
    _ANOMALY_ORACLE,
    doc=f"C5 anomaly detection: trailing-{TRAIL}-window z-score on hourly "
        f"revenue, flag |z| > {Z_FLAG} with a warm-up guard. One window "
        "spec over the (tiny) hourly series — the fact-table work is the "
        "same partial-agg as hourly_revenue.",
    tags=("ml", "window", "tier-c"),
)
def q_revenue_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(money_sum("value").alias("revenue"))
    )
    w = Window.orderBy("hour_ts").rowsBetween(-TRAIL, -1)
    rolled = hourly.select(
        "hour_ts", "revenue",
        F.round(F.avg("revenue").over(w), 6).alias("trailing_mean"),
        F.round(F.coalesce(F.stddev_samp("revenue").over(w), F.lit(0.0)), 6)
        .alias("trailing_std"),
        F.count(F.lit(1)).over(w).alias("n_trailing"),
    )
    z = F.when(F.col("trailing_std") > 0,
               (F.col("revenue") - F.col("trailing_mean"))
               / F.col("trailing_std")).otherwise(0.0)
    return rolled.select(
        "hour_ts", "revenue", "trailing_mean", "trailing_std", "n_trailing",
        F.round(z, 4).alias("z_score"),
        ((F.col("n_trailing") >= 12) & (F.col("trailing_std") > 0)
         & (F.abs(z) > Z_FLAG)).alias("is_anomaly"),
    )


MAD_FLAG = 3.5  # Iglewicz–Hoaglin modified-z cutoff
MAD_CONSISTENCY = 0.6745  # Φ⁻¹(0.75): MAD→σ consistency constant

_MAD_ORACLE = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day_ts,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY date_trunc('day', ts)
),
med AS (
  SELECT *, median(cents) OVER () AS med_cents FROM daily
),
mad AS (
  SELECT *, median(abs(cents - med_cents)) OVER () AS mad_cents FROM med
)
SELECT day_ts,
       round(cents * 0.01, 2) AS revenue,
       round(med_cents * 0.01, 2) AS median_revenue,
       round(mad_cents * 0.01, 2) AS mad_revenue,
       round(CASE WHEN mad_cents > 0
                  THEN {MAD_CONSISTENCY} * (cents - med_cents) / mad_cents
                  ELSE 0.0 END, 4) AS robust_z,
       (mad_cents > 0
        AND abs({MAD_CONSISTENCY} * (cents - med_cents) / mad_cents)
            > {MAD_FLAG}) AS is_anomaly
FROM mad
"""


@query(
    "revenue_anomaly_mad",
    _MAD_ORACLE,
    doc="C5 robust twin of the z-score detector: median/MAD modified "
        f"z-score (Iglewicz–Hoaglin, flag |z| > {MAD_FLAG}) on daily "
        "revenue — outliers cannot inflate their own detection "
        "threshold the way they inflate a stddev. All statistics run "
        "on exact integer cents (medians of ints are ints or .5s — "
        "exact in DOUBLE), so both engines compute bit-identical "
        "medians; the consistency-constant multiply and division are "
        "single IEEE ops rounded identically. Medians are windows over "
        "the DAILY rollup (bounded by the calendar), never raw facts.",
    tags=("ml", "window", "tier-c", "robust"),
)
def q_revenue_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    from ecommerce_analytics_spark.numerics import cents
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day_ts"))
        .agg(F.sum(cents("value")).cast("double").alias("cents"))
    )
    w_all = Window.partitionBy()
    med = daily.withColumn(
        "med_cents", F.expr("percentile(cents, 0.5)").over(w_all))
    mad = med.withColumn(
        "mad_cents",
        F.expr("percentile(abs(cents - med_cents), 0.5)").over(w_all))
    z = F.when(F.col("mad_cents") > 0,
               MAD_CONSISTENCY * (F.col("cents") - F.col("med_cents"))
               / F.col("mad_cents")).otherwise(0.0)
    return mad.select(
        "day_ts",
        F.round(F.col("cents") * 0.01, 2).alias("revenue"),
        F.round(F.col("med_cents") * 0.01, 2).alias("median_revenue"),
        F.round(F.col("mad_cents") * 0.01, 2).alias("mad_revenue"),
        F.round(z, 4).alias("robust_z"),
        ((F.col("mad_cents") > 0) & (F.abs(z) > MAD_FLAG))
        .alias("is_anomaly"),
    )
