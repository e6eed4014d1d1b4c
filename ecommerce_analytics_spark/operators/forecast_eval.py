"""Forecast backtesting: Holt one-step-ahead errors vs seasonal naive.

A forecaster without a backtest is a guess — production forecasting
evaluates every model against held-out one-step-ahead errors and a
naive baseline (Hyndman & Athanasopoulos, "Forecasting: Principles
and Practice"; the M-competition protocol). This scores the certified
[[holt_linear_daily_revenue]] model per event type:

- model forecast for day t  = forecast_next emitted at day t-1
  (lag 1 over the type's day series),
- baseline forecast for t   = revenue at t-7 (seasonal naive),
- scored on days where BOTH exist (rank >= 8), so the comparison is
  paired;
- MAE and MAPE per model, and the skill score
  1 - MAE_model / MAE_naive (positive = the model beats the
  baseline).

Cross-engine exactness: the Holt doubles are already bit-equal across
engines (the recursive-CTE certification); each |error| and each
|error|/actual is a per-row expression over those identical doubles,
snapped to fixed point (1e-6 dollars / 1e-9 ratio) BEFORE the
order-sensitive aggregation, so the sums are associative BIGINT adds
and MAE/MAPE/skill are single divisions of exact integers.

Scale shape: composes the Holt query (one fact shuffle + per-type
recurrence on the daily series); the backtest adds two lag windows
and one per-type aggregate on the dates x types series. No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.numerics import money_sum_sql
from ecommerce_analytics_spark.plans.registry import query

ERR_FIX = 1_000_000      # 1e-6 dollars
APE_FIX = 1_000_000_000  # 1e-9 ratio

_BACKTEST_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         {money_sum_sql("value")} AS rev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(ts AS DATE)) AS rn
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
holt AS (
  SELECT event_type, day, rn, rev,
         rev AS lvl, CAST(0.0 AS DOUBLE) AS trend
  FROM daily WHERE rn = 1
  UNION ALL
  SELECT d.event_type, d.day, d.rn, d.rev,
         0.5 * d.rev + 0.5 * (h.lvl + h.trend) AS lvl,
         0.5 * ((0.5 * d.rev + 0.5 * (h.lvl + h.trend)) - h.lvl)
           + 0.5 * h.trend AS trend
  FROM daily d
  JOIN holt h ON d.event_type = h.event_type AND d.rn = h.rn + 1
),
fc AS (
  SELECT event_type, day, rev,
         lag(lvl + trend) OVER w AS model_fc,
         lag(rev, 7) OVER w AS naive_fc
  FROM holt
  WINDOW w AS (PARTITION BY event_type ORDER BY rn)
),
scored AS (
  SELECT event_type,
         CAST(round(abs(rev - model_fc) * {ERR_FIX}) AS BIGINT)
           AS model_err_fix,
         CAST(round(abs(rev - naive_fc) * {ERR_FIX}) AS BIGINT)
           AS naive_err_fix,
         CAST(round(abs(rev - model_fc) / rev * {APE_FIX}) AS BIGINT)
           AS model_ape_fix
  FROM fc WHERE model_fc IS NOT NULL AND naive_fc IS NOT NULL
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       round(CAST(sum(model_err_fix) AS DOUBLE)
             / count(*) / {ERR_FIX}, 6) AS mae_model,
       round(CAST(sum(naive_err_fix) AS DOUBLE)
             / count(*) / {ERR_FIX}, 6) AS mae_naive,
       round(CAST(sum(model_ape_fix) AS DOUBLE)
             / count(*) / {APE_FIX}, 6) AS mape_model,
       round(1.0 - CAST(sum(model_err_fix) AS DOUBLE)
                   / CAST(sum(naive_err_fix) AS DOUBLE), 6)
         AS skill_vs_naive
FROM scored GROUP BY event_type
"""


@query(
    "holt_forecast_backtest",
    _BACKTEST_ORACLE,
    doc="Forecast backtest of the certified Holt model per event "
        "type: paired one-step-ahead errors (model = lagged "
        "forecast_next, baseline = seasonal-naive lag-7 revenue, "
        "scored where both exist), MAE/MAPE and the skill score "
        "1 - MAE_model/MAE_naive. Per-row |error| expressions run "
        "over the bit-equal Holt doubles and snap to fixed point "
        "BEFORE aggregation, so the sums are associative BIGINT adds "
        "and every output is a single exact-integer division. "
        "Composes the Holt recurrence; adds two lag windows + one "
        "aggregate on the daily series.",
    tags=("timeseries", "forecast", "ml", "north-star"),
)
def q_holt_forecast_backtest(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.plans.registry import QUERIES
    holt = QUERIES["holt_linear_daily_revenue"].spark_fn(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    fc = holt.select(
        "event_type", "rev",
        F.lag("forecast_next").over(w).alias("model_fc"),
        F.lag("rev", 7).over(w).alias("naive_fc"))
    scored = (fc.filter(F.col("model_fc").isNotNull()
                        & F.col("naive_fc").isNotNull())
              .select(
                  "event_type",
                  F.round(F.abs(F.col("rev") - F.col("model_fc"))
                          * ERR_FIX).cast("bigint").alias("model_err_fix"),
                  F.round(F.abs(F.col("rev") - F.col("naive_fc"))
                          * ERR_FIX).cast("bigint").alias("naive_err_fix"),
                  F.round(F.abs(F.col("rev") - F.col("model_fc"))
                          / F.col("rev") * APE_FIX).cast("bigint")
                  .alias("model_ape_fix")))
    return (scored.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"),
                 F.round(F.sum("model_err_fix").cast("double")
                         / F.count(F.lit(1)) / ERR_FIX, 6)
                 .alias("mae_model"),
                 F.round(F.sum("naive_err_fix").cast("double")
                         / F.count(F.lit(1)) / ERR_FIX, 6)
                 .alias("mae_naive"),
                 F.round(F.sum("model_ape_fix").cast("double")
                         / F.count(F.lit(1)) / APE_FIX, 6)
                 .alias("mape_model"),
                 F.round(1.0 - F.sum("model_err_fix").cast("double")
                         / F.sum("naive_err_fix").cast("double"), 6)
                 .alias("skill_vs_naive")))
