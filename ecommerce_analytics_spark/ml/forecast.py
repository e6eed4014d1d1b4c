"""Seasonal-baseline revenue forecasting (C5's second half,
README.md:61 'forecasting' — declared with a prophet dependency, never
implemented in the reference).

Model-free seasonal-naive forecast, fully oracle-checked: the forecast
for an hour is the average revenue of the same hour-of-day over the
trailing 7 days; residuals feed the same z-style monitoring as the
anomaly detector. (A learned model — prophet/ARIMA — would consume the
identical hourly series; this is the engine-side feature/baseline op.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import money_sum, money_sum_sql
from ecommerce_analytics_spark.plans.registry import query

TRAIL_DAYS = 7

_FORECAST_ORACLE = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_ts,
         CAST(hour(ts) AS INTEGER) AS hour_of_day,
         {money_sum_sql('value')} AS revenue
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT hour_ts, hour_of_day, revenue,
       round(avg(revenue) OVER w, 6) AS forecast,
       CAST(count(*) OVER w AS BIGINT) AS n_history,
       round(revenue - avg(revenue) OVER w, 6) AS residual
FROM hourly
WINDOW w AS (PARTITION BY hour_of_day ORDER BY hour_ts
             ROWS BETWEEN {TRAIL_DAYS} PRECEDING AND 1 PRECEDING)
"""


@query(
    "hourly_revenue_forecast",
    _FORECAST_ORACLE,
    doc=f"C5 forecasting: seasonal-naive hourly revenue forecast "
        f"(trailing-{TRAIL_DAYS}-day same-hour average) + residuals — "
        "window over the aggregated series partitioned by hour-of-day.",
    tags=("ml", "window", "tier-c"),
)
def q_hourly_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"),
                 F.hour("ts").alias("hour_of_day"))
        .agg(money_sum("value").alias("revenue"))
    )
    w = (Window.partitionBy("hour_of_day").orderBy("hour_ts")
         .rowsBetween(-TRAIL_DAYS, -1))
    return hourly.select(
        "hour_ts", "hour_of_day", "revenue",
        F.round(F.avg("revenue").over(w), 6).alias("forecast"),
        F.count(F.lit(1)).over(w).alias("n_history"),
        F.round(F.col("revenue") - F.avg("revenue").over(w), 6)
        .alias("residual"),
    )
