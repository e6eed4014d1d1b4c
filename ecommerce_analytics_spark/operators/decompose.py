"""Classical additive seasonal decomposition of daily revenue.

The timeseries family already covers smoothing (EWMA, Holt, Holt-
Winters) and detection (z-score/MAD anomalies, CUSUM changepoints);
what it lacks is the *decomposition* view — the `statsmodels
seasonal_decompose` / STL shape every BI stack exposes: observed =
trend + seasonal + residual. This is the classical moving-average
variant (Kendall & Stuart; the `seasonal_decompose(model="additive")`
algorithm) over the per-event-type daily revenue series:

- trend_t    = centered 7-day moving average (defined only where the
  window holds a full 7 rows — the classic edge-NaN behavior),
- seasonal_d = mean of the detrended values per day-of-week slot
  (uncentered: we skip the subtract-the-grand-mean step so every
  quantity stays an exact integer ratio — documented deviation),
- residual_t = observed - trend - seasonal.

Cross-engine exactness (the [[numerics]] discipline): the daily series
reduces to exact BIGINT cents c_t first. Then every output is a SINGLE
division of exact integers, so both engines produce the identical IEEE
double:

    trend_t    = sum7_t / 700                      (sum7 = 7-day cent sum)
    detrend7_t = 7*c_t - sum7_t                    (exact BIGINT)
    seasonal_d = s_d / (700 * n_d)                 (s_d = sum detrend7)
    residual_t = (7*n_d*c_t - n_d*sum7_t - s_d) / (700 * n_d)

(the residual numerator is the exact common-denominator form of
observed - trend - seasonal — no chained float subtraction anywhere).
Day-of-week slots are epoch-day mod 7 (identical integer arithmetic in
both engines; 0 = Thursday, it is an index not a label).

Integer headroom: |detrend7| <= 7*max_day_cents; the residual
numerator <= 7*n_d*max_day_cents — with day totals ~1e8 cents and
n_d ~ 1e3 (a 20-year series) that is ~1e12, far inside BIGINT. ANSI
mode keeps any 100 TB overflow loud.

Scale shape: ONE (event_type, day) aggregation over the fact table —
the only data-sized shuffle; the windows/joins after it run on the
reduced series (days x types rows). The rows-window partitions by
event_type, so no single-partition WindowExec on the raw facts. At
100 TB the daily series is still tiny (dates x types); this is the
same pre-aggregate-then-analyze shape as [[ewma_daily_revenue]]
(timeseries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import cents_sql
from ecommerce_analytics_spark.plans.registry import query

_DECOMP_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum({cents_sql("value")}) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), w AS (
  SELECT event_type, day, c,
         CASE WHEN count(*) OVER win = 7
              THEN CAST(sum(c) OVER win AS BIGINT) END AS sum7
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dw AS (
  SELECT event_type, day, c, sum7,
         date_diff('day', DATE '1970-01-01', day) % 7 AS dow,
         7 * c - sum7 AS det7
  FROM w
), seas AS (
  SELECT event_type, dow,
         CAST(sum(det7) AS BIGINT) AS s_d,
         CAST(count(*) AS BIGINT) AS n_d
  FROM dw WHERE det7 IS NOT NULL
  GROUP BY event_type, dow
)
SELECT dw.event_type,
       strftime(dw.day, '%Y-%m-%d') AS day,
       CAST(dw.dow AS BIGINT) AS dow,
       CAST(dw.c AS DOUBLE) / 100 AS revenue,
       CAST(dw.sum7 AS DOUBLE) / 700 AS trend,
       CAST(s.s_d AS DOUBLE) / CAST(700 * s.n_d AS DOUBLE) AS seasonal,
       CAST(7 * s.n_d * dw.c - s.n_d * dw.sum7 - s.s_d AS DOUBLE)
         / CAST(700 * s.n_d AS DOUBLE) AS residual
FROM dw
LEFT JOIN seas s ON s.event_type = dw.event_type AND s.dow = dw.dow
"""


@query(
    "seasonal_decompose_daily",
    _DECOMP_ORACLE,
    doc="Classical additive seasonal decomposition (the "
        "seasonal_decompose(model='additive') algorithm) of per-type "
        "daily revenue: trend = centered 7-day moving average (NULL "
        "at the <7-row edges), seasonal = per day-of-week-slot mean "
        "of the detrended series (uncentered — documented deviation "
        "keeping every quantity an exact integer ratio), residual = "
        "observed - trend - seasonal via its exact common-denominator "
        "BIGINT numerator. One fact-table shuffle to BIGINT daily "
        "cents; windows and the seasonal join run on the reduced "
        "dates-x-types series, partitioned by event_type (no global "
        "single-partition window).",
    tags=("timeseries", "window", "agg", "north-star"),
)
def q_seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (events
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .cast("bigint").alias("c")))

    win = (Window.partitionBy("event_type").orderBy("day")
           .rowsBetween(-3, 3))
    w = daily.select(
        "event_type", "day", "c",
        F.when(F.count(F.lit(1)).over(win) == 7,
               F.sum("c").over(win).cast("bigint")).alias("sum7"))

    dw = w.select(
        "event_type", "day", "c", "sum7",
        (F.datediff("day", F.to_date(F.lit("1970-01-01"))) % 7)
        .cast("bigint").alias("dow"),
        (7 * F.col("c") - F.col("sum7")).alias("det7"))

    seas = (dw.filter(F.col("det7").isNotNull())
            .groupBy("event_type", "dow")
            .agg(F.sum("det7").cast("bigint").alias("s_d"),
                 F.count(F.lit(1)).cast("bigint").alias("n_d")))

    return (
        dw.join(seas, ["event_type", "dow"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dow",
            (F.col("c").cast("double") / 100).alias("revenue"),
            (F.col("sum7").cast("double") / 700).alias("trend"),
            (F.col("s_d").cast("double")
             / (700 * F.col("n_d")).cast("double")).alias("seasonal"),
            ((7 * F.col("n_d") * F.col("c")
              - F.col("n_d") * F.col("sum7") - F.col("s_d")).cast("double")
             / (700 * F.col("n_d")).cast("double")).alias("residual"))
    )


# ---------------------------------------------------------------------------
# Rolling regression: trailing 28-day revenue slope per type

ROLL_N = 28
_DEC = "decimal(38,0)"

_ROLL_ORACLE = f"""
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), w AS (
  SELECT event_type, d, y,
         count(*) OVER win AS k,
         CAST(sum(d) OVER win AS HUGEINT) AS sx,
         CAST(sum(y) OVER win AS HUGEINT) AS sy,
         CAST(sum(CAST(d AS HUGEINT) * y) OVER win AS HUGEINT) AS sxy,
         CAST(sum(CAST(d AS HUGEINT) * d) OVER win AS HUGEINT) AS sxx
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY d
                 ROWS BETWEEN {ROLL_N - 1} PRECEDING AND CURRENT ROW)
)
SELECT event_type,
       strftime(DATE '1970-01-01' + INTERVAL (d) DAY, '%Y-%m-%d') AS day,
       round(CAST({ROLL_N} * sxy - sx * sy AS DOUBLE)
             / CAST({ROLL_N} * sxx - sx * sx AS DOUBLE) / 100, 6)
         AS slope_dollars_per_day
FROM w WHERE k = {ROLL_N}
"""


@query(
    "rolling_28d_revenue_slope",
    _ROLL_ORACLE,
    doc=f"Rolling regression: per event type and day, the OLS slope "
        f"of daily revenue over the trailing {ROLL_N}-day window "
        f"(emitted only on full windows) — the trend-detection "
        f"sibling of the decomposition's global trend. All window "
        f"moment sums are exact integers (epoch-day x, BIGINT cents "
        f"y, HUGEINT/DECIMAL(38,0) products), the slope one division "
        f"of exact integers scaled to dollars/day. Same "
        f"pre-aggregate-then-window shape: one fact shuffle to daily "
        f"cents, windows on the dates x types series.",
    tags=("timeseries", "window", "stats"),
)
def q_rolling_28d_revenue_slope(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (events
             .groupBy("event_type",
                      F.datediff(F.to_date("ts"),
                                 F.to_date(F.lit("1970-01-01"))).alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .cast("bigint").alias("y")))
    win = (Window.partitionBy("event_type").orderBy("d")
           .rowsBetween(-(ROLL_N - 1), 0))
    w = daily.select(
        "event_type", "d",
        F.count(F.lit(1)).over(win).alias("k"),
        F.sum(F.col("d").cast(_DEC)).over(win).cast(_DEC).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).over(win).cast(_DEC).alias("sy"),
        F.sum(F.col("d").cast(_DEC) * F.col("y")).over(win).cast(_DEC)
        .alias("sxy"),
        F.sum(F.col("d").cast(_DEC) * F.col("d")).over(win).cast(_DEC)
        .alias("sxx"))
    num = (F.lit(ROLL_N).cast(_DEC) * F.col("sxy")
           - F.col("sx") * F.col("sy"))
    den = (F.lit(ROLL_N).cast(_DEC) * F.col("sxx")
           - F.col("sx") * F.col("sx"))
    return (w.filter(F.col("k") == ROLL_N)
            .select("event_type",
                    F.date_format(
                        F.date_add(F.to_date(F.lit("1970-01-01")), "d"),
                        "yyyy-MM-dd").alias("day"),
                    F.round(num.cast("double") / den.cast("double") / 100,
                            6).alias("slope_dollars_per_day")))


# ---------------------------------------------------------------------------
# Residual diagnostics: Durbin-Watson + lag-1 autocorrelation

RESID_FIX = 1_000_000  # 1e-6 fixed point for residual products


_RESID_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum({{cents}}) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), w AS (
  SELECT event_type, day, c,
         CASE WHEN count(*) OVER win = 7
              THEN CAST(sum(c) OVER win AS BIGINT) END AS sum7
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), dw AS (
  SELECT event_type, day, c, sum7,
         date_diff('day', DATE '1970-01-01', day) % 7 AS dow,
         7 * c - sum7 AS det7
  FROM w
), seas AS (
  SELECT event_type, dow,
         CAST(sum(det7) AS BIGINT) AS s_d,
         CAST(count(*) AS BIGINT) AS n_d
  FROM dw WHERE det7 IS NOT NULL
  GROUP BY event_type, dow
), resid AS (
  SELECT dw.event_type, dw.day,
         CAST(7 * s.n_d * dw.c - s.n_d * dw.sum7 - s.s_d AS DOUBLE)
           / CAST(700 * s.n_d AS DOUBLE) AS e
  FROM dw JOIN seas s ON s.event_type = dw.event_type
                     AND s.dow = dw.dow
  WHERE dw.det7 IS NOT NULL
), lagged AS (
  SELECT event_type, e,
         lag(e) OVER (PARTITION BY event_type ORDER BY day) AS e1
  FROM resid
), terms AS (
  SELECT event_type,
         CAST(round(e * e * {RESID_FIX}) AS BIGINT) AS ee,
         CASE WHEN e1 IS NOT NULL THEN
           CAST(round((e - e1) * (e - e1) * {RESID_FIX}) AS BIGINT)
         END AS dd,
         CASE WHEN e1 IS NOT NULL THEN
           CAST(round(e * e1 * {RESID_FIX}) AS BIGINT)
         END AS ce
  FROM lagged
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_resid,
       round(CAST(sum(dd) AS DOUBLE) / CAST(sum(ee) AS DOUBLE), 6)
         AS durbin_watson,
       round(CAST(sum(ce) AS DOUBLE) / CAST(sum(ee) AS DOUBLE), 6)
         AS lag1_autocorr
FROM terms GROUP BY event_type
"""


@query(
    "residual_autocorrelation",
    _RESID_ORACLE.format(cents=cents_sql("value")),
    doc="Residual-whiteness diagnostics for the seasonal "
        "decomposition: per event type, the Durbin-Watson statistic "
        "sum((e_t - e_{t-1})^2) / sum(e_t^2) (white residuals ~ 2) "
        "and the lag-1 autocorrelation sum(e_t * e_{t-1}) / "
        "sum(e_t^2) over day-ordered trend-defined residuals. Each "
        "residual is one exact-integer division (the decomposition's "
        "common-denominator form), products of two identical doubles "
        "snap to 1e-6 fixed point before the associative integer "
        "sums, and both statistics are single divisions of exact "
        "integers. Same reduced-series shape as the decomposition.",
    tags=("timeseries", "stats", "window"),
)
def q_residual_autocorrelation(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (events
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .cast("bigint").alias("c")))
    win = (Window.partitionBy("event_type").orderBy("day")
           .rowsBetween(-3, 3))
    w = daily.select(
        "event_type", "day", "c",
        F.when(F.count(F.lit(1)).over(win) == 7,
               F.sum("c").over(win).cast("bigint")).alias("sum7"))
    dw = w.select(
        "event_type", "day", "c", "sum7",
        (F.datediff("day", F.to_date(F.lit("1970-01-01"))) % 7)
        .cast("bigint").alias("dow"),
        (7 * F.col("c") - F.col("sum7")).alias("det7"))
    seas = (dw.filter(F.col("det7").isNotNull())
            .groupBy("event_type", "dow")
            .agg(F.sum("det7").cast("bigint").alias("s_d"),
                 F.count(F.lit(1)).cast("bigint").alias("n_d")))
    resid = (dw.filter(F.col("det7").isNotNull())
             .join(seas, ["event_type", "dow"])
             .select("event_type", "day",
                     ((7 * F.col("n_d") * F.col("c")
                       - F.col("n_d") * F.col("sum7") - F.col("s_d"))
                      .cast("double")
                      / (700 * F.col("n_d")).cast("double")).alias("e")))
    w_lag = Window.partitionBy("event_type").orderBy("day")
    lagged = resid.select(
        "event_type", "e", F.lag("e").over(w_lag).alias("e1"))
    terms = lagged.select(
        "event_type",
        F.round(F.col("e") * F.col("e") * RESID_FIX).cast("bigint")
        .alias("ee"),
        F.when(F.col("e1").isNotNull(),
               F.round((F.col("e") - F.col("e1"))
                       * (F.col("e") - F.col("e1")) * RESID_FIX)
               .cast("bigint")).alias("dd"),
        F.when(F.col("e1").isNotNull(),
               F.round(F.col("e") * F.col("e1") * RESID_FIX)
               .cast("bigint")).alias("ce"))
    return (terms.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_resid"),
                 F.round(F.sum("dd").cast("double")
                         / F.sum("ee").cast("double"), 6)
                 .alias("durbin_watson"),
                 F.round(F.sum("ce").cast("double")
                         / F.sum("ee").cast("double"), 6)
                 .alias("lag1_autocorr")))
