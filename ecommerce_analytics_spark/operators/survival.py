"""Kaplan-Meier survival analysis: time to second order.

The classic repeat-purchase question ("how long until a customer
comes back?") answered with the standard right-censored estimator
(Kaplan & Meier 1958; `lifelines.KaplanMeierFitter`): per customer,
duration = days from first to second order; customers without a
second order are CENSORED at the end of the observation window
(global max order date). At each distinct event time t:

    n_t = # at risk (duration >= t, events and censored alike)
    d_t = # second orders at exactly t
    S(t) = prod_{s <= t} (1 - d_s / n_s)

Cross-engine exactness: a cumulative PRODUCT of floats is
order-sensitive, so the estimator runs in LOG space under the LOG_FIX
discipline — each factor's log is one ln() of the exact integer ratio
(n_s - d_s) / n_s, snapped to 1e-9 fixed point, and the cumulative
product becomes a cumulative SUM of snapped BIGINTs over the (time-
ordered, hence deterministic) window; S(t) = exp(sum / FIX) is one
exp() of an identical double. If the largest event time exhausts the
risk set (n = d), its factor is 0: the snapped term is NULL there and
survival is emitted as exact 0.0 (a NULL-count window guard) — no
ln(0) anywhere. Snapping error: <= t_rank * 1e-9 in log space, ~1e-6
relative after exp at this SF.

Scale shape: one orders shuffle to per-customer (first, second) dates
(a groupBy after a keyed window), then the KM table is |distinct
durations| rows — the cumulative windows run on the reduced series
(same pre-aggregate-then-analyze shape as [[seasonal_decompose_daily]]
/ [[ewma_daily_revenue]]). The global censor date is a broadcast
one-row aggregate. At 100 TB the duration table is still bounded by
the day-count range. No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

LOG_FIX = 1_000_000_000  # 1e-9 fixed point for ln()

_KM_ORACLE = f"""
WITH km_orders AS (
  -- survival contract (both sides): an event needs a subject and a
  -- time (undated orders can't rank; a NULL custkey isn't a
  -- customer), and a duplicated ingest row must not fabricate a
  -- second order at t=0 — DISTINCT on the columns used
  SELECT DISTINCT o_custkey, o_orderkey, o_orderdate FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
), ranked AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate NULLS FIRST,
                                     o_orderkey NULLS FIRST) AS rn
  FROM km_orders
), cust AS (
  SELECT o_custkey,
         min(CASE WHEN rn = 1 THEN o_orderdate END) AS d1,
         min(CASE WHEN rn = 2 THEN o_orderdate END) AS d2
  FROM ranked GROUP BY o_custkey
), horizon AS (
  SELECT max(o_orderdate) AS mx FROM km_orders
), dur AS (
  SELECT CASE WHEN c.d2 IS NOT NULL
              THEN date_diff('day', c.d1, c.d2)
              ELSE date_diff('day', c.d1, h.mx) END AS t,
         CASE WHEN c.d2 IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM cust c CROSS JOIN horizon h
), agg AS (
  SELECT t, CAST(sum(e) AS BIGINT) AS d_t,
         CAST(count(*) AS BIGINT) AS c_t
  FROM dur GROUP BY t
), risk AS (
  SELECT t, d_t,
         CAST(sum(c_t) OVER (ORDER BY t DESC) AS BIGINT) AS n_t
  FROM agg
), terms AS (
  SELECT t, d_t, n_t,
         CASE WHEN n_t > d_t
              THEN CAST(round(ln(CAST(n_t - d_t AS DOUBLE)
                                 / CAST(n_t AS DOUBLE))
                              * {LOG_FIX}) AS BIGINT) END AS lf
  FROM risk WHERE d_t >= 1
), cum AS (
  SELECT t, d_t, n_t,
         -- ADVICE r7 #5: NULLS FIRST on every ASC oracle key, even
         -- keys non-NULL by construction (trap rule #1)
         sum(lf) OVER (ORDER BY t NULLS FIRST) AS cum_lf,
         count(*) OVER (ORDER BY t NULLS FIRST)
           - count(lf) OVER (ORDER BY t NULLS FIRST) AS n_dead_ends
  FROM terms
)
SELECT CAST(t AS BIGINT) AS t_days, n_t AS n_at_risk, d_t AS n_events,
       CASE WHEN n_dead_ends > 0 THEN 0.0
            ELSE round(exp(CAST(cum_lf AS DOUBLE) / {LOG_FIX}), 6)
       END AS survival
FROM cum
"""


@query(
    "km_second_order_survival",
    _KM_ORACLE,
    doc="Kaplan-Meier estimator of time-to-second-order with right "
        "censoring at the global max order date: per event time, the "
        "risk set (reverse cumulative count), event count, and the "
        "survival curve computed in log space — each factor ln((n-d)/n) "
        "is one ln of an exact integer ratio snapped to 1e-9 fixed "
        "point, the cumulative product a deterministic time-ordered "
        "BIGINT window sum, S = exp of one identical double; a "
        "risk-set-exhausting last event emits exact 0.0 via a "
        "NULL-count guard. One orders shuffle to per-customer dates; "
        "the KM table is duration-bounded.",
    tags=("stats", "timeseries", "window", "north-star"),
)
def q_km_second_order_survival(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    # survival contract — the oracle's km_orders CTE twin
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_custkey").isNotNull()
                      & F.col("o_orderdate").isNotNull())
              .select("o_custkey", "o_orderkey", "o_orderdate")
              .distinct())
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select("o_custkey", "o_orderdate",
                           F.row_number().over(w).alias("rn"))
    cust = (ranked.groupBy("o_custkey")
            .agg(F.min(F.when(F.col("rn") == 1,
                              F.col("o_orderdate"))).alias("d1"),
                 F.min(F.when(F.col("rn") == 2,
                              F.col("o_orderdate"))).alias("d2")))
    horizon = orders.agg(F.max("o_orderdate").alias("mx"))
    dur = (cust.crossJoin(F.broadcast(horizon))
           .select(
               F.when(F.col("d2").isNotNull(),
                      F.datediff("d2", "d1"))
               .otherwise(F.datediff("mx", "d1")).alias("t"),
               F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("e")))
    agg = (dur.groupBy("t")
           .agg(F.sum("e").cast("bigint").alias("d_t"),
                F.count(F.lit(1)).cast("bigint").alias("c_t")))
    w_desc = Window.orderBy(F.col("t").desc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = agg.select(
        "t", "d_t",
        F.sum("c_t").over(w_desc).cast("bigint").alias("n_t"))
    terms = (risk.filter(F.col("d_t") >= 1)
             .select("t", "d_t", "n_t",
                     F.when(F.col("n_t") > F.col("d_t"),
                            F.round(F.log((F.col("n_t") - F.col("d_t"))
                                          .cast("double")
                                          / F.col("n_t").cast("double"))
                                    * LOG_FIX).cast("bigint"))
                     .alias("lf")))
    w_asc = Window.orderBy("t") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = terms.select(
        "t", "d_t", "n_t",
        F.sum("lf").over(w_asc).alias("cum_lf"),
        (F.count(F.lit(1)).over(w_asc) - F.count("lf").over(w_asc))
        .alias("n_dead_ends"))
    return cum.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_t").alias("n_at_risk"),
        F.col("d_t").alias("n_events"),
        F.when(F.col("n_dead_ends") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_lf").cast("double") / LOG_FIX),
                           6)).alias("survival"))
