"""Retail economics: cohort LTV curves and log-log price elasticity.

Two classic commercial analytics the BI families ([[weekly_cohort_retention]],
[[ols_weekend_trend]]) don't yet cover:

``cohort_ltv_curve`` — the LTV companion of cohort retention: for
each first-order month cohort, cumulative revenue by cohort age in
months and cumulative revenue per cohort customer. Exact BIGINT cents
throughout; the running total is a per-cohort age-ordered window sum
of exact integers and the per-customer value one division of exact
ints — fully hash-deterministic. Month arithmetic is date_trunc +
calendar month difference, identical in both engines.

``price_elasticity_by_brand`` — the textbook own-price elasticity
estimate: per part brand, OLS slope of ln(quantity) on ln(unit
price) across lineitem observations. Log-log OLS on floats cannot
hash-match, so the inputs enter the [[numerics]] pipeline first:
x = ln(extendedprice_cents / quantity) and y = ln(quantity) are each
ONE ln() of a single exact-integer ratio, snapped to 1e-9 fixed
point; the moment sums (n, Σx, Σy, Σxy, Σxx) then run in exact
DECIMAL(38,0)/HUGEINT arithmetic (per-row x*y ~ 1e21 exceeds BIGINT —
the [[ols_weekend_trend]] normal-equations discipline), and slope =
(nΣxy - ΣxΣy) / (nΣxx - Σx²) is one division of exact integers. The
1e-9 fixed-point scale cancels in the slope, so the output is the
dimensionless elasticity directly.

Scale shape: LTV is one orders shuffle for first-order dates + one
(cohort, month) aggregation; windows run on the cohorts x ages
series. Elasticity is one broadcast part-dim join + one per-brand
moment aggregate (map-side combinable). No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

LOG_FIX = 1_000_000_000
_DEC = "decimal(38,0)"

_LTV_ORACLE = """
WITH dated AS (
  -- an undated order has no place on a time curve: it can neither
  -- define a cohort nor land at an age offset (and NULL ages would
  -- order differently per engine inside the running sum)
  SELECT * FROM orders WHERE o_orderdate IS NOT NULL
), first_order AS (
  SELECT o_custkey,
         date_trunc('month', min(o_orderdate)) AS cohort
  FROM dated GROUP BY o_custkey
), sizes AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
  FROM first_order GROUP BY cohort
), rev AS (
  SELECT f.cohort,
         date_diff('month', f.cohort,
                   date_trunc('month', o.o_orderdate)) AS age_months,
         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM dated o JOIN first_order f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
), cum AS (
  SELECT cohort, age_months, rev_cents,
         CAST(sum(rev_cents) OVER (PARTITION BY cohort
                                   ORDER BY age_months) AS BIGINT)
           AS cum_cents
  FROM rev
)
SELECT strftime(c.cohort, '%Y-%m') AS cohort_month,
       CAST(c.age_months AS BIGINT) AS age_months,
       s.n_customers,
       CAST(c.rev_cents AS DOUBLE) / 100 AS period_revenue,
       CAST(c.cum_cents AS DOUBLE) / 100 AS cum_revenue,
       round(CAST(c.cum_cents AS DOUBLE)
             / CAST(100 * s.n_customers AS DOUBLE), 6)
         AS cum_ltv_per_customer
FROM cum c JOIN sizes s ON s.cohort = c.cohort
"""


@query(
    "cohort_ltv_curve",
    _LTV_ORACLE,
    doc="Cohort lifetime-value curves: per first-order-month cohort, "
        "period and cumulative revenue by cohort age in months plus "
        "cumulative LTV per cohort customer. Exact BIGINT cents, "
        "per-cohort age-ordered window sums of exact integers, and "
        "single exact-ratio divisions at the output edge. One orders "
        "shuffle for first-order dates, one (cohort, age) "
        "aggregation; windows on the cohorts x ages series.",
    tags=("retail", "window", "agg", "north-star"),
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    # undated orders are off the curve (see the oracle's dated CTE)
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderdate").isNotNull()))
    # referenced by BOTH the cohort-size aggregate and the revenue
    # join — without a cut each re-scans orders (3 surviving scans);
    # lazy persist of the customer-sized narrow frame leaves the
    # 2-pass floor (first-order discovery + the revenue join itself)
    first = (orders.groupBy("o_custkey")
             .agg(F.date_trunc("month", F.min("o_orderdate"))
                  .alias("cohort"))
             .persist())
    sizes = (first.groupBy("cohort")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers")))
    rev = (orders.join(first, "o_custkey")
           .groupBy("cohort",
                    (F.months_between(
                        F.date_trunc("month", F.col("o_orderdate")),
                        F.col("cohort"))).cast("bigint")
                    .alias("age_months"))
           .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                .cast("bigint").alias("rev_cents")))
    w = (Window.partitionBy("cohort").orderBy("age_months")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = rev.withColumn(
        "cum_cents", F.sum("rev_cents").over(w).cast("bigint"))
    return (cum.join(sizes, "cohort")
            .select(
                F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
                F.col("age_months"),
                "n_customers",
                (F.col("rev_cents").cast("double") / 100)
                .alias("period_revenue"),
                (F.col("cum_cents").cast("double") / 100)
                .alias("cum_revenue"),
                F.round(F.col("cum_cents").cast("double")
                        / (100 * F.col("n_customers")).cast("double"), 6)
                .alias("cum_ltv_per_customer")))


_ELASTICITY_ORACLE = f"""
WITH obs AS (
  SELECT p.p_brand,
         CAST(round(ln(CAST(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                            AS DOUBLE)
                       / CAST(CAST(l.l_quantity AS BIGINT) AS DOUBLE))
                    * {LOG_FIX}) AS BIGINT) AS x,
         CAST(round(ln(CAST(CAST(l.l_quantity AS BIGINT) AS DOUBLE))
                    * {LOG_FIX}) AS BIGINT) AS y
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  -- elasticity observations need positive price and quantity: ln() of
  -- a nonpositive value ERRORS in strict engines and NULLs in this
  -- one — the filter is the operator's domain, not defensiveness
  WHERE l.l_extendedprice > 0 AND l.l_quantity > 0
), m AS (
  SELECT p_brand, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM obs GROUP BY p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n_obs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS elasticity,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / {LOG_FIX}, 6) AS intercept_ln_qty
FROM m
"""


@query(
    "price_elasticity_by_brand",
    _ELASTICITY_ORACLE,
    doc="Own-price elasticity per part brand: OLS slope of "
        "ln(quantity) on ln(unit price) over lineitem. Both logs are "
        "one ln() of a single exact-integer ratio snapped to 1e-9 "
        "fixed point; moment sums run in exact DECIMAL(38,0)/HUGEINT "
        "(per-row x*y exceeds BIGINT); the slope is one division of "
        "exact integers and the fixed-point scale cancels, yielding "
        "the dimensionless elasticity directly. One broadcast "
        "part-dim join + one per-brand map-side-combinable moment "
        "aggregate.",
    tags=("retail", "ml", "stats", "north-star"),
)
def q_price_elasticity_by_brand(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    # ln() domain: positive price and quantity only (oracle twin)
    li = (load_table(spark, sf_dir, "lineitem")
          .filter((F.col("l_extendedprice") > 0) & (F.col("l_quantity") > 0)))
    part = load_table(spark, sf_dir, "part")
    obs = (li.join(F.broadcast(part.select("p_partkey", "p_brand")),
                   li.l_partkey == F.col("p_partkey"))
           .select(
               "p_brand",
               F.round(F.log(
                   F.expr("cast(round(l_extendedprice * 100) as bigint)")
                   .cast("double")
                   / F.col("l_quantity").cast("bigint").cast("double"))
                   * LOG_FIX).cast("bigint").alias("x"),
               F.round(F.log(F.col("l_quantity").cast("bigint")
                             .cast("double"))
                       * LOG_FIX).cast("bigint").alias("y")))
    m = (obs.groupBy("p_brand")
         .agg(F.count(F.lit(1)).cast(_DEC).alias("n"),
              F.sum(F.col("x").cast(_DEC)).cast(_DEC).alias("sx"),
              F.sum(F.col("y").cast(_DEC)).cast(_DEC).alias("sy"),
              F.sum(F.col("x").cast(_DEC) * F.col("y")).cast(_DEC)
              .alias("sxy"),
              F.sum(F.col("x").cast(_DEC) * F.col("x")).cast(_DEC)
              .alias("sxx")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slope = num.cast("double") / den.cast("double")
    return m.select(
        "p_brand", F.col("n").cast("bigint").alias("n_obs"),
        F.round(slope, 6).alias("elasticity"),
        F.round((F.col("sy").cast("double") - slope
                 * F.col("sx").cast("double"))
                / F.col("n").cast("double") / LOG_FIX, 6)
        .alias("intercept_ln_qty"))
