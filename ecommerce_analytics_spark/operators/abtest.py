"""Experimentation statistics: one-way ANOVA and two-proportion z.

Completes the classic-test family (KS / chi-square / Mann-Whitney in
stats_tests.py, OLS in regression.py) with the two workhorses of
product experimentation, both reduced to exact integer counting
statistics in ONE map-side-combined aggregation:

* ``anova_dayofweek_revenue`` — one-way ANOVA of daily purchase
  revenue across the 7 days of week. The per-group between-variance
  terms S_g^2/n_g are quantized to fixed point BEFORE the exact
  integer sum (float SUM order is unspecified in both engines — the
  chi-square precedent); the grand-mean correction and the final
  F-ratio are single fixed double expressions over exact sums.
* ``abtest_weekend_conversion`` — weekend-vs-weekday purchase
  conversion as a two-proportion z-test with pooled variance, plus
  the absolute lift. All counts exact integers from one conditional
  aggregate; only the final rate/z divisions are floats, written
  identically on both engines.

Both plans collapse the fact table to a ≤7-row statistic table in one
exchange; nothing downstream grows with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

_DEC = "decimal(38,0)"
ANOVA_FIX = 1_000_000

_ANOVA_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, isodow(CAST(ts AS DATE)) AS dow,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), g AS (
  SELECT dow, CAST(count(*) AS HUGEINT) AS ng, sum(y) AS sg
  FROM daily GROUP BY dow
), tot AS (
  SELECT CAST(sum(ng) AS HUGEINT) AS n, CAST(sum(sg) AS HUGEINT) AS s,
         CAST(count(*) AS BIGINT) AS k,
         CAST(sum(CAST(round(CAST(sg * sg AS DOUBLE)
                             / CAST(ng AS DOUBLE) * {ANOVA_FIX})
                       AS HUGEINT)) AS HUGEINT) AS ssb_fix,
         (SELECT sum(y * y) FROM daily) AS syy
  FROM g
), f AS (
  SELECT n, k,
         CAST(ssb_fix AS DOUBLE) / {ANOVA_FIX}
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             / CAST(n AS DOUBLE) AS ssb,
         CAST(syy AS DOUBLE)
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             / CAST(n AS DOUBLE) AS sst
  FROM tot
)
SELECT CAST(n AS BIGINT) AS n_days, k AS k_groups,
       k - 1 AS df1, CAST(n AS BIGINT) - k AS df2,
       round((ssb / CAST(k - 1 AS DOUBLE))
             / ((sst - ssb) / CAST(CAST(n AS BIGINT) - k AS DOUBLE)),
             6) AS f_stat,
       round(ssb / sst, 6) AS eta_sq
FROM f
"""


@query(
    "anova_dayofweek_revenue",
    _ANOVA_ORACLE,
    doc="One-way ANOVA of daily purchase revenue across days of week: "
        "is the day-of-week effect real? Between-group terms "
        "S_g^2/n_g quantize to 1e-6 fixed point before the exact "
        "integer sum (the chi-square precedent — float SUM order is "
        "unspecified in both engines); SST comes from exact Sum(y^2) "
        "and the grand total; F and eta-squared are single fixed "
        "double expressions. One daily aggregation, one 7-row group "
        "table, one scalar exchange.",
    tags=("eval", "stats", "agg"),
)
def q_anova_dayofweek_revenue(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (events.filter(F.col("event_type") == "purchase")
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .cast(_DEC).alias("y"))
             .select((F.weekday("day") + 1).alias("dow"), "y"))
    # ONE grouped pass carries Sum(y^2) per dow alongside ng/sg
    # (round 11, guide §2.4): the previous shape aggregated `daily`
    # twice — once per dow for the between-group terms, once globally
    # for syy — re-running the fact-table day aggregation in a second
    # subtree and broadcast-joining the results. Decimal sums are
    # exact and associative, so Sum(y^2) partitioned by dow and summed
    # equals the global Sum(y^2) bit for bit; the whole query is now
    # one fact scan.
    g = (daily.groupBy("dow")
         .agg(F.count(F.lit(1)).cast(_DEC).alias("ng"),
              F.sum("y").alias("sg"),
              F.sum(F.col("y") * F.col("y")).alias("syy_g")))
    # sg*sg forms in exact decimal BEFORE the double cast — the same
    # order as the oracle's CAST(sg*sg AS DOUBLE), so the two engines
    # round the identical exact integer even past 2^53
    term_fix = F.round((F.col("sg") * F.col("sg")).cast("double")
                       / F.col("ng").cast("double")
                       * ANOVA_FIX).cast(_DEC)
    tot = (g.groupBy()
           .agg(F.sum("ng").alias("n"), F.sum("sg").alias("s"),
                F.count(F.lit(1)).cast("long").alias("k"),
                F.sum(term_fix).alias("ssb_fix"),
                F.sum("syy_g").alias("syy")))
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    ssb = F.col("ssb_fix").cast("double") / ANOVA_FIX - sd * sd / nd
    sst = F.col("syy").cast("double") - sd * sd / nd
    f = tot.select("n", "k", ssb.alias("ssb"), sst.alias("sst"))
    n_l = F.col("n").cast("long")
    return f.select(
        n_l.alias("n_days"), F.col("k").alias("k_groups"),
        (F.col("k") - 1).alias("df1"),
        (n_l - F.col("k")).alias("df2"),
        F.round((F.col("ssb") / (F.col("k") - 1).cast("double"))
                / ((F.col("sst") - F.col("ssb"))
                   / (n_l - F.col("k")).cast("double")), 6)
        .alias("f_stat"),
        F.round(F.col("ssb") / F.col("sst"), 6).alias("eta_sq"))


_ABTEST_ORACLE = """
WITH c AS (
  SELECT CAST(sum(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END)
              AS HUGEINT) AS n1,
         CAST(sum(CASE WHEN isodow(ts) >= 6
                       AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS HUGEINT) AS x1,
         CAST(sum(CASE WHEN isodow(ts) < 6 THEN 1 ELSE 0 END)
              AS HUGEINT) AS n2,
         CAST(sum(CASE WHEN isodow(ts) < 6
                       AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS HUGEINT) AS x2
  FROM events
)
SELECT CAST(n1 AS BIGINT) AS n_weekend, CAST(x1 AS BIGINT) AS conv_weekend,
       CAST(n2 AS BIGINT) AS n_weekday, CAST(x2 AS BIGINT) AS conv_weekday,
       round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS rate_weekend,
       round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS rate_weekday,
       round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS lift,
       round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
                    * (1.0 - CAST(x1 + x2 AS DOUBLE)
                             / CAST(n1 + n2 AS DOUBLE))
                    * (1.0 / CAST(n1 AS DOUBLE)
                       + 1.0 / CAST(n2 AS DOUBLE))), 6) AS z
FROM c
"""


@query(
    "abtest_weekend_conversion",
    _ABTEST_ORACLE,
    doc="Two-proportion z-test of purchase conversion, weekend vs "
        "weekday cohorts (the A/B-test primitive): exact integer "
        "event/conversion counts from ONE conditional aggregate over "
        "one scan — no per-cohort subqueries — then pooled-variance "
        "z, per-cohort rates and absolute lift as fixed double "
        "expressions written identically on both engines.",
    tags=("eval", "stats", "agg"),
)
def q_abtest_weekend_conversion(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wk = F.weekday("ts") >= 5
    purchase = F.col("event_type") == "purchase"
    c = events.groupBy().agg(
        F.sum(F.when(wk, 1).otherwise(0)).cast(_DEC).alias("n1"),
        F.sum(F.when(wk & purchase, 1).otherwise(0)).cast(_DEC)
        .alias("x1"),
        F.sum(F.when(~wk, 1).otherwise(0)).cast(_DEC).alias("n2"),
        F.sum(F.when((~wk) & purchase, 1).otherwise(0)).cast(_DEC)
        .alias("x2"))
    n1, x1 = F.col("n1").cast("double"), F.col("x1").cast("double")
    n2, x2 = F.col("n2").cast("double"), F.col("x2").cast("double")
    pooled = (F.col("x1") + F.col("x2")).cast("double") \
        / (F.col("n1") + F.col("n2")).cast("double")
    return c.select(
        F.col("n1").cast("long").alias("n_weekend"),
        F.col("x1").cast("long").alias("conv_weekend"),
        F.col("n2").cast("long").alias("n_weekday"),
        F.col("x2").cast("long").alias("conv_weekday"),
        F.round(x1 / n1, 6).alias("rate_weekend"),
        F.round(x2 / n2, 6).alias("rate_weekday"),
        F.round(x1 / n1 - x2 / n2, 6).alias("lift"),
        F.round((x1 / n1 - x2 / n2)
                / F.sqrt(pooled * (1.0 - pooled)
                         * (1.0 / n1 + 1.0 / n2)), 6).alias("z"))
