"""Closed-form regression & higher-moment profiling on exact moments.

The reference ships descriptive dashboards (daily revenue trends,
spend distributions — analytics_processor.py's pandas summaries); an
engine replacing it needs the inferential versions, and at 100 TB the
only shapes that survive are the ones that reduce the fact table to a
tiny exact-moment statistic table in ONE map-side-combined aggregation
and do the linear algebra on the driver-free single-row result:

* ``ols_weekend_trend`` — multiple linear regression of daily purchase
  revenue on (intercept, day index, weekend dummy), solved in CLOSED
  FORM by Cramer's rule on the 3x3 normal equations. Every entry of
  X'X and X'y is an exact integer (day indexes, 0/1 dummies, revenue
  cents), so all four determinants are computed in exact DECIMAL(38,0)
  / HUGEINT arithmetic — the coefficient DECISIONS never touch a
  float; only the final ratios divide to rounded doubles. No gradient
  loop, no collect, no MLlib: one groupBy + one scalar aggregate.
* ``lineitem_correlation_matrix`` — pairwise Pearson correlation of
  (quantity, extendedprice, discount) from one pass of exact integer
  moments (values scaled to cents / basis points; Pearson is
  invariant under affine scaling), the cross-moment products formed
  in exact decimal BEFORE the single cast to double.
* ``value_moments_profile`` — mean / std / skewness / excess kurtosis
  of purchase-event values per event type from exact raw moments
  S1..S4 in integer cents, centralized with the standard
  raw-to-central identities in an IDENTICAL double expression tree on
  both engines (sqrt(m2)*m2 instead of pow(m2,1.5) so no libm pow
  divergence). Skew/kurtosis are scale-free, so integer cents need no
  unit correction.

All three are single-scan, single-scalar-exchange plans — the moment
table never grows with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

_DEC = "decimal(38,0)"

_OLS_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), xt AS (
  SELECT CAST(row_number() OVER (ORDER BY day) AS HUGEINT) AS t,
         CAST(CASE WHEN isodow(day) >= 6 THEN 1 ELSE 0 END
              AS HUGEINT) AS w,
         y
  FROM daily
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(t) AS st, sum(w) AS sw, sum(t * t) AS stt,
         sum(t * w) AS stw, sum(y) AS sy, sum(t * y) AS sty,
         sum(w * y) AS swy, sum(y * y) AS syy
  FROM xt
), d AS (
  SELECT n, sy, sty, swy, syy, st,
         (n * (stt * sw - stw * stw) - st * (st * sw - stw * sw)
          + sw * (st * stw - stt * sw)) AS det,
         (sy * (stt * sw - stw * stw) - st * (sty * sw - stw * swy)
          + sw * (sty * stw - stt * swy)) AS det0,
         (n * (sty * sw - stw * swy) - sy * (st * sw - stw * sw)
          + sw * (st * swy - sty * sw)) AS det1,
         (n * (stt * swy - sty * stw) - st * (st * swy - sty * sw)
          + sy * (st * stw - stt * sw)) AS det2
  FROM m
)
SELECT CAST(n AS BIGINT) AS n_days,
       round(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 6)
         AS intercept,
       round(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 6)
         AS slope_per_day,
       round(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) / 100.0, 6)
         AS weekend_lift,
       round(1.0 - (CAST(syy AS DOUBLE)
                    - (CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE))
                      * CAST(sy AS DOUBLE)
                    - (CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE))
                      * CAST(sty AS DOUBLE)
                    - (CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE))
                      * CAST(swy AS DOUBLE))
                 / (CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                      / CAST(n AS DOUBLE)), 6) AS r2
FROM d
"""


@query(
    "ols_weekend_trend",
    _OLS_ORACLE,
    doc="Multiple OLS regression of daily purchase revenue on "
        "(intercept, day index, weekend dummy) solved in closed form "
        "via Cramer's rule on the normal equations: X'X and X'y "
        "entries are exact integers (indexes, dummies, cents), the "
        "four 3x3 determinants are exact DECIMAL(38,0)/HUGEINT "
        "arithmetic, and only the final coefficient ratios and R2 "
        "divide to rounded doubles — engine-deterministic with no "
        "iterative fitting and no driver collect. One daily groupBy "
        "+ one scalar moment aggregate over the tiny series.",
    tags=("ml", "stats", "timeseries", "agg"),
)
def q_ols_weekend_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (events.filter(F.col("event_type") == "purchase")
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .cast(_DEC).alias("y")))
    xt = daily.select(
        F.row_number().over(Window.orderBy("day")).cast(_DEC).alias("t"),
        F.when(F.weekday("day") >= 5, 1).otherwise(0).cast(_DEC)
        .alias("w"),
        "y")
    m = xt.groupBy().agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("t").alias("st"), F.sum("w").alias("sw"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("w")).alias("stw"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    n, st, sw = F.col("n"), F.col("st"), F.col("sw")
    stt, stw = F.col("stt"), F.col("stw")
    sy, sty, swy, syy = (F.col("sy"), F.col("sty"), F.col("swy"),
                         F.col("syy"))
    d = m.select(
        "n", "sy", "sty", "swy", "syy",
        (n * (stt * sw - stw * stw) - st * (st * sw - stw * sw)
         + sw * (st * stw - stt * sw)).alias("det"),
        (sy * (stt * sw - stw * stw) - st * (sty * sw - stw * swy)
         + sw * (sty * stw - stt * swy)).alias("det0"),
        (n * (sty * sw - stw * swy) - sy * (st * sw - stw * sw)
         + sw * (st * swy - sty * sw)).alias("det1"),
        (n * (stt * swy - sty * stw) - st * (st * swy - sty * sw)
         + sy * (st * stw - stt * sw)).alias("det2"))
    det = F.col("det").cast("double")
    b0 = F.col("det0").cast("double") / det
    b1 = F.col("det1").cast("double") / det
    b2 = F.col("det2").cast("double") / det
    syy_d, sy_d = F.col("syy").cast("double"), F.col("sy").cast("double")
    sse = (syy_d - b0 * sy_d - b1 * F.col("sty").cast("double")
           - b2 * F.col("swy").cast("double"))
    sst = syy_d - sy_d * sy_d / F.col("n").cast("double")
    return d.select(
        F.col("n").cast("long").alias("n_days"),
        F.round(b0 / 100.0, 6).alias("intercept"),
        F.round(b1 / 100.0, 6).alias("slope_per_day"),
        F.round(b2 / 100.0, 6).alias("weekend_lift"),
        F.round(1.0 - sse / sst, 6).alias("r2"))


_CORR_PAIRS = (("quantity", "extendedprice"),
               ("quantity", "discount"),
               ("extendedprice", "discount"))

# cents / basis-point scaling keeps every moment an exact integer;
# Pearson r is invariant under the per-variable affine rescale.
_CORR_VARS = {
    "quantity": "CAST(round(l_quantity * 100) AS HUGEINT)",
    "extendedprice": "CAST(round(l_extendedprice * 100) AS HUGEINT)",
    "discount": "CAST(round(l_discount * 10000) AS HUGEINT)",
}

_CORR_ORACLE = """
WITH v AS (
  SELECT {q} AS q, {p} AS p, {d} AS d FROM lineitem
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(q) AS sq, sum(p) AS sp, sum(d) AS sd,
         sum(q * q) AS sqq, sum(p * p) AS spp, sum(d * d) AS sdd,
         sum(q * p) AS sqp, sum(q * d) AS sqd, sum(p * d) AS spd
  FROM v
)
SELECT 'quantity' AS var_x, 'extendedprice' AS var_y,
       CAST(n AS BIGINT) AS n,
       round(CAST(n * sqp - sq * sp AS DOUBLE)
             / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
                * sqrt(CAST(n * spp - sp * sp AS DOUBLE))), 6) AS corr
FROM m
UNION ALL
SELECT 'quantity', 'discount', CAST(n AS BIGINT),
       round(CAST(n * sqd - sq * sd AS DOUBLE)
             / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE))
                * sqrt(CAST(n * sdd - sd * sd AS DOUBLE))), 6)
FROM m
UNION ALL
SELECT 'extendedprice', 'discount', CAST(n AS BIGINT),
       round(CAST(n * spd - sp * sd AS DOUBLE)
             / (sqrt(CAST(n * spp - sp * sp AS DOUBLE))
                * sqrt(CAST(n * sdd - sd * sd AS DOUBLE))), 6)
FROM m
""".format(q=_CORR_VARS["quantity"], p=_CORR_VARS["extendedprice"],
           d=_CORR_VARS["discount"])


@query(
    "lineitem_correlation_matrix",
    _CORR_ORACLE,
    doc="Pairwise Pearson correlation of lineitem (quantity, "
        "extendedprice, discount): values scaled to exact integer "
        "cents/basis points (r is affine-invariant), all nine moments "
        "computed in ONE map-side-combined scan, the n*Sxy - Sx*Sy "
        "cross-products formed in exact DECIMAL(38,0) before the "
        "single cast to double — so the only float ops are the final "
        "sqrt/divide, identical on both engines. The 3-row matrix "
        "explodes from the one-row moment frame: one scan, one scalar "
        "exchange, nothing proportional to the data.",
    tags=("stats", "agg", "profiling"),
)
def q_lineitem_correlation_matrix(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.round(F.col("l_quantity") * 100).cast(_DEC).alias("q"),
        F.round(F.col("l_extendedprice") * 100).cast(_DEC).alias("p"),
        F.round(F.col("l_discount") * 10000).cast(_DEC).alias("d"))
    m = v.groupBy().agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("q").alias("sq"), F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("p") * F.col("d")).alias("spd"))

    def corr(sxy: str, sx: str, sy: str, sxx: str, syy: str):
        n = F.col("n")
        num = (n * F.col(sxy) - F.col(sx) * F.col(sy)).cast("double")
        dx = (n * F.col(sxx) - F.col(sx) * F.col(sx)).cast("double")
        dy = (n * F.col(syy) - F.col(sy) * F.col(sy)).cast("double")
        return F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6)

    pairs = F.array(
        F.struct(F.lit("quantity").alias("var_x"),
                 F.lit("extendedprice").alias("var_y"),
                 corr("sqp", "sq", "sp", "sqq", "spp").alias("corr")),
        F.struct(F.lit("quantity").alias("var_x"),
                 F.lit("discount").alias("var_y"),
                 corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr")),
        F.struct(F.lit("extendedprice").alias("var_x"),
                 F.lit("discount").alias("var_y"),
                 corr("spd", "sp", "sd", "spp", "sdd").alias("corr")))
    return (m.select(F.col("n").cast("long").alias("n"),
                     F.explode(pairs).alias("pair"))
            .select("pair.var_x", "pair.var_y", "n", "pair.corr"))


_MOMENTS_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS HUGEINT) AS x
  FROM events
), m AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS s1, sum(x * x) AS s2,
         sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
  FROM c GROUP BY event_type
), f AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM m
), g AS (
  SELECT event_type, n, mu,
         r2 - mu * mu AS m2,
         r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
         r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
            - 3.0 * mu * mu * mu * mu AS m4
  FROM f
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       round(mu / 100.0, 6) AS mean,
       round(sqrt(m2) / 100.0, 6) AS std,
       round(m3 / (sqrt(m2) * m2), 6) AS skewness,
       round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
FROM g
"""


@query(
    "value_moments_profile",
    _MOMENTS_ORACLE,
    doc="Mean / std / skewness / excess kurtosis of event values per "
        "event type from exact raw moments S1..S4 in integer cents "
        "(one map-side-combined aggregation; DECIMAL(38,0) sums — "
        "x^4 of a 40k-cent value is ~1e18/row, far inside 38 "
        "digits), centralized with the raw-to-central identities in "
        "an expression tree written identically on both engines "
        "(sqrt(m2)*m2, never pow(m2,1.5), so no libm pow "
        "divergence). Skew/kurtosis are scale-free so the cents "
        "scaling needs no correction; mean/std divide by 100 at the "
        "end. The distribution-shape audit a pipeline runs per "
        "ingest batch.",
    tags=("stats", "agg", "profiling"),
)
def q_value_moments_profile(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    x = F.col("x")
    m = (events
         .select("event_type",
                 F.round(F.col("value") * 100).cast(_DEC).alias("x"))
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).cast(_DEC).alias("n"),
              F.sum(x).alias("s1"),
              F.sum(x * x).alias("s2"),
              F.sum(x * x * x).alias("s3"),
              F.sum(x * x * x * x).alias("s4")))
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    f = m.select("event_type", "n", mu.alias("mu"), r2.alias("r2"),
                 r3.alias("r3"), r4.alias("r4"))
    mu, r2, r3, r4 = (F.col("mu"), F.col("r2"), F.col("r3"),
                      F.col("r4"))
    g = f.select(
        "event_type", "n", "mu",
        (r2 - mu * mu).alias("m2"),
        (r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu).alias("m3"),
        (r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
         - 3.0 * mu * mu * mu * mu).alias("m4"))
    m2, m3, m4 = F.col("m2"), F.col("m3"), F.col("m4")
    return g.select(
        "event_type", F.col("n").cast("long").alias("n"),
        F.round(F.col("mu") / 100.0, 6).alias("mean"),
        F.round(F.sqrt(m2) / 100.0, 6).alias("std"),
        F.round(m3 / (F.sqrt(m2) * m2), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("kurtosis_excess"))
