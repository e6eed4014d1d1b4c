"""Benjamini-Hochberg FDR correction over a family of segment tests.

[[abtest_weekend_conversion]] runs ONE two-proportion z-test; real
experimentation platforms run the same test across every segment and
must then control the false-discovery rate — without correction,
testing 25 nations at alpha = 0.05 yields ~1.2 false positives by
chance. This is the standard Benjamini-Hochberg (1995) step-up
procedure over per-nation tests of "weekend vs weekday return rate":

  1. per nation: pooled two-proportion z (the abtest.py formula) on
     lineitem return flags split by weekend ship date, customers
     routed to nations through the dimension joins;
  2. two-sided p-value via the normal CDF;
  3. BH: rank p ascending (total tie-break: p, nation); adjusted
     p_i = min_{j >= i}(p_j * m / j) capped at 1 (a reverse running
     min window); discoveries = adjusted p <= 0.05.

Cross-engine determinism: the z statistic and the CDF are pure
float-expression pipelines with NO order-dependent aggregation —
both engines evaluate the IDENTICAL expression tree over identical
BIGINT counts, so every intermediate double is bit-equal (the same
argument that certifies the classification risk scores). The normal
CDF is the Abramowitz & Stegun 26.2.17 polynomial (|error| < 7.5e-8,
far below any decision threshold), generated from ONE Python template
into both the Spark column and the oracle SQL so the literals cannot
drift. The BH running min is a window MIN over doubles — min is
order-insensitive, so plan shape cannot change it.

Scale shape: one fact aggregation to per-(nation, is_weekend) counts
(broadcast dim joins), then the test family is m = |nations| rows —
the window runs on the statistic table. No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

# A&S 26.2.17 — the SAME template renders the Spark expression and the
# oracle SQL, so the polynomial cannot drift between engines.
_PHI_TEMPLATE = (
    "(1.0 - (0.3989422804014327 * exp(-({x}) * ({x}) / 2.0)) * "
    "((((1.330274429 * {t} - 1.821255978) * {t} + 1.781477937) * {t}"
    " - 0.356563782) * {t} + 0.319381530) * {t})"
)
_T_TEMPLATE = "(1.0 / (1.0 + 0.2316419 * ({x})))"


def _phi_sql(x: str) -> str:
    t = _T_TEMPLATE.format(x=x)
    return _PHI_TEMPLATE.format(x=x, t=t)


def _pvalue_sql(z: str) -> str:
    return f"(2.0 * (1.0 - {_phi_sql(f'abs({z})')}))"


_Z_SQL = (
    "((CAST(x1 AS DOUBLE) / n1 - CAST(x2 AS DOUBLE) / n2)"
    " / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "        * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    "        * (1.0 / n1 + 1.0 / n2)))"
)

_BH_ORACLE = f"""
WITH obs AS (
  SELECT n.n_name AS nation,
         CASE WHEN dayofweek(l.l_shipdate) IN (0, 6) THEN 1 ELSE 0 END
           AS wk,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
), counts AS (
  SELECT nation,
         CAST(sum(CASE WHEN wk = 1 THEN ret ELSE 0 END) AS BIGINT) AS x1,
         CAST(sum(CASE WHEN wk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN wk = 0 THEN ret ELSE 0 END) AS BIGINT) AS x2,
         CAST(sum(CASE WHEN wk = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM obs GROUP BY nation
), stats AS (
  SELECT nation, x1, n1, x2, n2,
         {_Z_SQL} AS z
  FROM counts WHERE n1 > 0 AND n2 > 0
), pv AS (
  SELECT nation, z, {_pvalue_sql('z')} AS p,
         CAST(count(*) OVER () AS BIGINT) AS m,
         CAST(row_number() OVER (ORDER BY {_pvalue_sql('z')}, nation)
              AS BIGINT) AS rk
  FROM stats
)
SELECT nation, round(z, 6) AS z_stat, round(p, 6) AS p_value,
       round(least(min(p * m / rk)
                   OVER (ORDER BY rk DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW), 1.0), 6) AS bh_adjusted_p,
       least(min(p * m / rk)
             OVER (ORDER BY rk DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             1.0) <= 0.05 AS significant_fdr05
FROM pv
"""


@query(
    "bh_nation_return_tests",
    _BH_ORACLE,
    doc="Benjamini-Hochberg FDR correction over the per-nation family "
        "of weekend-vs-weekday return-rate z-tests: pooled "
        "two-proportion z from exact BIGINT counts, two-sided p via "
        "the A&S 26.2.17 normal-CDF polynomial (one template renders "
        "both engines' expression, so the literals cannot drift), "
        "then the BH step-up as a reverse running-min window over "
        "(p, nation)-ranked tests with discoveries at FDR 0.05. Pure "
        "float-expression pipeline over identical integer counts — "
        "no order-dependent aggregation anywhere. One fact "
        "aggregation through broadcast dims; the correction runs on "
        "the m-row statistic table.",
    tags=("stats", "abtest", "window", "north-star"),
)
def q_bh_nation_return_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    obs = (li.join(orders, li.l_orderkey == orders.o_orderkey)
           .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
                 orders.o_custkey == F.col("c_custkey"))
           .join(F.broadcast(nation.select("n_nationkey", "n_name")),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .select(F.col("n_name").alias("nation"),
                   F.when(F.dayofweek("l_shipdate").isin(1, 7), 1)
                   .otherwise(0).alias("wk"),
                   F.when(F.col("l_returnflag") == "R", 1)
                   .otherwise(0).alias("ret")))
    counts = (obs.groupBy("nation")
              .agg(F.sum(F.when(F.col("wk") == 1, F.col("ret"))
                         .otherwise(0)).cast("bigint").alias("x1"),
                   F.sum("wk").cast("bigint").alias("n1"),
                   F.sum(F.when(F.col("wk") == 0, F.col("ret"))
                         .otherwise(0)).cast("bigint").alias("x2"),
                   F.sum(F.when(F.col("wk") == 0, 1).otherwise(0))
                   .cast("bigint").alias("n2")))
    stats = (counts.filter((F.col("n1") > 0) & (F.col("n2") > 0))
             .withColumn("z", F.expr(_Z_SQL)))
    pv = (stats
          .withColumn("p", F.expr(_pvalue_sql("z")))
          .withColumn("m", F.count(F.lit(1)).over(
              Window.partitionBy()).cast("bigint"))
          .withColumn("rk", F.row_number().over(
              Window.orderBy(F.expr(_pvalue_sql("z")), "nation"))
              .cast("bigint")))
    w_rev = (Window.orderBy(F.col("rk").desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    adj = F.least(F.min(F.col("p") * F.col("m") / F.col("rk")).over(w_rev),
                  F.lit(1.0))
    return pv.select(
        "nation", F.round("z", 6).alias("z_stat"),
        F.round("p", 6).alias("p_value"),
        F.round(adj, 6).alias("bh_adjusted_p"),
        (adj <= 0.05).alias("significant_fdr05"))
