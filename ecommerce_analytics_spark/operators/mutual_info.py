"""Mutual-information feature ranking against the returns label.

The supervised counterpart of [[psi_feature_drift]]: PSI asks "did the
feature's distribution move?", MI asks "does the feature carry signal
about the label?" — the standard filter-method feature selector
(scikit-learn's ``mutual_info_score`` contingency formulation, in
nats). Label: ``l_returnflag = 'R'``. Features, stacked into one long
(feature, bin) frame, all binned by EXACT integer arithmetic:

- ``linestatus``    — l_linestatus as-is,
- ``quantity_bin``  — integer quantity div 10,
- ``discount_pct``  — round(l_discount * 100),
- ``ship_month``    — month(l_shipdate).

For each feature, over the contingency counts c_xy (cell), c_x (bin
margin), c_y (label margin), N:

    MI = sum_xy (c_xy / N) * ln( (c_xy * N) / (c_x * c_y) )

Only observed cells (c_xy >= 1) appear — absent cells contribute 0,
so no smoothing is needed and every ln/division argument is a single
ratio of exact BIGINTs (the LOG_FIX discipline: each cell term snaps
to 1e-9 fixed point, the per-feature sum is associative integer
addition). The uncertainty coefficient U = MI / H(label) (Theil's U,
the normalized report) divides two snapped fixed-point sums — one
deterministic double division.

Integer headroom: c_xy * N <= N^2 — the BIGINT edge sits at N ~ 3e9
rows. Past that, factor the ln: ln(c_xy) + ln(N) - ln(c_x) - ln(c_y)
(each argument a single BIGINT — still engine-deterministic) or
upgrade the products to DECIMAL(38); ANSI keeps the failure loud.

Scale shape: ONE map-side projection of the fact table (the feature
stack is an explode of 4 structs — linear fan-out), one compact
(feature, bin, label) aggregation; margins and the MI math run on the
tiny contingency table. No collects, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

LOG_FIX = 1_000_000_000  # 1e-9 fixed point for ln() (decontam.py idiom)

_MI_ORACLE = f"""
WITH base AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         f.feature, f.bin
  FROM lineitem,
  LATERAL (VALUES
    ('linestatus', l_linestatus),
    ('quantity_bin', CAST(CAST(l_quantity AS BIGINT) // 10 AS VARCHAR)),
    ('discount_pct', CAST(CAST(round(l_discount * 100) AS BIGINT)
                          AS VARCHAR)),
    ('ship_month', CAST(month(l_shipdate) AS VARCHAR))
  ) AS f(feature, bin)
), cells AS (
  SELECT feature, bin, y, CAST(count(*) AS BIGINT) AS c_xy
  FROM base GROUP BY feature, bin, y
), xm AS (
  SELECT feature, bin, CAST(sum(c_xy) AS BIGINT) AS c_x
  FROM cells GROUP BY feature, bin
), ym AS (
  SELECT feature, y, CAST(sum(c_xy) AS BIGINT) AS c_y
  FROM cells GROUP BY feature, y
), tot AS (
  SELECT feature, CAST(sum(c_xy) AS BIGINT) AS n
  FROM cells GROUP BY feature
), mi AS (
  SELECT c.feature,
         CAST(count(*) AS BIGINT) AS n_cells,
         CAST(sum(CAST(round(
           (CAST(c.c_xy AS DOUBLE) / t.n)
           * ln(CAST(c.c_xy * t.n AS DOUBLE)
                / CAST(x.c_x * y.c_y AS DOUBLE))
           * {LOG_FIX}) AS BIGINT)) AS BIGINT) AS mi_fix
  FROM cells c
  JOIN xm x ON x.feature = c.feature AND x.bin = c.bin
  JOIN ym y ON y.feature = c.feature AND y.y = c.y
  JOIN tot t ON t.feature = c.feature
  GROUP BY c.feature
), hy AS (
  SELECT y.feature,
         CAST(sum(CAST(round(
           -(CAST(y.c_y AS DOUBLE) / t.n)
           * ln(CAST(y.c_y AS DOUBLE) / t.n)
           * {LOG_FIX}) AS BIGINT)) AS BIGINT) AS h_fix
  FROM ym y JOIN tot t ON t.feature = y.feature
  GROUP BY y.feature
)
SELECT m.feature, m.n_cells,
       round(CAST(m.mi_fix AS DOUBLE) / {LOG_FIX}, 6) AS mi_nats,
       round(CAST(m.mi_fix AS DOUBLE) / CAST(h.h_fix AS DOUBLE), 6)
         AS uncertainty_coef
FROM mi m JOIN hy h ON h.feature = m.feature
"""


@query(
    "mi_feature_ranking",
    _MI_ORACLE,
    doc="Filter-method feature selection: mutual information (nats) "
        "between four exactly-binned lineitem features and the "
        "returns label, plus Theil's uncertainty coefficient "
        "MI/H(label). Only observed contingency cells contribute, so "
        "every ln/division argument is a single ratio of exact "
        "BIGINTs; per-cell terms snap to 1e-9 fixed point before the "
        "associative integer sum (LOG_FIX discipline). One map-side "
        "4-struct explode of the facts, one compact "
        "(feature,bin,label) aggregation; margins and MI run on the "
        "contingency table.",
    tags=("profiling", "ml", "stats", "north-star"),
)
def q_mi_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.explode(F.array(
            F.struct(F.lit("linestatus").alias("feature"),
                     F.col("l_linestatus").alias("bin")),
            F.struct(F.lit("quantity_bin").alias("feature"),
                     F.expr("cast(cast(l_quantity as bigint) div 10 "
                            "as string)").alias("bin")),
            F.struct(F.lit("discount_pct").alias("feature"),
                     F.expr("cast(cast(round(l_discount * 100) as bigint) "
                            "as string)").alias("bin")),
            F.struct(F.lit("ship_month").alias("feature"),
                     F.month("l_shipdate").cast("string").alias("bin")),
        )).alias("f")).select("y", "f.feature", "f.bin")

    cells = (base.groupBy("feature", "bin", "y")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy")))
    xm = (cells.groupBy("feature", "bin")
          .agg(F.sum("c_xy").cast("bigint").alias("c_x")))
    ym = (cells.groupBy("feature", "y")
          .agg(F.sum("c_xy").cast("bigint").alias("c_y")))
    tot = (cells.groupBy("feature")
           .agg(F.sum("c_xy").cast("bigint").alias("n")))

    mi = (cells
          .join(xm, ["feature", "bin"])
          .join(ym, ["feature", "y"])
          .join(F.broadcast(tot), "feature")
          .select("feature", F.round(
              (F.col("c_xy").cast("double") / F.col("n"))
              * F.log((F.col("c_xy") * F.col("n")).cast("double")
                      / (F.col("c_x") * F.col("c_y")).cast("double"))
              * LOG_FIX).cast("bigint").alias("term_fix"))
          .groupBy("feature")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"),
               F.sum("term_fix").cast("bigint").alias("mi_fix")))

    hy = (ym.join(F.broadcast(tot), "feature")
          .select("feature", F.round(
              -(F.col("c_y").cast("double") / F.col("n"))
              * F.log(F.col("c_y").cast("double") / F.col("n"))
              * LOG_FIX).cast("bigint").alias("h_term"))
          .groupBy("feature")
          .agg(F.sum("h_term").cast("bigint").alias("h_fix")))

    return (mi.join(hy, "feature")
            .select("feature", "n_cells",
                    F.round(F.col("mi_fix").cast("double") / LOG_FIX, 6)
                    .alias("mi_nats"),
                    F.round(F.col("mi_fix").cast("double")
                            / F.col("h_fix").cast("double"), 6)
                    .alias("uncertainty_coef")))
