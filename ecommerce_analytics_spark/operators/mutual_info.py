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

    # Checkpoint the contingency cells (features × bins × 2 rows —
    # data-size independent): xm/ym/tot and the MI term join re-derive
    # from materialized rows instead of re-running the fact explode +
    # aggregation in four subtrees (guide §2.4; was lineitem×6 in the
    # plan census). One fact scan at any corpus size.
    cells = (base.groupBy("feature", "bin", "y")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
             .localCheckpoint(eager=True))
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


# ---------------------------------------------------------------------------
# Decision stump: the best single split per feature (1R / C4.5 root)

_STUMP_ORACLE = f"""
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
  SELECT feature, bin,
         CAST(count(*) AS BIGINT) AS n1,
         CAST(sum(y) AS BIGINT) AS d1
  FROM base GROUP BY feature, bin
), tot AS (
  SELECT feature, CAST(sum(n1) AS BIGINT) AS n,
         CAST(sum(d1) AS BIGINT) AS d
  FROM cells GROUP BY feature
), hy AS (
  SELECT feature,
         CAST(round(CASE WHEN d = 0 OR d = n THEN 0.0 ELSE
           (CAST(d AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / d)
           END * {LOG_FIX}) AS BIGINT)
         + CAST(round(CASE WHEN d = 0 OR d = n THEN 0.0 ELSE
           (CAST(n - d AS DOUBLE) / n) * ln(CAST(n AS DOUBLE) / (n - d))
           END * {LOG_FIX}) AS BIGINT) AS hy_fix
  FROM tot
), branch AS (
  SELECT c.feature, c.bin, c.n1, c.d1,
         t.n - c.n1 AS n0, t.d - c.d1 AS d0, t.n AS n
  FROM cells c JOIN tot t ON t.feature = c.feature
), gain AS (
  SELECT feature, bin, n1, d1, n0, d0, n,
         (SELECT hy_fix FROM hy WHERE hy.feature = branch.feature)
         - (CAST(round(CASE WHEN d1 = 0 THEN 0.0 ELSE
              (CAST(d1 AS DOUBLE) / n) * ln(CAST(n1 AS DOUBLE) / d1)
              END * {LOG_FIX}) AS BIGINT)
            + CAST(round(CASE WHEN n1 = d1 THEN 0.0 ELSE
              (CAST(n1 - d1 AS DOUBLE) / n)
                * ln(CAST(n1 AS DOUBLE) / (n1 - d1))
              END * {LOG_FIX}) AS BIGINT)
            + CAST(round(CASE WHEN d0 = 0 THEN 0.0 ELSE
              (CAST(d0 AS DOUBLE) / n) * ln(CAST(n0 AS DOUBLE) / d0)
              END * {LOG_FIX}) AS BIGINT)
            + CAST(round(CASE WHEN n0 = d0 THEN 0.0 ELSE
              (CAST(n0 - d0 AS DOUBLE) / n)
                * ln(CAST(n0 AS DOUBLE) / (n0 - d0))
              END * {LOG_FIX}) AS BIGINT)) AS gain_fix
  FROM branch
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY feature
                               ORDER BY gain_fix DESC, bin) AS rk
  FROM gain
)
SELECT feature, bin AS split_bin, n1 AS n_in,
       round(CAST(gain_fix AS DOUBLE) / {LOG_FIX}, 6) AS gain_nats,
       round(CAST(d1 AS DOUBLE) / n1, 6) AS p_return_in,
       round(CAST(d0 AS DOUBLE) / n0, 6) AS p_return_out
FROM ranked WHERE rk = 1
"""


@query(
    "decision_stump_returns",
    _STUMP_ORACLE,
    doc="Decision-stump learner (the 1R / C4.5 root split): for each "
        "of the four exactly-binned features, the equality split with "
        "maximum information gain on the returns label, with the "
        "in/out branch return rates. Each entropy term is "
        "(count/N)*ln(n/count) — a product of two deterministic "
        "doubles from single exact-integer ratios, snapped to 1e-9 "
        "fixed point; the gain argmax runs on exact BIGINTs with a "
        "total (gain DESC, bin) tie-break. Zero-count branches "
        "contribute exact 0 via CASE guards, never ln(0). Same "
        "one-aggregation scale shape as mi_feature_ranking.",
    tags=("ml", "stats", "north-star"),
)
def q_decision_stump_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

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

    cells = (base.groupBy("feature", "bin")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n1"),
                  F.sum("y").cast("bigint").alias("d1")))
    tot = (cells.groupBy("feature")
           .agg(F.sum("n1").cast("bigint").alias("n"),
                F.sum("d1").cast("bigint").alias("d")))

    def ent_term(cnt, n_branch, n_total):
        # (cnt/N) * ln(n_branch/cnt), exact-0 guard at cnt == 0 or
        # cnt == n_branch
        return F.when((cnt == 0) | (cnt == n_branch),
                      F.lit(0).cast("bigint")).otherwise(
            F.round((cnt.cast("double") / n_total)
                    * F.log(n_branch.cast("double") / cnt.cast("double"))
                    * LOG_FIX).cast("bigint"))

    hy = tot.select(
        "feature",
        (ent_term(F.col("d"), F.col("n"), F.col("n"))
         + ent_term(F.col("n") - F.col("d"), F.col("n"), F.col("n")))
        .alias("hy_fix"))

    branch = (cells.join(F.broadcast(tot), "feature")
              .select("feature", "bin", "n1", "d1", "n",
                      (F.col("n") - F.col("n1")).alias("n0"),
                      (F.col("d") - F.col("d1")).alias("d0")))
    gain = (branch.join(F.broadcast(hy), "feature")
            .select("feature", "bin", "n1", "d1", "n0", "d0", "n",
                    (F.col("hy_fix")
                     - (ent_term(F.col("d1"), F.col("n1"), F.col("n"))
                        + ent_term(F.col("n1") - F.col("d1"),
                                   F.col("n1"), F.col("n"))
                        + ent_term(F.col("d0"), F.col("n0"), F.col("n"))
                        + ent_term(F.col("n0") - F.col("d0"),
                                   F.col("n0"), F.col("n"))))
                    .alias("gain_fix")))
    w = Window.partitionBy("feature").orderBy(F.col("gain_fix").desc(),
                                              "bin")
    return (gain.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("feature", F.col("bin").alias("split_bin"),
                    F.col("n1").alias("n_in"),
                    F.round(F.col("gain_fix").cast("double") / LOG_FIX, 6)
                    .alias("gain_nats"),
                    F.round(F.col("d1").cast("double") / F.col("n1"), 6)
                    .alias("p_return_in"),
                    F.round(F.col("d0").cast("double") / F.col("n0"), 6)
                    .alias("p_return_out")))
