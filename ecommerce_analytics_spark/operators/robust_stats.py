"""Robust location estimates and ABC inventory classification.

``trimmed_winsorized_value`` — the robust-statistics counterparts of
the plain mean over event values, per event type: the 10% trimmed
mean (drop the k = n div 10 lowest and highest observations) and the
10% winsorized mean (clamp them to the surviving extremes instead).
Outliers are what these exist for — [[revenue_anomaly_mad]] flags
them, these estimate through them. Exactness: observations are
totally ordered by (cents, event_id) so rank boundaries are
deterministic; the trimmed/winsorized sums are associative BIGINT
cent sums over rank-windowed rows (the clamp values are the exact
cents at ranks k+1 and n-k); each output is one division of exact
integers.

``abc_product_classes`` — the textbook ABC inventory analysis:
products ranked by revenue (total order: revenue cents DESC,
partkey), classified A while cumulative share <= 80%, B while <= 95%,
C otherwise — boundaries evaluated on exact integer cents
(cum_cents * 100 <= 80 * total_cents: integer cross-multiplication,
no float shares), then rolled up to per-class counts and exact
revenue shares.

Scale shape: both reduce facts in one aggregation (per-type ranks
run within type partitions; the product rollup is |parts| rows) and
run their windows on the reduced tables. No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

_TRIM_ORACLE = """
WITH v AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), ranked AS (
  SELECT event_type, c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY c, event_id) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM v
), bounds AS (
  SELECT event_type, n, n // 10 AS k FROM ranked GROUP BY event_type, n
), clamps AS (
  SELECT r.event_type,
         min(CASE WHEN r.rn = b.k + 1 THEN r.c END) AS lo_c,
         min(CASE WHEN r.rn = b.n - b.k THEN r.c END) AS hi_c
  FROM ranked r JOIN bounds b ON b.event_type = r.event_type
  GROUP BY r.event_type
), agg AS (
  SELECT r.event_type, b.n, b.k,
         CAST(sum(CASE WHEN r.rn > b.k AND r.rn <= b.n - b.k
                       THEN r.c ELSE 0 END) AS BIGINT) AS mid_sum,
         CAST(sum(least(greatest(r.c, c2.lo_c), c2.hi_c)) AS BIGINT)
           AS win_sum
  FROM ranked r
  JOIN bounds b ON b.event_type = r.event_type
  JOIN clamps c2 ON c2.event_type = r.event_type
  GROUP BY r.event_type, b.n, b.k
)
SELECT event_type, n AS n_obs, k AS n_trimmed_each_side,
       round(CAST(mid_sum AS DOUBLE)
             / CAST(100 * (n - 2 * k) AS DOUBLE), 6) AS trimmed_mean,
       round(CAST(win_sum AS DOUBLE) / CAST(100 * n AS DOUBLE), 6)
         AS winsorized_mean
FROM agg
"""


@query(
    "trimmed_winsorized_value",
    _TRIM_ORACLE,
    doc="Robust location per event type: 10% trimmed mean (drop the "
        "k = n div 10 lowest/highest by the total (cents, event_id) "
        "order) and 10% winsorized mean (clamp to the exact cents at "
        "ranks k+1 and n-k). All sums are associative BIGINT cents "
        "over deterministic rank windows; outputs single divisions "
        "of exact integers. One fact shuffle into per-type rank "
        "windows.",
    tags=("stats", "window", "agg", "north-star"),
)
def q_trimmed_winsorized_value(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = events.select("event_type", "event_id",
                      F.round(F.col("value") * 100).cast("bigint")
                      .alias("c"))
    w_rank = Window.partitionBy("event_type").orderBy("c", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type", "c",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"))
    ranked = ranked.withColumn("k", F.expr("n div 10"))
    clamps = (ranked.groupBy("event_type")
              .agg(F.min(F.when(F.col("rn") == F.col("k") + 1,
                                F.col("c"))).alias("lo_c"),
                   F.min(F.when(F.col("rn") == F.col("n") - F.col("k"),
                                F.col("c"))).alias("hi_c")))
    agg = (ranked.join(F.broadcast(clamps), "event_type")
           .groupBy("event_type", "n", "k")
           .agg(F.sum(F.when((F.col("rn") > F.col("k"))
                             & (F.col("rn") <= F.col("n") - F.col("k")),
                             F.col("c")).otherwise(0))
                .cast("bigint").alias("mid_sum"),
                F.sum(F.least(F.greatest(F.col("c"), F.col("lo_c")),
                              F.col("hi_c"))).cast("bigint")
                .alias("win_sum")))
    return agg.select(
        "event_type", F.col("n").alias("n_obs"),
        F.col("k").alias("n_trimmed_each_side"),
        F.round(F.col("mid_sum").cast("double")
                / (100 * (F.col("n") - 2 * F.col("k"))).cast("double"), 6)
        .alias("trimmed_mean"),
        F.round(F.col("win_sum").cast("double")
                / (100 * F.col("n")).cast("double"), 6)
        .alias("winsorized_mean"))


_ABC_ORACLE = """
WITH exact AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS rc
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, rc,
         CAST(sum(rc) OVER (ORDER BY rc DESC, l_partkey) AS BIGINT)
           AS cum_rc,
         CAST(sum(rc) OVER () AS BIGINT) AS tot_rc
  FROM exact
), classed AS (
  SELECT l_partkey, rc,
         CASE WHEN cum_rc * 100 <= tot_rc * 80 THEN 'A'
              WHEN cum_rc * 100 <= tot_rc * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         tot_rc
  FROM ranked
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_products,
       round(CAST(sum(rc) AS DOUBLE) / CAST(any_value(tot_rc) AS DOUBLE),
             6) AS revenue_share
FROM classed GROUP BY abc_class
"""


@query(
    "abc_product_classes",
    _ABC_ORACLE,
    doc="ABC inventory analysis: products ranked by exact discounted "
        "revenue (1e-4-dollar BIGINT units, total (revenue DESC, "
        "partkey) order), classified A/B/C at the 80%/95% cumulative "
        "boundaries evaluated by integer cross-multiplication "
        "(cum*100 <= tot*80 — no float shares in the decision), then "
        "per-class counts and exact revenue shares. One fact "
        "aggregation to |parts| rows; windows on the product table.",
    tags=("retail", "window", "agg"),
)
def q_abc_product_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    exact = (li.groupBy("l_partkey")
             .agg(F.sum(F.round(F.col("l_extendedprice") * 100)
                        .cast("bigint")
                        * (100 - F.round(F.col("l_discount") * 100)
                           .cast("bigint")))
                  .cast("bigint").alias("rc")))
    w_cum = (Window.orderBy(F.col("rc").desc(), "l_partkey")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy()
    ranked = exact.select(
        "l_partkey", "rc",
        F.sum("rc").over(w_cum).cast("bigint").alias("cum_rc"),
        F.sum("rc").over(w_all).cast("bigint").alias("tot_rc"))
    classed = ranked.select(
        "rc", "tot_rc",
        F.when(F.col("cum_rc") * 100 <= F.col("tot_rc") * 80, "A")
        .when(F.col("cum_rc") * 100 <= F.col("tot_rc") * 95, "B")
        .otherwise("C").alias("abc_class"))
    return (classed.groupBy("abc_class")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_products"),
                 F.round(F.sum("rc").cast("double")
                         / F.first("tot_rc").cast("double"), 6)
                 .alias("revenue_share")))
