"""Mergeable histogram-quantile sketches (the percentile analog of the
HLL pattern, sketches.py).

Exact percentiles at 100 TB have the same problem as exact distinct
counts: every question asked re-shuffles every value. The mergeable
answer for quantiles that must compose across partitions/days/rollups
is a fixed-bin histogram sketch (the Prometheus/OpenTelemetry
histogram model): each day aggregates ONCE into (bin → count) rows,
any later rollup (week, month, ad-hoc range) SUMS bin counts — no
re-scan of the fact table — and quantiles are read off the merged
CDF with error bounded by the bin width.

Unlike HLL (engine-specific registers), this sketch is exact integer
state, so the ENTIRE pipeline is oracle-checkable cross-engine — the
per-day estimates, the merge, and the global estimates all hash-match
DuckDB. The estimate-vs-exact accuracy contract (|est - exact| ≤ bin
width) is pytest-certified in tests/test_skew_approx.py style in
tests/test_quantile_sketch.py.

Bin layout: BIN_W-wide bins over [0, CAP); the overflow bin CAP/BIN_W
catches outliers (estimate degrades to the cap — documented sketch
behavior, same as a Prometheus +Inf bucket). Values are snapped to
bins with exact integer arithmetic on cents (value*100), so bin
assignment has no float-boundary ambiguity between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

BIN_W = 20          # dollars per bin
CAP = 1000          # overflow bin above this
N_BINS = CAP // BIN_W
QS = (50, 90, 99)   # percentiles reported


def _bin_col():
    # exact: cents div (BIN_W*100) — integer division, no float boundary
    return F.expr(f"CAST(least(CAST(round(value * 100) AS BIGINT) "
                  f"div {BIN_W * 100}, {N_BINS}) AS INT)")


def _bin_sql() -> str:
    return (f"CAST(least(CAST(round(value * 100) AS BIGINT)"
            f" // {BIN_W * 100}, {N_BINS}) AS INTEGER)")


def _est_from_cdf(qpct: int) -> str:
    """SQL: smallest bin whose cumulative count reaches qpct% of total,
    reported as the bin's UPPER edge (conservative estimate)."""
    return (f"min(CASE WHEN cum * 100 >= {qpct} * total THEN (bin + 1) "
            f"* {BIN_W} END)")


_HIST_CTE = f"""
WITH bins AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, {_bin_sql()} AS bin,
         count(*) AS n
  FROM events GROUP BY 1, 2
), merged AS (
  SELECT bin, sum(n) AS n FROM bins GROUP BY bin
), cdf_daily AS (
  SELECT day, bin, sum(n) OVER (PARTITION BY day ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY day) AS total
  FROM bins
), cdf_global AS (
  SELECT bin, sum(n) OVER (ORDER BY bin) AS cum,
         sum(n) OVER () AS total
  FROM merged
)
"""

_QCOLS = ", ".join(
    f"CAST({_est_from_cdf(q)} AS BIGINT) AS p{q}_est" for q in QS)

_HIST_ORACLE = _HIST_CTE + f"""
SELECT day, CAST(any_value(total) AS BIGINT) AS n_events, {_QCOLS}
FROM cdf_daily GROUP BY day
UNION ALL
SELECT CAST(NULL AS VARCHAR) AS day,
       CAST(any_value(total) AS BIGINT) AS n_events, {_QCOLS}
FROM cdf_global
"""


@query(
    "daily_value_quantile_sketch",
    _HIST_ORACLE,
    doc=f"Mergeable histogram-quantile sketch: per-day (bin → count) "
        f"state ({BIN_W}-dollar bins, overflow at {CAP}), p50/p90/p99 "
        f"read off each day's CDF AND off the global rollup obtained "
        f"by SUMMING daily bins — the fact table is scanned once, the "
        f"global estimate touches only {N_BINS + 1}-row sketch state "
        f"per day (the stored-sketch rollup pattern, sketches.py). "
        f"Bin assignment is exact integer cents so the whole pipeline "
        f"— estimates included — hash-matches the oracle; accuracy "
        f"(|est - exact| ≤ bin width) is pytest-certified.",
    tags=("agg", "sketch", "approx", "scale", "percentile"),
)
def q_daily_value_quantile_sketch(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bins = (events
            .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                     _bin_col().alias("bin"))
            .agg(F.count(F.lit(1)).alias("n")))

    def ests(df: DataFrame, keys: list[str]) -> DataFrame:
        from pyspark.sql import Window
        part = Window.partitionBy(*keys) if keys else \
            Window.partitionBy(F.lit(1))
        cum = F.sum("n").over(part.orderBy("bin"))
        total = F.sum("n").over(part)
        cdf = df.select(*keys, "bin", cum.alias("cum"),
                        total.alias("total"))
        aggs = [F.any_value("total").alias("n_events")] + [
            F.min(F.when(F.col("cum") * 100 >= q * F.col("total"),
                         (F.col("bin") + 1) * BIN_W))
            .cast("bigint").alias(f"p{q}_est") for q in QS]
        return (cdf.groupBy(*keys).agg(*aggs) if keys
                else cdf.groupBy().agg(*aggs))

    daily = ests(bins, ["day"])
    # global rollup from the DAILY SKETCH STATE only (bin-count sum) —
    # the mergeability being certified
    merged = bins.groupBy("bin").agg(F.sum("n").alias("n"))
    total = ests(merged, []).select(
        F.lit(None).cast("string").alias("day"), "n_events",
        *[f"p{q}_est" for q in QS])
    return daily.unionAll(total)


@query(
    "brand_weighted_median_price",
    """
    WITH j AS (
      SELECT p.p_brand, l.l_extendedprice AS val,
             CAST(l.l_quantity AS BIGINT) AS w
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_extendedprice IS NOT NULL AND l.l_quantity IS NOT NULL
    ), c AS (
      SELECT p_brand, val, w,
             sum(w) OVER (PARTITION BY p_brand ORDER BY val
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY p_brand) AS tw
      FROM j
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(max(tw) AS BIGINT) AS total_qty,
           min(CASE WHEN cw >= tw / 2.0 THEN val END)
             AS weighted_median_price
    FROM c GROUP BY p_brand
    """,
    doc="WEIGHTED median — the quantile variant percentile_approx and "
        "the equi-depth family don't cover: per brand, the smallest "
        "line price whose cumulative quantity reaches half the total "
        "quantity (lower weighted median, the deterministic "
        "no-interpolation rule). One brand-hash exchange with an "
        "in-partition sort feeding two window passes (running and "
        "total weight) — the classic weighted-quantile shape; integer "
        "weight cumsum and exact double compares make the result "
        "hash-match DuckDB bitwise. Tie groups on equal price cross "
        "the threshold at the same value whatever their intra-tie "
        "order, so window-tie nondeterminism cannot leak into the "
        "output.",
    tags=("window", "agg", "quantile", "scale"),
)
def q_brand_weighted_median_price(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    # a (price, weight) pair needs both halves — a NULL price would
    # also sort differently per engine (NULLS FIRST vs LAST) and skew
    # every cumulative weight after it; filtered identically on both
    # sides (no-op on clean data, load-bearing on the hostile fixture)
    li = (load_table(spark, sf_dir, "lineitem")
          .filter(F.col("l_extendedprice").isNotNull()
                  & F.col("l_quantity").isNotNull())
          .select("l_partkey", F.col("l_extendedprice").alias("val"),
                  F.col("l_quantity").cast("long").alias("w")))
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)

    wcum = (Window.partitionBy("p_brand").orderBy("val")
            .rowsBetween(Window.unboundedPreceding, 0))
    wtot = Window.partitionBy("p_brand")
    c = (j.select("p_brand", "val", "w")
         .withColumn("cw", F.sum("w").over(wcum))
         .withColumn("tw", F.sum("w").over(wtot)))
    return (c.groupBy("p_brand")
            .agg(F.count(F.lit(1)).cast("long").alias("n_lines"),
                 F.max("tw").cast("long").alias("total_qty"),
                 F.min(F.when(F.col("cw") >= F.col("tw") / 2.0,
                              F.col("val")))
                 .alias("weighted_median_price")))
