"""Customer segment migration matrix across period halves.

The classic lifecycle-marketing rollup the reference's segmentation
notebook gestures at but never computes (SURVEY §2.8 / C3: it assigns
static RFM clusters once; real retention work asks how customers MOVE
between value tiers period-over-period). Complements
``event_transition_matrix`` (markov.py — event-type transitions) with
the per-customer value-tier transition counts.

Periods: first half = day-of-month <= 15, second half = the rest (the
synthetic events span one calendar month; the split is a pushed-down
scalar predicate, not a data-derived midpoint, so it is replayable
and partition-prunable on a date-partitioned lake). Spend tiers on
exact integer cents (numerics discipline): none / low / mid / high.

Scale shape: ONE scan of purchases, conditional per-half sums under
ONE user-hash aggregate (no join of two half-aggregates — the halves
are columns, not tables), then a tiny (4x4-bounded) groupBy. At
100 TB this is a map-side-combined two-level rollup with nothing
skew-prone: the second groupBy's domain is 16 cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

MID_DAY = 15
TIER_LOW, TIER_HIGH = 20_000, 40_000  # cents

_TIER_CASE = (f"CASE WHEN cents IS NULL THEN 'none' "
              f"WHEN cents < {TIER_LOW} THEN 'low' "
              f"WHEN cents < {TIER_HIGH} THEN 'mid' "
              f"ELSE 'high' END")


_MIGRATION_ORACLE = f"""
WITH p AS (
  SELECT user_id,
         CASE WHEN day(ts) <= {MID_DAY}
              THEN CAST(round(value * 100) AS BIGINT) END AS c1,
         CASE WHEN day(ts) > {MID_DAY}
              THEN CAST(round(value * 100) AS BIGINT) END AS c2
  FROM events WHERE event_type = 'purchase'
), per_user AS (
  SELECT user_id, sum(c1) AS cents_first, sum(c2) AS cents_second
  FROM p GROUP BY user_id
), tiered AS (
  SELECT user_id,
         (SELECT {_TIER_CASE} FROM (SELECT cents_first AS cents))
           AS seg_first,
         (SELECT {_TIER_CASE} FROM (SELECT cents_second AS cents))
           AS seg_second,
         coalesce(cents_first, 0) AS cf, coalesce(cents_second, 0) AS cs
  FROM per_user
)
SELECT seg_first, seg_second,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(cf) AS BIGINT) AS cents_first_total,
       CAST(sum(cs) AS BIGINT) AS cents_second_total
FROM tiered GROUP BY seg_first, seg_second
"""


@query(
    "segment_migration_matrix",
    _MIGRATION_ORACLE,
    doc="Customer value-tier migration matrix: per-user exact-cents "
        "purchase spend in each half of the month (conditional sums "
        "under ONE user-hash aggregate — the halves are columns, not "
        "joined tables), tiered none/low/mid/high, then transition "
        "counts + spend totals per (from, to) cell. The "
        "lifecycle-marketing rollup the reference's one-shot RFM "
        "clustering never computes; 16-cell output, map-side-combined "
        "everywhere, nothing skew-prone at 100 TB.",
    tags=("agg", "segmentation", "retail"),
)
def q_segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    p = (events.filter(F.col("event_type") == "purchase")
         .select("user_id",
                 F.when(F.dayofmonth("ts") <= MID_DAY, cents).alias("c1"),
                 F.when(F.dayofmonth("ts") > MID_DAY, cents).alias("c2")))
    per_user = p.groupBy("user_id").agg(
        F.sum("c1").alias("cents_first"),
        F.sum("c2").alias("cents_second"))

    def tier(col: str):
        c = F.col(col)
        return (F.when(c.isNull(), "none")
                .when(c < TIER_LOW, "low")
                .when(c < TIER_HIGH, "mid")
                .otherwise("high"))

    tiered = per_user.select(
        tier("cents_first").alias("seg_first"),
        tier("cents_second").alias("seg_second"),
        F.coalesce("cents_first", F.lit(0)).alias("cf"),
        F.coalesce("cents_second", F.lit(0)).alias("cs"))
    return (tiered.groupBy("seg_first", "seg_second")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 F.sum("cf").alias("cents_first_total"),
                 F.sum("cs").alias("cents_second_total")))
