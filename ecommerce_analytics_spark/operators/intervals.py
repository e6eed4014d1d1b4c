"""Bucketed interval-overlap join.

Spark has no native interval join: ``a.start < b.end AND b.start <
a.end`` alone plans as a nested-loop over the cross product — a
scale-killer the moment neither side broadcasts. The standard fix
(Flink's interval join, Databricks' range-join hint) is BANDING:
quantize time into fixed buckets, explode each interval into the
buckets it covers, equi-join on the bucket, then apply the exact
overlap predicate and dedupe. Cost: each interval replicates into
(length / bucket) rows, and the join is a plain hash shuffle on int
keys — pick the bucket near the median interval length and the
explosion factor stays ~2.

Demonstrated here joining gap-based user sessions (windows_extra's
sessionize output) against a deterministic promo calendar derived
from the event-time span (one 12h promo window every 48h). The
DuckDB oracle runs the same semantics as a direct inequality join —
certifying that banding + exact-predicate + dedupe equals the naive
quadratic formulation.

All bucket arithmetic is exact integer epoch-ms division; overlap is
strict (start < other_end both ways), so zero-length touches at
boundaries don't count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.windows_extra import (
    SESSION_GAP_MS, q_sessionize,
)
from ecommerce_analytics_spark.plans.registry import query

BUCKET_MS = 24 * 3600 * 1000          # 24h banding buckets
PROMO_PERIOD_MS = 48 * 3600 * 1000    # one promo every 48h...
PROMO_LEN_MS = 12 * 3600 * 1000       # ...lasting 12h


def overlap_join_banded(a: DataFrame, b: DataFrame,
                        a_start: str, a_end: str,
                        b_start: str, b_end: str,
                        bucket_ms: int = BUCKET_MS) -> DataFrame:
    """Overlap-join two interval frames (epoch-ms long columns):
    explode both into covered buckets, equi-join, exact predicate,
    dedupe. Returns all columns of both inputs for each overlapping
    pair. Strict overlap: a.start < b.end AND b.start < a.end."""
    def bkt(c: str):
        return ((F.col(c) - F.col(c) % bucket_ms) / bucket_ms).cast("long")

    ab = a.withColumn("_bkt", F.explode(F.sequence(bkt(a_start),
                                                   bkt(a_end))))
    bb = b.withColumn("_bkt", F.explode(F.sequence(bkt(b_start),
                                                   bkt(b_end))))
    return (ab.join(bb, "_bkt")
            .filter((F.col(a_start) < F.col(b_end))
                    & (F.col(b_start) < F.col(a_end)))
            .drop("_bkt")
            .distinct())


_PROMO_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         CAST(sum(new_sess) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no,
         ts
  FROM flagged
), sessions AS (
  SELECT user_id, session_no,
         epoch_ms(min(ts)) AS s_start, epoch_ms(max(ts)) AS s_end
  FROM sess GROUP BY user_id, session_no
), span AS (
  SELECT epoch_ms(min(ts)) AS t0, epoch_ms(max(ts)) AS t1 FROM events
), promos AS (
  SELECT j AS promo_id,
         t0 + j * {PROMO_PERIOD_MS} AS p_start,
         t0 + j * {PROMO_PERIOD_MS} + {PROMO_LEN_MS} AS p_end
  FROM span, unnest(generate_series(0,
      (t1 - t0) // {PROMO_PERIOD_MS})) AS g(j)
)
SELECT p.promo_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT s.user_id) AS BIGINT) AS n_users,
       CAST(sum(s.user_id) AS BIGINT) AS user_checksum
FROM promos p JOIN sessions s
  ON s.s_start < p.p_end AND p.p_start < s.s_end
GROUP BY p.promo_id
"""


@query(
    "promo_session_overlap",
    _PROMO_ORACLE,
    doc="Banded interval-overlap join: 30-min-gap user sessions vs a "
        "deterministic promo calendar (12h window every 48h over the "
        "event span). Both interval sets explode into 24h buckets and "
        "equi-join on the bucket key — a plain int hash join at any "
        "scale — then the exact strict-overlap predicate + dedupe "
        "recover precisely the naive inequality-join semantics the "
        "DuckDB oracle runs. Per-promo session/user counts + user-id "
        "checksum. The naive plan is a nested loop over the cross "
        "product; banding makes it shuffle-shaped.",
    tags=("join", "intervals", "sessions", "north-star"),
)
def q_promo_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sessions = (q_sessionize(spark, sf_dir)
                .select("user_id", "session_no",
                        F.unix_millis("session_start").alias("s_start"),
                        F.unix_millis("session_end").alias("s_end")))
    span = events.agg(F.unix_millis(F.min("ts")).alias("t0"),
                      F.unix_millis(F.max("ts")).alias("t1"))
    promos = (span.select(
        F.explode(F.sequence(
            F.lit(0),
            F.expr(f"(t1 - t0) div {PROMO_PERIOD_MS}"))).alias("promo_id"),
        F.col("t0"))
        .select("promo_id",
                (F.col("t0") + F.col("promo_id") * PROMO_PERIOD_MS)
                .alias("p_start"),
                (F.col("t0") + F.col("promo_id") * PROMO_PERIOD_MS
                 + PROMO_LEN_MS).alias("p_end")))
    pairs = overlap_join_banded(
        sessions, promos, "s_start", "s_end", "p_start", "p_end")
    return (pairs.groupBy("promo_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"),
                 F.countDistinct("user_id").cast("long").alias("n_users"),
                 F.sum("user_id").cast("long").alias("user_checksum")))
