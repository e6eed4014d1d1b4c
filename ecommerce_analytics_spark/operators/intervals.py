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


_COVERAGE_ORACLE = """
WITH iv AS (
  SELECT l_suppkey,
         date_diff('day', DATE '1970-01-01', l_shipdate) AS s,
         date_diff('day', DATE '1970-01-01', l_shipdate)
           + 1 + ((l_orderkey + l_linenumber) % 28) AS r
  FROM lineitem
  WHERE l_shipdate IS NOT NULL
), w AS (
  SELECT l_suppkey, s, r,
         max(r) OVER (PARTITION BY l_suppkey ORDER BY s, r
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pmax
  FROM iv
), fl AS (
  SELECT l_suppkey, s, r,
         CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END AS ns
  FROM w
), isl AS (
  SELECT l_suppkey, s, r,
         sum(ns) OVER (PARTITION BY l_suppkey ORDER BY s, r
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM fl
), g AS (
  SELECT l_suppkey, island, min(s) AS i_start, max(r) AS i_end,
         count(*) AS n
  FROM isl GROUP BY l_suppkey, island
), cov AS (
  SELECT l_suppkey,
         CAST(sum(n) AS BIGINT) AS n_shipments,
         CAST(count(*) AS BIGINT) AS n_islands,
         CAST(sum(i_end - i_start + 1) AS BIGINT) AS covered_days,
         CAST(max(i_end) - min(i_start) + 1 AS BIGINT) AS span_days
  FROM g GROUP BY l_suppkey
), ev AS (
  SELECT l_suppkey, s AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT l_suppkey, r + 1 AS day, -1 AS delta FROM iv
), rs AS (
  SELECT l_suppkey,
         sum(delta) OVER (PARTITION BY l_suppkey ORDER BY day, delta
                          ROWS UNBOUNDED PRECEDING) AS depth
  FROM ev
), pk AS (
  SELECT l_suppkey, CAST(max(depth) AS BIGINT) AS peak_in_transit
  FROM rs GROUP BY l_suppkey
)
SELECT cov.l_suppkey AS suppkey, cov.n_shipments, cov.n_islands,
       cov.covered_days, cov.span_days, pk.peak_in_transit
FROM cov JOIN pk ON pk.l_suppkey = cov.l_suppkey
"""


@query(
    "supplier_transit_coverage",
    _COVERAGE_ORACLE,
    doc="Gaps-and-islands + sweep-line concurrency, the two classic "
        "interval aggregations the banded join above doesn't cover: "
        "per supplier, merge every in-transit interval — ship day "
        "through a deterministic 1-28-day transit derived from the "
        "line key, the promo-calendar precedent (this corpus carries "
        "no l_receiptdate) — with contiguous-day semantics (touching "
        "islands fuse) via the running-max-end window trick: covered "
        "days, island count, total span — plus PEAK concurrent "
        "shipments from a +1/-1 event sweep with the end-before-start "
        "tie order that keeps adjacent intervals non-overlapping. "
        "Everything is exact integer day arithmetic inside two "
        "window passes over ONE supplier-hash exchange — no "
        "self-join, no explode-per-day — so the plan is a single "
        "shuffle at any scale and the result hash-matches DuckDB "
        "bitwise. Island flags and running depth are invariant to "
        "tie order within (start, end) groups, so the output is "
        "deterministic despite window ties.",
    tags=("intervals", "window", "agg", "scale"),
)
def q_supplier_transit_coverage(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    ship_day = F.datediff("l_shipdate", F.lit("1970-01-01"))
    # interval contract (both sides): an interval needs a start — a
    # NULL ship date has no place on the day line, and NULL s/r rows
    # would three-valued-logic the island flags differently per engine
    iv = lineitem.filter(F.col("l_shipdate").isNotNull()).select(
        "l_suppkey",
        ship_day.alias("s"),
        (ship_day + 1
         + (F.col("l_orderkey") + F.col("l_linenumber")) % 28).alias("r"))

    order_w = (Window.partitionBy("l_suppkey").orderBy("s", "r")
               .rowsBetween(Window.unboundedPreceding, -1))
    run_w = (Window.partitionBy("l_suppkey").orderBy("s", "r")
             .rowsBetween(Window.unboundedPreceding, 0))
    isl = (iv
           .withColumn("pmax", F.max("r").over(order_w))
           .withColumn("ns", F.when(F.col("pmax").isNull()
                                    | (F.col("s") > F.col("pmax") + 1), 1)
                       .otherwise(0))
           .withColumn("island", F.sum("ns").over(run_w)))
    g = (isl.groupBy("l_suppkey", "island")
         .agg(F.min("s").alias("i_start"), F.max("r").alias("i_end"),
              F.count(F.lit(1)).alias("n")))
    cov = (g.groupBy("l_suppkey")
           .agg(F.sum("n").cast("long").alias("n_shipments"),
                F.count(F.lit(1)).cast("long").alias("n_islands"),
                F.sum(F.col("i_end") - F.col("i_start") + 1).cast("long")
                .alias("covered_days"),
                (F.max("i_end") - F.min("i_start") + 1).cast("long")
                .alias("span_days")))

    # one map-side explode emits both sweep-line events per interval —
    # the union-of-two-branches form scanned the fact table twice
    # (round 11, guide §2.4; the journey_hops recipe)
    ev = (iv.select("l_suppkey", F.explode(F.array(
        F.struct(F.col("s").alias("day"), F.lit(1).alias("delta")),
        F.struct((F.col("r") + 1).alias("day"),
                 F.lit(-1).alias("delta")))).alias("e"))
        .select("l_suppkey", "e.day", "e.delta"))
    depth_w = (Window.partitionBy("l_suppkey").orderBy("day", "delta")
               .rowsBetween(Window.unboundedPreceding, 0))
    pk = (ev.withColumn("depth", F.sum("delta").over(depth_w))
          .groupBy("l_suppkey")
          .agg(F.max("depth").cast("long").alias("peak_in_transit")))

    return (cov.join(pk, "l_suppkey")
            .select(F.col("l_suppkey").alias("suppkey"), "n_shipments",
                    "n_islands", "covered_days", "span_days",
                    "peak_in_transit"))
