"""Aggregation operators (SURVEY.md §2.3, A1-A8).

All partial-aggregable groupBys — Spark's map-side combine means one
shuffle of pre-aggregated partials, which is the shape that survives
a 100 TB fact table. Distinct counts are exact here (batch); the
streaming twins use approx_count_distinct (documented divergence,
SURVEY §7 hard-parts #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import (
    disc_price_sum, disc_price_sum_sql, money_sum, money_sum_sql,
)
from ecommerce_analytics_spark.plans.registry import query

# Money sums go through numerics.money_sum (exact DECIMAL accumulation)
# so plan and oracle agree bit-for-bit regardless of partial-agg merge
# order — see numerics.py for the round-1 failure this prevents.
_VALUE_SUM_SQL = money_sum_sql("value")


@query(
    "event_type_distribution",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE)
             AS share
    FROM events
    GROUP BY event_type
    """,
    doc="A1: count per event_type + share of total "
        "(event_simulator.py:65-73, data_loader.py:187-191).",
    tags=("agg", "tier-a"),
)
def q_event_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"))
    return counts.select(
        "event_type", "n_events",
        (F.col("n_events") / F.sum("n_events").over(Window.partitionBy()))
        .alias("share"),
    )


@query(
    "conditional_counts",
    """
    SELECT CAST(count(*) FILTER (WHERE user_id % 7 != 0) AS BIGINT) AS n_identified,
           CAST(count(*) FILTER (WHERE user_id % 7 = 0) AS BIGINT) AS n_anonymous,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
           CAST(count(*) AS BIGINT) AS n_total
    FROM events
    """,
    doc="A2: conditional counts in one scan (count_if), mirroring the "
        "identified/anonymous split (data_loader.py:194-196).",
    tags=("agg", "tier-a"),
)
def q_conditional_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count_if(F.col("user_id") % 7 != 0).alias("n_identified"),
        F.count_if(F.col("user_id") % 7 == 0).alias("n_anonymous"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "timestamp_span",
    """
    SELECT min(ts) AS first_ts, max(ts) AS last_ts,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS span_ms,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    """,
    doc="A3: stream time span (event_simulator.py:150-152).",
    tags=("agg", "tier-a"),
)
def q_timestamp_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts")))
        .alias("span_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "returns_ratio",
    """
    SELECT CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_returns,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS return_rate
    FROM lineitem
    """,
    doc="A4: filtered count + ratio of returns (data_loader.py:87-89).",
    tags=("agg", "tier-a"),
)
def q_returns_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    is_return = F.col("l_returnflag") == "R"
    return lineitem.agg(
        F.count_if(is_return).alias("n_returns"),
        F.count(F.lit(1)).alias("n_total"),
        (F.count_if(is_return).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("return_rate"),
    )


def hourly_revenue_frame(events: DataFrame,
                         distinct: str = "exact") -> DataFrame:
    """A6 shared builder — ONE implementation, two certified
    distinct-count modes (VERDICT r3 stretch #9):

    * ``exact``  — countDistinct; the batch materialized view.
    * ``hll``    — Datasketches HLL estimate (sketches.py plumbing);
      the mode a 100 TB deployment runs, and the SAME expression the
      streaming twin aggregates, so batch-hll and streaming agree
      EXACTLY (HLL registers are order-insensitive — estimate is a
      pure function of the input set, certified in
      test_streaming.test_streaming_hourly_revenue_matches_batch).
    """
    from ecommerce_analytics_spark.operators.sketches import hll_uniques

    uniq = (F.countDistinct("user_id") if distinct == "exact"
            else hll_uniques("user_id"))
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_timestamp"))
        .agg(
            money_sum("value").alias("total_revenue"),
            F.count(F.lit(1)).alias("order_count"),
            uniq.alias("unique_customers"),
        )
    )


@query(
    "hourly_revenue",
    f"""
    SELECT date_trunc('hour', ts) AS hour_timestamp,
           {_VALUE_SUM_SQL} AS total_revenue,
           CAST(count(*) AS BIGINT) AS order_count,
           CAST(count(DISTINCT user_id) AS BIGINT) AS unique_customers
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY date_trunc('hour', ts)
    """,
    doc="A6/T4: tumbling hourly revenue materialized view "
        "(init-db.js:40-65) — batch formulation (exact mode of the "
        "shared two-mode builder); streaming twin aggregates the same "
        "frame with withWatermark + window() in streaming/windows.py.",
    tags=("agg", "window", "tier-b", "stream-parity"),
)
def q_hourly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return hourly_revenue_frame(events, distinct="exact")


@query(
    "hourly_revenue_hll_vs_exact",
    f"""
    SELECT date_trunc('hour', ts) AS hour_timestamp,
           {_VALUE_SUM_SQL} AS total_revenue,
           CAST(count(*) AS BIGINT) AS order_count,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_uniques,
           TRUE AS est_within_tol
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY date_trunc('hour', ts)
    """,
    doc="Driver-certifiable companion for the HLL mode of the shared "
        "hourly-revenue builder (the daily_unique_users_sketch_vs_exact "
        "pattern): identical skeleton with the exact distinct alongside "
        "the sketch estimate, accuracy emitted as a hash-matched "
        "boolean. Certifies that flipping the mode flag changes ONLY "
        "the distinct strategy — revenue/order columns stay "
        "hash-identical to the exact query.",
    tags=("agg", "sketch", "approx", "stream-parity"),
)
def q_hourly_revenue_hll_vs_exact(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.operators.sketches import (
        HLL_REL_TOL, hll_uniques,
    )

    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_timestamp"))
        .agg(
            money_sum("value").alias("total_revenue"),
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("user_id").alias("exact_uniques"),
            hll_uniques("user_id").alias("est"),
        )
        .select(
            "hour_timestamp", "total_revenue", "order_count",
            "exact_uniques",
            (F.abs(F.col("est") - F.col("exact_uniques"))
             <= HLL_REL_TOL * F.col("exact_uniques"))
            .alias("est_within_tol"))
    )


@query(
    "popular_products",
    f"""
    SELECT l.l_partkey AS product_id,
           any_value(p.p_name) AS product_name,
           sum(l.l_quantity) AS total_quantity,
           {disc_price_sum_sql('l.l_extendedprice', 'l.l_discount')} AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY l.l_partkey
    ORDER BY total_quantity DESC, product_id
    LIMIT 20
    """,
    doc="A7/O3: popular-products top-k (init-db.js:67-92, desc index "
        ":148). Broadcast dim join + partial agg + TakeOrderedAndProject; "
        "the limit-k cutoff is deterministic (integer-valued quantities, "
        "product_id tiebreak).",
    tags=("agg", "topk", "tier-b"),
)
def q_popular_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # Name attach AFTER the fact aggregation (round 11, guide §2.3):
    # any_value(p_name)'s string aggregation buffer is not
    # hash-aggregatable, so carrying the name through the fact groupBy
    # forced SortAggregate — the fact-joined rows were SORTED twice
    # (partial + final) instead of hash-aggregated. Numeric-only
    # buffers restore HashAggregate on the fact side; the per-product
    # name comes from the broadcast dim aggregated on its own (the
    # candidate-value set per key is identical, so any_value picks
    # from the same names).
    #
    # Duplicate-dim multiplicity (round 11 hostile-salted-retail
    # catch): the oracle joins BEFORE aggregating, so k duplicate part
    # rows for one partkey multiply every lineitem row k-fold into
    # both sums. The dim aggregate therefore carries k = count(*) and
    # the fact sums are scaled by k AFTER aggregation — inside the
    # exact integer domain (quantities are integer-valued doubles,
    # revenue stays in 1e-4-dollar LONG units and converts to dollars
    # only after the multiply), so the scaled sums are bit-identical
    # to summing the k-fold rows. Products absent from part drop
    # either way (inner join).
    from ecommerce_analytics_spark.numerics import cents
    rev_units = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    sums = (lineitem
            .groupBy(F.col("l_partkey").alias("product_id"))
            .agg(F.sum("l_quantity").alias("_qty"),
                 F.sum(rev_units).alias("_rev_units")))
    names = (part.groupBy(F.col("p_partkey").alias("product_id"))
             .agg(F.any_value("p_name").alias("product_name"),
                  F.count(F.lit(1)).alias("_k")))
    return (
        sums.join(F.broadcast(names), "product_id")
        .select("product_id", "product_name",
                (F.col("_qty") * F.col("_k")).alias("total_quantity"),
                F.round((F.col("_rev_units").cast("decimal(28,0)")
                         * F.col("_k")).cast("decimal(28,0)")
                        * F.lit("0.0001").cast("decimal(5,4)"), 2)
                .cast("double").alias("total_revenue"))
        .orderBy(F.desc("total_quantity"), F.asc("product_id"))
        .limit(20)
    )


@query(
    "distinct_user_event_pairs",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="A8: exact distinct (unique-key enforcement analog, "
        "init-db.js:140) — hash-shuffle dedup.",
    tags=("dedup", "tier-a"),
)
def q_distinct_user_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select("user_id", "event_type").distinct()


@query(
    "daily_revenue_rollup",
    f"""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           event_type,
           {_VALUE_SUM_SQL} AS total_value,
           CAST(count(*) AS BIGINT) AS n_events,
           round({_VALUE_SUM_SQL} / count(*), 6) AS avg_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
    FROM events
    GROUP BY 1, 2
    """,
    doc="C7-shaped rollup keyed by the lake partition columns "
        "(event_date, event_type) — the aggregate that partition "
        "pruning serves at 100 TB.",
    tags=("agg", "tier-c"),
)
def q_daily_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        "event_type",
    ).agg(
        # avg derived from the exact sum: raw float avgs can straddle
        # a rounding boundary across engines (seen at sf0.01)
        money_sum("value").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(money_sum("value") / F.count(F.lit(1)), 6)
        .alias("avg_value"),
        F.countDistinct("user_id").alias("unique_users"),
    )


HIST_WIDTH = 25.0  # events.value spans ~0..500 → ~20 buckets


@query(
    "value_histogram",
    f"""
    WITH b AS (
      SELECT CAST(floor(value / {HIST_WIDTH}) AS INTEGER) AS bucket,
             value
      FROM events
    ), agg AS (
      SELECT bucket,
             round(bucket * {HIST_WIDTH}, 2) AS lo,
             round((bucket + 1) * {HIST_WIDTH}, 2) AS hi,
             CAST(count(*) AS BIGINT) AS n_events,
             {money_sum_sql('value')} AS sum_value
      FROM b GROUP BY bucket
    )
    SELECT bucket, lo, hi, n_events, sum_value,
           round(CAST(n_events AS DOUBLE)
                 / sum(n_events) OVER (), 6) AS share,
           CAST(sum(n_events) OVER (
             ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_events
    FROM agg
    """,
    doc="Equi-width histogram over events.value (floor-bucket groupBy — "
        "the distributed histogram primitive) + share and cumulative "
        "counts via windows over the tiny bucket table. The wide scan "
        "aggregates map-side; only (bucket, partials) shuffle.",
    tags=("agg", "histogram"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / HIST_WIDTH).cast("int")
    agg = (
        events.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_events"),
             money_sum("value").alias("sum_value"))
        .select("bucket",
                F.round(F.col("bucket") * HIST_WIDTH, 2).alias("lo"),
                F.round((F.col("bucket") + 1) * HIST_WIDTH, 2).alias("hi"),
                "n_events", "sum_value")
    )
    w_all = Window.partitionBy()
    w_cum = (Window.partitionBy().orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return agg.select(
        "bucket", "lo", "hi", "n_events", "sum_value",
        F.round(F.col("n_events").cast("double")
                / F.sum("n_events").over(w_all), 6).alias("share"),
        F.sum("n_events").over(w_cum).cast("long").alias("cum_events"),
    )


@query(
    "sliding_window_revenue",
    f"""
    WITH win AS (
      SELECT strftime(make_timestamp(
               (epoch_us(ts) // 900000000) * 900000000 - k * 900000000),
               '%Y-%m-%d %H:%M:%S') AS window_start,
             value, user_id
      FROM events, unnest(generate_series(0, 3)) AS u(k)
    )
    SELECT window_start,
           {_VALUE_SUM_SQL} AS revenue,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
    FROM win GROUP BY window_start
    """,
    doc="T4 sliding window: 1-hour windows every 15 minutes (each event "
        "contributes to 4 overlapping windows — Spark's window() slide "
        "duration; the oracle materializes the same 4 aligned starts "
        "per event). The streaming twin is the identical expression "
        "behind readStream + withWatermark. Window starts emitted as "
        "strings (timestamp reprs differ across engines).",
    tags=("agg", "window", "tier-b", "stream-parity"),
)
def q_sliding_window_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(money_sum("value").alias("revenue"),
             F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("unique_users"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"),
                "revenue", "n_events", "unique_users")
    )


@query(
    "post_purchase_attribution",
    f"""
    SELECT p.event_id AS purchase_event_id,
           CAST(count(*) AS BIGINT) AS n_follow_events,
           CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_event_types,
           {money_sum_sql('e.value')} AS follow_value
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts > p.ts
     AND e.ts <= p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc="Range join (equi + band predicate): for every purchase, the "
        "same user's events in the following hour — the attribution/"
        "feature-window shape. Catalyst plans the equi key (user_id) as "
        "the join and evaluates the time band as a residual — one "
        "shuffle on the key, never a cross product; per-user event "
        "rates bound the band fan-out at any scale.",
    tags=("join", "range", "window"),
)
def q_post_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    p = (events.filter(F.col("event_type") == "purchase")
         .select(F.col("event_id").alias("p_event_id"),
                 F.col("user_id").alias("p_user_id"),
                 F.col("ts").alias("p_ts")))
    return (
        p.join(
            events,
            (events.user_id == F.col("p_user_id"))
            & (events.ts > F.col("p_ts"))
            & (events.ts <= F.col("p_ts") + F.expr("INTERVAL 1 HOUR")))
        .groupBy(F.col("p_event_id").alias("purchase_event_id"))
        .agg(F.count(F.lit(1)).alias("n_follow_events"),
             F.countDistinct("event_type").alias("n_event_types"),
             money_sum("value").alias("follow_value"))
    )


@query(
    "top_product_per_nation",
    f"""
    WITH rp AS (
      SELECT n.n_name AS nation, l.l_partkey AS product_id,
             {disc_price_sum_sql('l.l_extendedprice', 'l.l_discount')}
               AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (
          PARTITION BY nation ORDER BY revenue DESC, product_id) AS rn
      FROM rp
    )
    SELECT nation, product_id, revenue FROM ranked WHERE rn = 1
    """,
    doc="Per-group argmax WITHOUT a window: the top revenue product "
        "per supplier nation via max(struct(revenue, -product_id)) — "
        "an aggregation, so it partial-aggregates map-side and the "
        "per-nation state is ONE struct, where the window top-1 the "
        "oracle runs would sort every (nation, product) row. Exact "
        "2-dec revenue makes the struct comparison deterministic; "
        "the negated id breaks revenue ties toward the smaller "
        "product, matching the oracle's ORDER BY. Two exchanges: the "
        "(nation, product) rollup and a 25-row argmax.",
    tags=("agg", "topk", "scale"),
)
def q_top_product_per_nation(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rp = (lineitem
          .join(F.broadcast(supplier),
                lineitem.l_suppkey == supplier.s_suppkey)
          .join(F.broadcast(nation),
                supplier.s_nationkey == nation.n_nationkey)
          .groupBy(F.col("n_name").alias("nation"),
                   F.col("l_partkey").alias("product_id"))
          .agg(disc_price_sum().alias("revenue")))
    top = (rp.groupBy("nation")
           .agg(F.max(F.struct(
               F.col("revenue"),
               (-F.col("product_id")).alias("neg_pid"))).alias("m")))
    return top.select(
        "nation",
        (-F.col("m.neg_pid")).cast("long").alias("product_id"),
        F.col("m.revenue").alias("revenue"))


_NEW_RETURNING_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), fd AS (
  SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id
)
SELECT strftime(u.day, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN u.day = f.first_day THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN u.day = f.first_day THEN 0 ELSE 1 END)
            AS BIGINT) AS n_returning,
       round(CAST(sum(CASE WHEN u.day = f.first_day THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS new_share
FROM ud u JOIN fd f ON f.user_id = u.user_id
GROUP BY u.day
"""


@query(
    "daily_new_vs_returning",
    _NEW_RETURNING_ORACLE,
    doc="Daily active users decomposed into new (first-ever-seen that "
        "day) vs returning — the growth-accounting curve every "
        "product dashboard leads with. Shuffle profile: ONE user-hash "
        "exchange serves both the (user, day) distinct and the "
        "per-user min-day aggregate, and the join back on user_id is "
        "co-partitioned on it; the final day groupBy moves only "
        "per-day counts. All counts exact integers; the one ratio "
        "divides at the end.",
    tags=("agg", "window", "tier-b"),
)
def q_daily_new_vs_returning(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ud = (events.select("user_id", F.to_date("ts").alias("day"))
          .distinct())
    fd = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = F.sum(F.when(F.col("day") == F.col("first_day"), 1)
                   .otherwise(0))
    return (ud.join(fd, "user_id")
            .groupBy("day")
            .agg(F.count(F.lit(1)).cast("long").alias("n_active"),
                 is_new.cast("long").alias("n_new"),
                 (F.count(F.lit(1)) - is_new).cast("long")
                 .alias("n_returning"),
                 F.round(is_new.cast("double") / F.count(F.lit(1)), 6)
                 .alias("new_share"))
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_active", "n_new", "n_returning", "new_share"))
