"""Extended window / OLAP operators.

Beyond the reference's own surface: sessionization (the gap-based
session assignment every event platform needs), lead/lag/rank
analytics, pivot, hierarchical rollup, exact percentiles, and set
operations — each a first-class Spark capability with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import money_sum, money_sum_sql
from ecommerce_analytics_spark.plans.registry import query

SESSION_GAP_MS = 30 * 60 * 1000

_SESSIONIZE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, CAST(sum(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       {money_sum_sql('value')} AS total_value
FROM sess GROUP BY user_id, session_no
"""


@query(
    "sessionize",
    _SESSIONIZE_ORACLE,
    doc="Gap-based sessionization (30 min): lag + cumulative-sum session "
        "numbering, then per-session rollup — one shuffle on user_id "
        "shared by both window specs and the final groupBy.",
    tags=("window", "sessions"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
    new_sess = F.when(
        F.lag("ts").over(w).isNull() | (gap_ms > SESSION_GAP_MS), 1
    ).otherwise(0)
    sess_no = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        events
        .withColumn("session_no", sess_no.cast("long"))
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             money_sum("value").alias("total_value"))
    )


_SESSION_NATIVE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {SESSION_GAP_MS}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       {money_sum_sql('value')} AS total_value
FROM sess GROUP BY user_id, session_no
"""


@query(
    "sessionize_native",
    _SESSION_NATIVE_ORACLE,
    doc="Spark's native session_window(ts, gap) cross-validated against "
        "the first-principles lag+cumsum formulation (the oracle): both "
        "must produce identical session boundaries and rollups. "
        "session_window merges in the aggregation itself — one shuffle, "
        "no window pass.",
    tags=("window", "sessions"),
)
def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    gap = f"{SESSION_GAP_MS // 1000} seconds"
    return (
        events
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"),
             money_sum("value").alias("total_value"))
        .select("user_id", "session_start", "session_end",
                "n_events", "total_value")
    )


@query(
    "user_event_analytics",
    """
    WITH uniq AS (
      -- at-least-once delivery gate (both sides): an exact duplicate
      -- delivery of one event would make BIT-IDENTICAL rows, and the
      -- three differently-sorted windows below then pair the tied
      -- rows' positions inconsistently across engines/runs (the
      -- retail.transactions tie-pairing class, found by the
      -- duplicate-delivery probe) — analyze each EVENT once
      SELECT DISTINCT * FROM events
    )
    SELECT user_id, event_id, ts, value,
           epoch_ms(ts) - epoch_ms(lag(ts) OVER w) AS ms_since_prev,
           lead(event_type, 1) OVER w AS next_event_type,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
                AS INTEGER) AS value_rank,
           CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY event_type)
                AS INTEGER) AS type_rank,
           CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id)
                AS INTEGER) AS value_quartile
    FROM uniq
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="lead/lag/rank/dense_rank/ntile in one pass — all five window "
        "functions share the user_id exchange; Catalyst collapses the "
        "same-spec ones into one Window operator. A full-row DISTINCT "
        "gates at-least-once duplicate deliveries on both sides "
        "(tests/test_hostile_dup_events.py).",
    tags=("window",),
)
def q_user_event_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").distinct()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id", "event_id", "ts", "value",
        (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)))
        .alias("ms_since_prev"),
        F.lead("event_type", 1).over(w).alias("next_event_type"),
        F.rank().over(Window.partitionBy("user_id")
                      .orderBy(F.desc("value"), F.asc("event_id")))
        .alias("value_rank"),
        F.dense_rank().over(Window.partitionBy("user_id")
                            .orderBy("event_type")).alias("type_rank"),
        F.ntile(4).over(Window.partitionBy("user_id")
                        .orderBy("value", "event_id"))
        .alias("value_quartile"),
    )


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]

_PIVOT_ORACLE = """
SELECT strftime(ts, '%Y-%m-%d') AS event_date,
""" + ",\n".join(
    f"       CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
    for t in _EVENT_TYPES) + """
FROM events GROUP BY 1
"""


@query(
    "daily_event_type_pivot",
    _PIVOT_ORACLE,
    doc="Pivot: event-type counts as columns per day. Explicit pivot "
        "values keep it one pass (no distinct-scan to discover columns).",
    tags=("pivot", "agg"),
)
def q_daily_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


_ROLLUP_ORACLE = f"""
SELECT coalesce(r.r_name, '(all)') AS region_name,
       coalesce(n.n_name, '(all)') AS nation_name,
       CAST(grouping(r.r_name) AS INTEGER) AS is_region_total,
       CAST(grouping(n.n_name) AS INTEGER) AS is_nation_total,
       {money_sum_sql('o.o_totalprice')} AS total_spend,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
"""


@query(
    "spend_rollup_region_nation",
    _ROLLUP_ORACLE,
    doc="Hierarchical ROLLUP(region, nation) with grouping flags — "
        "subtotals and grand total in one aggregation pass (Spark "
        "Expand + partial agg).",
    tags=("agg", "rollup"),
)
def q_spend_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        orders
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(money_sum("o_totalprice").alias("total_spend"),
             F.count(F.lit(1)).alias("n_orders"),
             F.grouping("r_name").cast("int").alias("is_region_total"),
             F.grouping("n_name").cast("int").alias("is_nation_total"))
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation_name"),
            "is_region_total", "is_nation_total", "total_spend", "n_orders")
    )


@query(
    "value_percentiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact percentiles (linear interpolation) per event type — "
        "Spark's exact percentile() here; at 100 TB the same query swaps "
        "to approx_percentile (t-digest) with a documented error bound.",
    tags=("agg", "percentile"),
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@query(
    "building_customers_with_orders",
    """
    SELECT c_custkey AS customer_id FROM customer
    WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS customer_id FROM orders
    """,
    doc="Set op INTERSECT (distinct semantics) — compiles to a left-semi "
        "aggregate join.",
    tags=("setop",),
)
def q_building_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = (customer.filter(F.col("c_mktsegment") == "BUILDING")
                .select(F.col("c_custkey").alias("customer_id")))
    with_orders = orders.select(F.col("o_custkey").alias("customer_id"))
    return building.intersect(with_orders)


@query(
    "trailing_7day_revenue",
    f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
               AS day_num,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS event_date,
             {money_sum_sql('value')} AS revenue
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT event_date, revenue,
           CAST(sum(CAST(revenue AS DECIMAL(18,2))) OVER (
             ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_7d
    FROM daily
    """,
    doc="RANGE-frame window (the frame type ROWS can't express): "
        "per-day revenue plus the trailing-7-calendar-day sum, ordered "
        "by integer day number so gaps in the calendar shrink the frame "
        "— a ROWS frame would wrongly span 7 *observed* days. The "
        "windowed sum accumulates in DECIMAL: segment-tree (DuckDB) vs "
        "running (Spark) frame evaluation associate double adds "
        "differently, decimal is order-free. Fact-table work is the "
        "same single-shuffle daily partial agg as hourly_revenue; the "
        "window runs on the tiny daily series.",
    tags=("window", "agg"),
)
def q_trailing_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(money_sum("value").alias("revenue"))
        .select(F.datediff("day", F.lit("1970-01-01").cast("date"))
                .cast("long").alias("day_num"),
                F.date_format("day", "yyyy-MM-dd").alias("event_date"),
                "revenue")
    )
    w = (Window.orderBy("day_num").rangeBetween(-6, Window.currentRow))
    return daily.select(
        "event_date", "revenue",
        F.sum(F.col("revenue").cast("decimal(18,2)")).over(w)
        .cast("double").alias("revenue_7d"))


@query(
    "brand_exclusive_types",
    """
    SELECT p_type FROM part WHERE p_brand = 'Brand#12'
    EXCEPT
    SELECT p_type FROM part WHERE p_brand = 'Brand#34'
    """,
    doc="Set op EXCEPT (distinct semantics) — part types one brand "
        "sells that another never does; compiles to a left-anti "
        "aggregate join (completes the set-op family with INTERSECT "
        "at building_customers_with_orders and the anti/semi joins).",
    tags=("setop",),
)
def q_brand_exclusive_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    a = (part.filter(F.col("p_brand") == "Brand#12").select("p_type"))
    b = (part.filter(F.col("p_brand") == "Brand#34").select("p_type"))
    return a.subtract(b)


@query(
    "part_name_analysis",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 12) AS name_prefix,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           CAST(length(p_name) AS INTEGER) AS name_len,
           CAST(levenshtein(p_brand, p_type) AS INTEGER) AS brand_type_lev,
           contains(p_type, 'BRASS') AS is_brass
    FROM part
    """,
    doc="String-function family: case, substring, global regexp_replace, "
        "length, levenshtein, contains — all JVM-side builtins.",
    tags=("strings",),
)
def q_part_name_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.length("p_name").alias("name_len"),
        F.levenshtein("p_brand", "p_type").alias("brand_type_lev"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
    )


_CUBE_ORACLE = f"""
SELECT coalesce(c.c_mktsegment, '(all)') AS segment,
       coalesce(o.o_orderpriority, '(all)') AS priority,
       CAST(grouping(c.c_mktsegment) AS INTEGER) AS is_segment_total,
       CAST(grouping(o.o_orderpriority) AS INTEGER) AS is_priority_total,
       {money_sum_sql('o.o_totalprice')} AS total_spend,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY CUBE(c.c_mktsegment, o.o_orderpriority)
"""


@query(
    "spend_cube_segment_priority",
    _CUBE_ORACLE,
    doc="CUBE(segment, priority) with grouping flags — all four "
        "grouping sets (detail, both marginals, grand total) in one "
        "aggregation pass. Spark Expand replicates each input row per "
        "grouping set BEFORE the partial agg, so the exchange carries "
        "(set, keys, partials), not raw rows ×4 — same contract as "
        "ROLLUP; combined they cover the GROUPING SETS family.",
    tags=("agg", "rollup"),
)
def q_spend_cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    return (
        joined.cube("c_mktsegment", "o_orderpriority")
        .agg(money_sum("o_totalprice").alias("total_spend"),
             F.count(F.lit(1)).alias("n_orders"),
             F.grouping("c_mktsegment").cast("int").alias("is_segment_total"),
             F.grouping("o_orderpriority").cast("int").alias("is_priority_total"))
        .select(
            F.coalesce("c_mktsegment", F.lit("(all)")).alias("segment"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "is_segment_total", "is_priority_total",
            "total_spend", "n_orders")
    )


@query(
    "customer_spend_deciles",
    f"""
    WITH spend AS (
      SELECT o_custkey AS customer_id,
             CAST(count(*) AS BIGINT) AS n_orders,
             {money_sum_sql('o_totalprice')} AS total_spend
      FROM orders GROUP BY o_custkey
    )
    SELECT customer_id, n_orders, total_spend,
           CAST(ntile(10) OVER w AS INTEGER) AS spend_decile,
           round(percent_rank() OVER w, 9) AS pct_rank,
           round(cume_dist() OVER w, 9) AS cum_dist
    FROM spend
    WINDOW w AS (ORDER BY total_spend DESC, customer_id)
    """,
    doc="Distribution-rank window breadth: ntile deciles, "
        "percent_rank, cume_dist over per-customer total spend — the "
        "marketing-tier assignment query. Total ordering (exact spend "
        "desc, custkey) makes every rank engine-deterministic; one "
        "aggregation shuffle then one global sort of the compact "
        "per-customer table (entity cardinality, not fact rows).",
    tags=("window", "agg"),
)
def q_customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    spend = (orders.groupBy(F.col("o_custkey").alias("customer_id"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  money_sum("o_totalprice").alias("total_spend")))
    w = Window.orderBy(F.desc("total_spend"), F.asc("customer_id"))
    return spend.select(
        "customer_id", "n_orders", "total_spend",
        F.ntile(10).over(w).alias("spend_decile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cum_dist"))


_UNPIVOT_ORACLE = """
WITH p AS (
  SELECT strftime(ts, '%Y-%m-%d') AS event_date,
""" + ",\n".join(
    f"       CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
    f" AS {t}" for t in _EVENT_TYPES) + """
  FROM events GROUP BY 1
)
SELECT event_date, event_type, n_events
FROM p
UNPIVOT (n_events FOR event_type IN (""" + ", ".join(_EVENT_TYPES) + """))
WHERE n_events > 0
"""


@query(
    "daily_event_type_unpivot",
    _UNPIVOT_ORACLE,
    doc="Unpivot (melt): the wide per-day pivot back to long "
        "(event_date, event_type, n_events) rows via the native "
        "unpivot operator on both engines — the pivot/unpivot pair "
        "closes the reshaping surface. Zero-count cells are dropped "
        "on both sides (Spark's pivot materializes them, the long "
        "form's groupBy wouldn't), keeping the roundtrip equal to "
        "the direct (day, type) rollup. Map-only on the 30-row pivot "
        "result — no extra shuffle beyond the pivot's own.",
    tags=("pivot", "agg"),
)
def q_daily_event_type_unpivot(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    wide = q_daily_event_type_pivot(spark, sf_dir)
    return (wide.unpivot("event_date", _EVENT_TYPES,
                         "event_type", "n_events")
            .filter(F.col("n_events") > 0)
            .select("event_date", "event_type",
                    F.col("n_events").cast("long").alias("n_events")))


@query(
    "value_distribution_ranks",
    """
    SELECT event_id, event_type, value,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    WINDOW w AS (PARTITION BY event_type ORDER BY value)
    """,
    doc="percent_rank + cume_dist (the two normalized ranking "
        "functions user_event_analytics doesn't cover): per-type "
        "value distribution position. Tie handling is part of the "
        "function definition (equal values share a rank), so no "
        "tie-break column is needed and the rational outputs — "
        "integer-over-integer divisions — are IEEE-identical across "
        "engines unrounded. One hash exchange on event_type.",
    tags=("window",),
)
def q_value_distribution_ranks(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return (events
            .filter(F.col("event_type").isin("purchase", "signup"))
            .select("event_id", "event_type", "value",
                    F.percent_rank().over(w).alias("pct_rank"),
                    F.cume_dist().over(w).alias("cume")))


CONVERSION_TYPES = ["purchase", "signup"]


@query(
    "user_type_set_algebra",
    f"""
    WITH sets AS (
      SELECT user_id,
             list_sort(list(DISTINCT event_type)) AS types
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           to_json(types) AS all_types,
           to_json(list_sort(list_intersect(types,
               {CONVERSION_TYPES!r}))) AS conversion_types,
           to_json(list_sort(list_filter(types,
               t -> NOT list_contains({CONVERSION_TYPES!r}, t))))
             AS browse_types,
           CAST(len(types) AS INT) AS n_types
    FROM sets
    """,
    doc="Array set algebra over per-user event-type sets: "
        "array_intersect/array_except against the conversion-type "
        "list, emitted through the to_json edge (full content "
        "hash-certified, the docs/SCALE.md pattern). collect_set → "
        "array_sort makes the set deterministic before any set op; "
        "one user_id exchange total.",
    tags=("array", "agg"),
)
def q_user_type_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    conv = F.array(*[F.lit(t) for t in CONVERSION_TYPES])
    sets = (events.groupBy("user_id")
            .agg(F.array_sort(F.collect_set("event_type")).alias("types")))
    return sets.select(
        "user_id",
        F.to_json("types").alias("all_types"),
        F.to_json(F.array_sort(F.array_intersect("types", conv)))
        .alias("conversion_types"),
        F.to_json(F.array_sort(F.array_except("types", conv)))
        .alias("browse_types"),
        F.size("types").cast("int").alias("n_types"))


@query(
    "trailing_7day_unique_users",
    """
    WITH du AS (
      SELECT DISTINCT
             date_diff('day', DATE '1970-01-01', date_trunc('day', ts))
               AS day_num,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS event_date,
             user_id
      FROM events WHERE user_id IS NOT NULL
    ), days AS (
      SELECT DISTINCT day_num, event_date FROM du
    ), a1 AS (
      SELECT day_num, CAST(count(DISTINCT user_id) AS BIGINT) AS users_1d
      FROM du GROUP BY day_num
    ), a7 AS (
      SELECT d.day_num, CAST(count(DISTINCT u.user_id) AS BIGINT) AS users_7d
      FROM days d JOIN du u
        ON u.day_num BETWEEN d.day_num - 6 AND d.day_num
      GROUP BY d.day_num
    )
    SELECT days.event_date, a1.users_1d, a7.users_7d
    FROM days
    JOIN a1 ON a1.day_num = days.day_num
    JOIN a7 ON a7.day_num = days.day_num
    """,
    doc="Trailing-7-day DISTINCT users — the rolling metric a window "
        "frame cannot express (distinct doesn't decompose over frame "
        "slides, and a RANGE frame with count(DISTINCT) is unsupported "
        "in both engines). The scalable shape: explode each distinct "
        "(day, user) pair into the ≤7 target days it contributes to — "
        "a BOUNDED 7x fan-out of the already-day-deduped pairs, not of "
        "raw events — then one countDistinct shuffle keyed by target "
        "day. Joined back to observed days so phantom trailing days "
        "past the data edge drop out. The oracle runs the equivalent "
        "range self-join; integer counts hash-match exactly.",
    tags=("window", "agg", "distinct", "scale"),
)
def q_trailing_7day_unique_users(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    events = (load_table(spark, sf_dir, "events")
              .filter(F.col("user_id").isNotNull()))
    du = (events
          .select(F.date_trunc("day", "ts").alias("day"), "user_id")
          .select(F.datediff("day", F.lit("1970-01-01").cast("date"))
                  .cast("long").alias("day_num"),
                  F.date_format("day", "yyyy-MM-dd").alias("event_date"),
                  "user_id")
          # checkpoint the distinct (day, user) pairs: the day spine,
          # the 7-day explode and the 1-day counts all re-derive from
          # the materialized pairs instead of re-running the fact
          # distinct three times (events×3 in the plan census; round
          # 11, guide §2.4 — the user_day_overlap_hll recipe)
          .distinct().localCheckpoint(eager=True))
    days = du.select("day_num", "event_date").distinct()
    exp = (du.select(
        "day_num", "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"))
        .select((F.col("day_num") + F.col("off")).alias("tgt"), "user_id"))
    a7 = (exp.groupBy("tgt")
          .agg(F.countDistinct("user_id").alias("users_7d")))
    a1 = (du.groupBy("day_num")
          .agg(F.countDistinct("user_id").alias("users_1d")))
    return (days.join(a1, "day_num")
            .join(a7, days.day_num == a7.tgt)
            .select("event_date", "users_1d", "users_7d"))
