"""Funnel, cohort-retention, and association-rule analytics.

Three classic product-analytics shapes the reference's dashboards
imply but never implement (README.md "user behavior analysis"), each
fully declarative and oracle-checked:

- ``conversion_funnel`` — ordered-step funnel (view → click →
  purchase): a user converts step k only with an event strictly after
  their step-(k-1) time. Per-step first-times via ordered conditional
  MIN aggregation (two window-free passes over one user-keyed
  aggregate), then one global rollup row per step. At 100 TB: one
  user-hash shuffle, funnel state = |users| rows.
- ``weekly_cohort_retention`` — users grouped by first-seen week
  (cohort), counted as retained in each later week they were active:
  first-seen via per-user MIN, activity weeks via DISTINCT (user,
  week), one compact equi-join. The (cohort_week, week_offset)
  retention triangle every growth dashboard draws.
- ``basket_association_rules`` — support / confidence / lift for
  co-purchased product pairs (both directions), from the same
  single-scan basket aggregate as product_recommendations; ratios of
  exact integers so every metric is engine-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

FUNNEL_STEPS = ("view", "click", "purchase")
MIN_PAIR_BASKETS = 3  # association-rule support cut


_FUNNEL_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'view') AS t1
  FROM events GROUP BY user_id
), s2 AS (
  SELECT e.user_id, p.t1,
         min(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > p.t1)
           AS t2
  FROM events e JOIN per_user p ON e.user_id = p.user_id
  GROUP BY e.user_id, p.t1
), s3 AS (
  SELECT e.user_id, s2.t1, s2.t2,
         min(e.ts) FILTER (WHERE e.event_type = 'purchase'
                             AND e.ts > s2.t2) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  GROUP BY e.user_id, s2.t1, s2.t2
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(t1) AS BIGINT) AS n_view,
       CAST(count(t2) AS BIGINT) AS n_view_click,
       CAST(count(t3) AS BIGINT) AS n_view_click_purchase,
       round(CAST(count(t2) AS DOUBLE) / nullif(count(t1), 0), 6)
         AS click_conversion,
       round(CAST(count(t3) AS DOUBLE) / nullif(count(t2), 0), 6)
         AS purchase_conversion
FROM s3
"""


@query(
    "conversion_funnel",
    _FUNNEL_ORACLE,
    doc="Ordered-step funnel view→click→purchase: a user advances a "
        "step only with an event STRICTLY AFTER their previous step's "
        "first time (the semantics naive per-type mins get wrong — a "
        "purchase before the first view must not count). Three "
        "user-keyed conditional-min aggregates sharing one hash "
        "partitioning, then a single rollup row; nullif-guarded "
        "conversion ratios.",
    tags=("agg", "window", "tier-c"),
)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    # three stacked windows over the SAME partition key — Catalyst
    # plans ONE user-hash exchange with chained Window operators (a
    # per-step join of the fact table would shuffle events k times
    # for a k-step funnel)
    w = Window.partitionBy("user_id")
    stepped = (
        events
        .withColumn("t1", F.min(F.when(
            F.col("event_type") == FUNNEL_STEPS[0], F.col("ts"))).over(w))
        .withColumn("t2", F.min(F.when(
            (F.col("event_type") == FUNNEL_STEPS[1])
            & (F.col("ts") > F.col("t1")), F.col("ts"))).over(w))
        .withColumn("t3", F.min(F.when(
            (F.col("event_type") == FUNNEL_STEPS[2])
            & (F.col("ts") > F.col("t2")), F.col("ts"))).over(w))
    )
    per_user = (stepped.groupBy("user_id")
                .agg(F.first("t1").alias("t1"), F.first("t2").alias("t2"),
                     F.first("t3").alias("t3")))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_view_click_purchase"),
        F.round(F.count("t2").cast("double")
                / F.nullif(F.count("t1"), F.lit(0)), 6)
        .alias("click_conversion"),
        F.round(F.count("t3").cast("double")
                / F.nullif(F.count("t2"), F.lit(0)), 6)
        .alias("purchase_conversion"))


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS DATE) AS active_week
  FROM events
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('week', f.cohort_week, a.active_week) AS INTEGER)
         AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       round(CAST(count(*) AS DOUBLE)
             / any_value(c.cohort_size), 6) AS retention
FROM firsts f
JOIN activity a ON f.user_id = a.user_id
JOIN (SELECT cohort_week, count(*) AS cohort_size
      FROM firsts GROUP BY cohort_week) c
  ON c.cohort_week = f.cohort_week
GROUP BY f.cohort_week, date_diff('week', f.cohort_week, a.active_week)
"""


@query(
    "weekly_cohort_retention",
    _COHORT_ORACLE,
    doc="Cohort retention triangle: users bucketed by first-seen week, "
        "counted once per later active week, retention = active / "
        "cohort size. First-seen and distinct-activity aggregates "
        "share the user-hash shuffle; week arithmetic on DATE-truncated "
        "Mondays is exact integer day math so offsets are "
        "engine-deterministic. At 100 TB state is |users| + |user, "
        "week| rows — entity-bounded, never fact-sized.",
    tags=("agg", "timeseries", "tier-c"),
)
def q_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    # cohort via a user-partitioned window, then (user, cohort, week)
    # dedup — the grouping keys are a superset of the window's
    # partition key, so Catalyst reuses the ONE user-hash exchange for
    # both (plan-asserted); the join-based formulation shuffled the
    # fact table twice and reshuffled the join
    w = Window.partitionBy("user_id")
    base = (events
            .select("user_id", F.date_trunc("week", "ts").cast("date")
                    .alias("active_week"))
            .withColumn("cohort_week", F.min("active_week").over(w)))
    pairs = base.groupBy("user_id", "cohort_week", "active_week").agg(
        F.lit(1).alias("_one"))
    # cohort size via a window over the COMPACT pairs table (every
    # user has a row with active==cohort, so counting those rows per
    # cohort counts its users) — a join against a second aggregate of
    # the same subtree would plan a second fact scan + exchange
    wc = Window.partitionBy("cohort_week")
    sized = pairs.withColumn(
        "cohort_size",
        F.count(F.when(F.col("active_week") == F.col("cohort_week"),
                       F.lit(1))).over(wc))
    return (
        sized
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("active_week", "cohort_week") / 7).cast("int")
            .alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"),
             F.round(F.count(F.lit(1)).cast("double")
                     / F.any_value("cohort_size"), 6).alias("retention"))
    )


# AS MATERIALIZED: item_counts and pair_counts are each referenced
# twice; DuckDB inlines plain CTEs per reference, recomputing the
# basket pair join per use — measured 984s / 40 output rows at sf1.0
# (round-8 scale sweep). Pure planner hint; semantics identical.
_RULES_ORACLE = f"""
WITH basket AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_orders AS (
  SELECT count(DISTINCT l_orderkey) AS n FROM basket
), item_counts AS MATERIALIZED (
  SELECT l_partkey, count(*) AS n_item FROM basket GROUP BY l_partkey
), pair_counts AS MATERIALIZED (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_pair
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_PAIR_BASKETS}
), sym AS (
  SELECT pa AS antecedent, pb AS consequent, n_pair FROM pair_counts
  UNION ALL
  SELECT pb AS antecedent, pa AS consequent, n_pair FROM pair_counts
)
SELECT s.antecedent, s.consequent,
       CAST(s.n_pair AS BIGINT) AS n_baskets,
       round(CAST(s.n_pair AS DOUBLE) / any_value(o.n), 9) AS support,
       round(CAST(s.n_pair AS DOUBLE) / ia.n_item, 9) AS confidence,
       round(CAST(s.n_pair AS DOUBLE) * any_value(o.n)
             / (ia.n_item * ic.n_item), 9) AS lift
FROM sym s
JOIN item_counts ia ON ia.l_partkey = s.antecedent
JOIN item_counts ic ON ic.l_partkey = s.consequent
CROSS JOIN n_orders o
GROUP BY s.antecedent, s.consequent, s.n_pair, ia.n_item, ic.n_item
"""


@query(
    "basket_association_rules",
    _RULES_ORACLE,
    doc=f"Association rules over co-purchase pairs (support ≥ "
        f"{MIN_PAIR_BASKETS} baskets, both directions): support, "
        f"confidence, lift — every metric a ratio of exact integers "
        f"from the single-scan basket aggregate, so values are "
        f"engine-deterministic at round 9. Item counts broadcast back "
        f"onto the pair table; the pair explode is bounded by basket "
        f"size, the market-basket shape that scales with orders, not "
        f"orders².",
    tags=("join", "agg", "tier-c"),
)
def q_basket_association_rules(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    # One fact pass for ALL THREE statistics. The former lineage
    # derived n_orders / item_counts / pairs from separate groupBys
    # over the distinct basket table, so the lineitem scan + distinct
    # exchange survived 4x in the physical plan (nothing below the
    # diverging groupBys is exchange-reusable). Instead: collect each
    # basket's distinct items ONCE (collect_set doubles as the dedup,
    # deleting the standalone distinct exchange — the cooccurrence
    # shape), then one explode emits three row kinds per basket —
    # (NULL, NULL) basket marker, (a, NULL) item marker per item,
    # (a, b) ordered pair — so basket count, per-item basket counts
    # and pair counts all come out of ONE (pa, pb) aggregation,
    # persisted lazily: the three consumers' marker filters are on the
    # GROUPING KEYS, so Catalyst pushes them below the aggregation and
    # the three exchange subtrees stop being identical (no
    # ReusedExchange) — the cache is what makes the fact pass single
    # (and it is the same magnitude as the aggregation's own shuffle
    # output, so no new memory class at scale).
    # NULL discipline: collect_set drops NULL partkeys,
    # but a NULL-keyed item row can never reach the output in either
    # engine (the oracle's pair join and final equi-joins all reject
    # NULL keys), and the basket marker still counts such orders,
    # exactly like count(DISTINCT l_orderkey).
    lineitem = load_table(spark, sf_dir, "lineitem")
    baskets = (lineitem.select("l_orderkey", "l_partkey")
               .groupBy("l_orderkey")
               .agg(F.collect_set("l_partkey").alias("items")))
    counts = (
        baskets.select(F.explode(F.expr(
            "concat(array(named_struct('pa', CAST(NULL AS BIGINT), "
            "                          'pb', CAST(NULL AS BIGINT))), "
            "       flatten(transform(items, a -> "
            "  concat(array(named_struct('pa', a, 'pb', CAST(NULL AS BIGINT))), "
            "         transform(filter(items, b -> a < b), "
            "                   b -> named_struct('pa', a, 'pb', b))))))")
        ).alias("p"))
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_row"))
        .persist()
    )
    # NB (ADVICE r11): unlike a global aggregate (always one row, n=0
    # on empty input), this is ZERO rows when lineitem is empty — the
    # output is empty either way only because `pairs` is also empty
    # and n_orders is consumed solely by the crossJoin below. Any new
    # consumer of n_orders must not rely on a row existing.
    n_orders = (counts.filter(F.col("pa").isNull() & F.col("pb").isNull())
                .select(F.col("n_row").alias("n")))
    item_counts = (counts.filter(F.col("pa").isNotNull()
                                 & F.col("pb").isNull())
                   .select(F.col("pa").alias("l_partkey"),
                           F.col("n_row").alias("n_item")))
    pairs = (counts.filter(F.col("pb").isNotNull())
             .select("pa", "pb", F.col("n_row").alias("n_pair"))
             .filter(F.col("n_pair") >= MIN_PAIR_BASKETS))
    sym = pairs.select(F.explode(F.array(
        F.struct(F.col("pa").alias("antecedent"),
                 F.col("pb").alias("consequent"), F.col("n_pair")),
        F.struct(F.col("pb").alias("antecedent"),
                 F.col("pa").alias("consequent"), F.col("n_pair")),
    )).alias("r")).select("r.antecedent", "r.consequent", "r.n_pair")
    ia = item_counts.select(F.col("l_partkey").alias("antecedent"),
                            F.col("n_item").alias("n_ante"))
    ic = item_counts.select(F.col("l_partkey").alias("consequent"),
                            F.col("n_item").alias("n_cons"))
    return (
        sym.join(F.broadcast(ia), "antecedent")
        .join(F.broadcast(ic), "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent", "consequent",
            F.col("n_pair").cast("bigint").alias("n_baskets"),
            F.round(F.col("n_pair").cast("double") / F.col("n"), 9)
            .alias("support"),
            F.round(F.col("n_pair").cast("double") / F.col("n_ante"), 9)
            .alias("confidence"),
            F.round(F.col("n_pair").cast("double") * F.col("n")
                    / (F.col("n_ante") * F.col("n_cons")), 9).alias("lift"))
    )
