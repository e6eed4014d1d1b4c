"""Sorts / limits / top-k (SURVEY.md §2.5, O1-O3).

Global sorts range-partition (Spark samples boundaries, no single-node
bottleneck); top-k compiles to TakeOrderedAndProject (per-partition
heaps + driver merge of k rows — no full sort at any scale). Every
limit has a total tie-break so the selected set is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import money_sum, money_sum_sql
from ecommerce_analytics_spark.plans.registry import query


@query(
    "earliest_events",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    ORDER BY ts, event_id
    LIMIT 100
    """,
    doc="O1+limit: global time order (data_loader.py:105, "
        "event_simulator.py:147) — range-partitioned sort, "
        "TakeOrderedAndProject under the limit.",
    tags=("sort", "tier-a"),
)
def q_earliest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts", "event_id")
        .limit(100)
    )


@query(
    "top_events_per_user",
    """
    SELECT user_id, event_id, ts, value, rnk FROM (
      SELECT user_id, event_id, ts, value,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id
             ) AS INTEGER) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
    doc="Top-k per group — window row_number, one shuffle on the group "
        "key; the pattern behind every per-entity leaderboard.",
    tags=("sort", "window", "topk"),
)
def q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id"))
    return (
        events.select("user_id", "event_id", "ts", "value",
                      F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "top_customers_by_spend",
    f"""
    SELECT o_custkey AS customer_id,
           {money_sum_sql('o_totalprice')} AS total_spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spend DESC, customer_id
    LIMIT 25
    """,
    doc="O2/O3: agg + order desc + limit → partial agg then "
        "TakeOrderedAndProject (k rows cross the wire, not the table).",
    tags=("sort", "agg", "topk"),
)
def q_top_customers_by_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(money_sum("o_totalprice").alias("total_spend"),
             F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("total_spend"), F.asc("customer_id"))
        .limit(25)
    )
