"""Data-quality / constraint enforcement (SURVEY §4.2 'unique-key
enforcement at sink').

The reference enforces contracts at the MongoDB sink: JSON-schema
validators + unique indexes (init-db.js:5-150). Vanilla Spark has no
constraints, so the engine exposes them as an operator: a rule set
evaluated in ONE pass over each table (conditional counts — no
per-rule scans), emitting violation counts; writers call
``check_constraints`` before committing a sink write.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query


@dataclass
class Rule:
    name: str
    violation: Column  # boolean column: True = row violates


def check_constraints(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """One aggregation pass → (rule, n_violations) rows."""
    agg = df.agg(*[
        F.count_if(r.violation).alias(r.name) for r in rules])
    stacked = agg.selectExpr(
        "stack({n}, {pairs}) AS (rule, n_violations)".format(
            n=len(rules),
            pairs=", ".join(f"'{r.name}', {r.name}" for r in rules)))
    return stacked


_VALIDATE_ORACLE = """
SELECT 'lineitem_quantity_range' AS rule,
       CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
         AS n_violations FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5) AS BIGINT)
  FROM lineitem
UNION ALL
SELECT 'lineitem_null_orderkey',
       CAST(count(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'events_unique_event_id',
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT) FROM events
UNION ALL
SELECT 'events_value_nonnegative',
       CAST(count(*) FILTER (WHERE value < 0) AS BIGINT) FROM events
UNION ALL
SELECT 'lineitem_orphan_orderkeys',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
"""


@query(
    "constraint_violations",
    _VALIDATE_ORACLE,
    doc="Sink-contract validation (init-db.js analog): range / non-null "
        "/ unique-key / referential rules as conditional counts — one "
        "scan per table plus one anti-join for referential integrity.",
    tags=("quality", "tier-b"),
)
def q_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")

    li_rules = check_constraints(lineitem, [
        Rule("lineitem_quantity_range",
             (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
        Rule("lineitem_discount_range",
             (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5)),
        Rule("lineitem_null_orderkey", F.col("l_orderkey").isNull()),
    ])
    ev_unique = (
        events.agg((F.count(F.lit(1)) - F.countDistinct("event_id"))
                   .alias("n_violations"))
        .select(F.lit("events_unique_event_id").alias("rule"),
                "n_violations"))
    ev_rules = check_constraints(events, [
        Rule("events_value_nonnegative", F.col("value") < 0),
    ])
    orphans = (
        lineitem.join(orders,
                      lineitem.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("lineitem_orphan_orderkeys").alias("rule"),
                "n_violations"))
    return li_rules.unionAll(ev_unique).unionAll(ev_rules).unionAll(orphans)


def observe_rules(df: DataFrame, name: str, rules: list[Rule]):
    """Zero-extra-pass constraint monitoring via Spark's Observation
    API: violation counters piggyback whatever action the caller runs
    on the returned frame — the production shape for a 100 TB sink
    write, where check_constraints' dedicated aggregation pass would
    re-scan everything the write just read.

    Returns (observed_df, observation); after ANY action on
    observed_df, ``observation.get`` yields {"n_rows": ...,
    "<rule>": violation_count, ...}.
    """
    from pyspark.sql import Observation
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [F.count_if(r.violation).alias(r.name) for r in rules]
    return df.observe(obs, *metrics), obs
