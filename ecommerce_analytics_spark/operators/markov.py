"""Event-sequence transition matrix (first-order Markov counts).

The reference's MongoDB views slice events by type
(init-db.js aggregations); the sequence-aware question a product
team actually asks — "what do users do NEXT after X?" — needs the
per-user consecutive-pair counts. One lag window per user, one
(prev, next) rollup: the exact plan shape of the certified
sessionize/classification family, so a 100 TB run pays one user_id
exchange (shared by window and nothing else) plus one tiny
25-cell-ish final aggregate.

Transition probability is emitted both as an exact rational pair
(n_transitions, row_total — BIGINTs, the hash-certified truth) and
as the conventional rounded double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type,
         CAST(count(*) AS BIGINT) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(sum(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
         AS row_total,
       round(CAST(n_transitions AS DOUBLE)
             / CAST(sum(n_transitions) OVER (PARTITION BY prev_type)
                    AS DOUBLE), 6) AS p_transition
FROM pairs
"""


@query(
    "event_transition_matrix",
    _TRANSITION_ORACLE,
    doc="First-order Markov transition matrix over per-user event "
        "sequences: lag window on (user_id, ts, event_id) order, "
        "(prev, next) pair counts, per-row exact totals. Probability "
        "emitted as the exact BIGINT rational pair plus the rounded "
        "double. One user_id exchange feeds the window; the pair "
        "rollup and row-total window run on the |types|^2-row result.",
    tags=("window", "agg", "sequence"),
)
def q_event_transition_matrix(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (events
             .select("user_id", "event_type",
                     F.lag("event_type").over(w).alias("prev_type"))
             .filter(F.col("prev_type").isNotNull())
             .groupBy("prev_type",
                      F.col("event_type").alias("next_type"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_transitions")))
    row_w = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type", "next_type", "n_transitions",
        F.sum("n_transitions").over(row_w).cast("long").alias("row_total"),
        F.round(F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(row_w).cast("double"),
                6).alias("p_transition"))
