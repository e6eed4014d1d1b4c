"""Spark 4 SQL-language surfaces: recursive CTEs and SQL UDFs.

Two engine surfaces a SQL-first user reaches for before any DataFrame
API, certified against the driver oracle:

**Native recursive CTE** (WITH RECURSIVE, new in Spark 4). Spark
currently supports only UNION ALL recursion
([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]), so dense-graph traversals
(all-paths explosion) must stay on the driver-loop formulation
(graph.q_product_bfs_hops); the sound native-recursion use today is
out-degree-≤1 traversal, where UNION ALL recursion is linear. Walked
here: each customer's order chain (first order → successor → …),
producing each order's chain position. The DuckDB oracle computes
the same positions non-recursively (row_number window), so the
recursion's join-per-level semantics are hash-certified end to end.
The recursion depth is max-orders-per-customer (~dozens), far below
spark.sql.cteRecursionLevelLimit.

**SQL UDF** (CREATE TEMPORARY FUNCTION … RETURN expr). The
reference's season classification (data_loader.py:169-178, SURVEY
P9) becomes a named, catalog-registered scalar function instead of a
copy-pasted CASE. SQL UDFs inline into the plan at analysis time —
zero call overhead, full codegen, unlike external UDFs — so this is
the right vehicle for an engine-shipped business-logic library. The
oracle spells the CASE out literally, certifying the inlined
function body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query


@query(
    "order_chain_recursive",
    """
    WITH chainable AS (
      -- chain contract (both sides): per-customer chains need a
      -- customer, a date to order by, and UNIQUE (custkey, orderkey)
      -- — a duplicated key is a self-edge that loops the recursion,
      -- and a NULL custkey never matches the recursive join
      -- (NULL = NULL). min(date) canonicalizes, because DISTINCT
      -- alone would keep a dup pair whose copies disagree on the date
      SELECT o_custkey, o_orderkey, min(o_orderdate) AS o_orderdate
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
      GROUP BY o_custkey, o_orderkey
    ), rn AS (
      SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate NULLS FIRST,
                                              o_orderkey NULLS FIRST)
                  AS INT) AS chain_pos
      FROM chainable
    )
    SELECT o_custkey, o_orderkey, chain_pos FROM rn
    WHERE chain_pos <= 12
    """,
    doc="Native WITH RECURSIVE (Spark 4): per-customer order chains "
        "walked by successor joins — seed = each customer's first "
        "order, step = the lag-derived successor edge (out-degree 1, "
        "so UNION ALL recursion is linear, no path explosion), "
        "bounded at 12 levels. "
        "Hash-certified against the non-recursive row_number oracle. "
        "Each recursion level is one hash join of the frontier "
        "against the successor edges — |orders| total work across "
        "levels.",
    tags=("recursion", "sql", "window"),
)
def q_order_chain_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_rec_orders")
    # Materialize the successor-edge table ONCE before recursing
    # (round 11, guide §2.4): Spark's recursive UnionLoop re-executes
    # the step subtree at every level, and the step referenced the
    # whole chainable window chain — so 12 levels paid 12× the
    # orders scan + dedup groupBy + lag window (measured 9.8s at
    # sf0.1, noop sink). Checkpointing nxt makes each level one hash
    # join of the frontier against materialized edges — the
    # "|orders| total work across levels" the doc promises — while
    # the recursion itself stays the native WITH RECURSIVE surface
    # this query certifies. Same rows, same recursion semantics.
    spark.sql("""
        WITH chainable AS (
          SELECT o_custkey, o_orderkey, min(o_orderdate) AS o_orderdate
          FROM _rec_orders
          WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
          GROUP BY o_custkey, o_orderkey
        )
        SELECT o_custkey, o_orderkey,
               lag(o_orderkey) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate NULLS FIRST,
                                              o_orderkey NULLS FIRST)
                 AS prev_orderkey
        FROM chainable
    """).localCheckpoint(eager=True).createOrReplaceTempView("_rec_nxt")
    return spark.sql("""
        WITH RECURSIVE walk AS (
          SELECT o_custkey, o_orderkey, 1 AS chain_pos
          FROM _rec_nxt WHERE prev_orderkey IS NULL
          UNION ALL
          SELECT n.o_custkey, n.o_orderkey, w.chain_pos + 1
          FROM walk w
          JOIN _rec_nxt n ON n.prev_orderkey = w.o_orderkey
                         AND n.o_custkey = w.o_custkey
          WHERE w.chain_pos < 12
        )
        SELECT o_custkey, o_orderkey, CAST(chain_pos AS INT) AS chain_pos
        FROM walk
    """)


SEASON_FN = """
CREATE OR REPLACE TEMPORARY FUNCTION season_of(m INT) RETURNS STRING
RETURN CASE WHEN m IN (11, 12) THEN 'holiday'
            WHEN m IN (3, 4, 5) THEN 'spring'
            WHEN m IN (6, 7, 8) THEN 'summer'
            ELSE 'fall' END
"""


@query(
    "seasonal_order_mix_sqludf",
    """
    SELECT CASE WHEN month(o_orderdate) IN (11, 12) THEN 'holiday'
                WHEN month(o_orderdate) IN (3, 4, 5) THEN 'spring'
                WHEN month(o_orderdate) IN (6, 7, 8) THEN 'summer'
                ELSE 'fall' END AS season,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 4)
             AS pct_orders
    FROM orders
    GROUP BY 1
    """,
    doc="SQL UDF surface (CREATE TEMPORARY FUNCTION … RETURN): the "
        "reference's season CASE (data_loader.py:169-178) shipped as "
        "a named catalog function and applied over order dates; "
        "inlined at analysis time (plain codegen CASE, no UDF call "
        "overhead). Oracle spells out the CASE, certifying the "
        "function body, plus a ratio-of-total window over the "
        "grouped counts.",
    tags=("sql", "udf", "agg"),
)
def q_seasonal_order_mix_sqludf(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    spark.sql(SEASON_FN)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_sqludf_orders")
    return spark.sql("""
        SELECT season_of(month(o_orderdate)) AS season,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(count(*) * 100.0 / sum(count(*)) OVER (), 4)
                    AS DOUBLE) AS pct_orders
        FROM _sqludf_orders
        GROUP BY 1
    """)
