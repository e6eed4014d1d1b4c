"""dbt-style dimensional model as named Spark SQL views (C2,
README.md:51-57 — declared in the reference, zero code there).

``create_star_views`` registers fact/dim views once; any spark.sql
query then composes them — the SQL surface is first-class (Catalyst
plans views and inline DataFrames identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ecommerce_analytics_spark.io import register_views
from ecommerce_analytics_spark.plans.registry import query

_VIEWS = {
    "dim_customer": """
        SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
               c.c_mktsegment AS market_segment, c.c_acctbal AS account_balance,
               n.n_name AS nation_name, r.r_name AS region_name
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    "dim_product": """
        SELECT p_partkey AS product_id, p_name AS product_name,
               p_brand AS brand, p_type AS product_type,
               p_size AS size, p_retailprice AS retail_price
        FROM part
    """,
    # net_revenue is exact DECIMAL so any rollup over the fact view sums
    # associatively — double sums diverge per-engine at round-2-cent
    # boundaries (round-1 lesson; both money inputs are losslessly
    # DECIMAL(18,2)-representable).
    "fact_sales": """
        SELECT l.l_orderkey AS order_id, l.l_linenumber AS line_no,
               o.o_custkey AS customer_id, l.l_partkey AS product_id,
               l.l_suppkey AS supplier_id,
               o.o_orderdate AS order_date, l.l_shipdate AS ship_date,
               l.l_quantity AS quantity,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS net_revenue,
               (l.l_returnflag = 'R') AS is_return
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
}


def create_star_views(spark: SparkSession, sf_dir: str) -> None:
    register_views(spark, sf_dir)
    for name, sql in _VIEWS.items():
        spark.sql(sql).createOrReplaceTempView(name)


_SEGMENT_BRAND_SQL = """
    SELECT d.market_segment, p.brand,
           CAST(round(sum(f.net_revenue), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE f.is_return) AS BIGINT) AS n_returns
    FROM fact_sales f
    JOIN dim_customer d ON f.customer_id = d.customer_id
    JOIN dim_product p ON f.product_id = p.product_id
    GROUP BY d.market_segment, p.brand
"""


@query(
    "sales_by_segment_brand",
    """
    WITH dim_customer AS (
        -- mirrors the registered view EXACTLY, including the nation ⋈
        -- region chain: a customer with a NULL/orphan nationkey is not
        -- in the dimension (inner joins), so it must drop here too
        SELECT c.c_custkey AS customer_id, c.c_mktsegment AS market_segment
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey),
    dim_product AS (
        SELECT p_partkey AS product_id, p_brand AS brand FROM part),
    fact_sales AS (
        SELECT o.o_custkey AS customer_id, l.l_partkey AS product_id,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS net_revenue,
               (l.l_returnflag = 'R') AS is_return
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
    SELECT d.market_segment, p.brand,
           CAST(round(sum(f.net_revenue), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE f.is_return) AS BIGINT) AS n_returns
    FROM fact_sales f
    JOIN dim_customer d ON f.customer_id = d.customer_id
    JOIN dim_product p ON f.product_id = p.product_id
    GROUP BY d.market_segment, p.brand
    """,
    doc="C2: query composed over the named star views (fact_sales ⋈ "
        "dim_customer ⋈ dim_product) — the dbt-model surface; dims "
        "broadcast, fact aggregates partially.",
    tags=("join", "agg", "tier-c", "views"),
)
def q_sales_by_segment_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    create_star_views(spark, sf_dir)
    return spark.sql(_SEGMENT_BRAND_SQL)
