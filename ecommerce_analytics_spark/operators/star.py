"""Star-schema analytics (SURVEY.md §2.9 C1/C2) + TPC-H-style headliners.

The reference declares a dbt-style dimensional model (README.md:51-57)
with zero implementation; here it's spark.sql views over the driver
star schema plus the classic OLAP query shapes (pricing summary,
shipping priority, region rollup) that exercise multi-join planning,
broadcast selection, and partial aggregation — the bench headliners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table, register_views
from ecommerce_analytics_spark.numerics import (
    charge_sum, charge_sum_sql, disc_price_sum, disc_price_sum_sql,
    money_sum, money_sum_sql,
)
from ecommerce_analytics_spark.plans.registry import query


@query(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           {money_sum_sql('l_extendedprice')} AS sum_base_price,
           {disc_price_sum_sql()} AS sum_disc_price,
           {charge_sum_sql()} AS sum_charge,
           avg(l_quantity) AS avg_qty,
           round({money_sum_sql('l_extendedprice')} / count(*), 6) AS avg_price,
           round({money_sum_sql('l_discount')} / count(*), 8) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan + pushed date filter + 8-agg groupBy on a "
        "2-value key — pure map-side combine, minimal shuffle. Money "
        "sums accumulate in exact DECIMAL (numerics.py); l_quantity is "
        "integer-valued so its double sum/avg is already exact.",
    tags=("agg", "bench"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            disc_price_sum().alias("sum_disc_price"),
            charge_sum().alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.round(money_sum("l_extendedprice") / F.count(F.lit(1)), 6)
            .alias("avg_price"),
            F.round(money_sum("l_discount") / F.count(F.lit(1)), 8)
            .alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "shipping_priority",
    f"""
    SELECT l.l_orderkey AS order_key,
           {disc_price_sum_sql('l.l_extendedprice', 'l.l_discount')} AS revenue,
           o.o_orderdate AS order_date,
           o.o_orderpriority AS order_priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-01-01'
      AND l.l_shipdate > DATE '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, order_key
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter → broadcast join chain → "
        "agg → top-10. Predicates push to all three scans.",
    tags=("join", "agg", "topk", "bench"),
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
        .join(lineitem.filter(
            F.col("l_shipdate") > F.lit("1998-01-01").cast("date")),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"))
        .agg(disc_price_sum().alias("revenue"))
        .select("order_key", "revenue", "order_date", "order_priority")
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
    )


# Revenue is summed exactly, never in bare DOUBLE (round-1 driver FAIL:
# the pre-agg plan and the flat oracle summed doubles in different
# association orders, and round(...,2) amplified a ~1e-9 difference
# into a cent on 2/175 groups). The arithmetic is the integer-cents
# shape from numerics.py: per-row product AND sum accumulator on LONGs
# (exact 1e-4-dollar units; ~8e9-row-per-group headroom, ANSI-guarded),
# scaled back to dollars once per group — associative,
# engine-independent, no per-row BigDecimal (see numerics.disc_price_sum).
_REV_CENTS = ("CAST(round(l_extendedprice * 100) AS BIGINT)"
              " * (100 - CAST(round(l_discount * 100) AS BIGINT))")
_CENTS_TO_USD = "CAST(0.0001 AS DECIMAL(5,4))"

# Key-uniqueness discipline (both sides): the rollup's business answer
# counts each REAL order and customer once, so the join inputs take
# ONE CANONICAL ROW per key via a deterministic row_number pick — an
# accidentally duplicated o_orderkey / c_custkey row (the hostile
# fixture's fan-out class) would otherwise double revenue while
# count(DISTINCT) half-dedups it, and a dup pair that DISAGREES on a
# projected column (the redated-copy class) defeats plain DISTINCT.
# Per-column min = the retail.transactions discipline: map-side
# combinable, NULLs skipped (the most informative copy wins). No-op on
# clean data; at scale it is one partially-aggregated orders-sized
# shuffle, dwarfed by the fact exchange it protects.
_STAR_SQL = f"""
    WITH o_u AS (
      SELECT o_orderkey, min(o_custkey) AS o_custkey,
             min(o_orderdate) AS o_orderdate
      FROM orders GROUP BY o_orderkey
    ), c_u AS (
      SELECT c_custkey, min(c_nationkey) AS c_nationkey
      FROM customer GROUP BY c_custkey
    )
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(round(CAST(sum({_REV_CENTS}) AS DECIMAL(28,0))
                      * {_CENTS_TO_USD}, 2) AS DOUBLE)
             AS revenue,
           CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN o_u o ON l.l_orderkey = o.o_orderkey
    JOIN c_u c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name, year(o.o_orderdate)
"""


# Spark-side formulation: pre-aggregate lineitem per order FIRST, so
# count(DISTINCT o_orderkey) degenerates to count(*) — the naive text
# plans a two-phase distinct that reshuffles every joined lineitem row
# on (region, nation, year, orderkey); the pre-agg shuffles the fact
# table once on its natural key and joins one row per order.
#
# Round-4 perf adjudication (driver r3 recorded 3.0s vs builder 0.88s
# on this exact commit): an interleaved same-session A/B at sf0.1 on
# local[32] AND local[4] measured (min/p50 over 7 runs):
#   A this plan:              0.46-0.49 / 0.50-0.54
#   B r1 double-sum variant:  0.45 / 0.48  -> exact-cents arithmetic
#      costs ~1% — the r2->r3 money rewrite is NOT the regression.
#   C single broadcast orderkey->(region,nation,year) map + direct
#      (r,n,y,okey) agg: 0.68-0.80 / 0.72-0.91 -> strictly worse (the
#      orders-side broadcast build job costs more than it saves).
#   D two-branch (lineitem roll + orders roll, join 175-row results):
#      0.76-0.80 / 0.86-0.91, and subtly WRONG (counts orders that
#      have no lineitems).
# Executed plan verified: pruned 3-column lineitem scan, map-side
# partial agg, ONE fact exchange, 4 broadcast dims, one 175-row final
# exchange. This is the 100x-scale plan; the driver record's spread
# is host noise, now exposed by bench.py's per-query min/p50/max.
_STAR_SQL_SPARK = f"""
    WITH order_lines AS (
      SELECT l_orderkey,
             sum({_REV_CENTS}) AS rev,
             count(*) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ), o_u AS (
      SELECT o_orderkey, min(o_custkey) AS o_custkey,
             min(o_orderdate) AS o_orderdate
      FROM orders GROUP BY o_orderkey
    ), c_u AS (
      SELECT c_custkey, min(c_nationkey) AS c_nationkey
      FROM customer GROUP BY c_custkey
    )
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(round(CAST(sum(ol.rev) AS DECIMAL(28,0))
                      * {_CENTS_TO_USD}, 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(ol.n_lines) AS BIGINT) AS n_lineitems
    FROM order_lines ol
    JOIN o_u o ON ol.l_orderkey = o.o_orderkey
    JOIN c_u c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name, year(o.o_orderdate)
"""


@query(
    "sales_by_region_year",
    _STAR_SQL,
    doc="C2 star schema: fact_sales rolled up the full dim chain "
        "(lineitem→orders→customer→nation→region) by region/nation/year. "
        "Every dim broadcasts; the fact table shuffles once, partially "
        "aggregated per order (distinct-count-free plan).",
    tags=("join", "agg", "tier-c", "bench"),
)
def q_sales_by_region_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir,
                   ("lineitem", "orders", "customer", "nation", "region"))
    # SQL text Catalyst-planned — the SQL surface is first-class (C2)
    return spark.sql(_STAR_SQL_SPARK)


@query(
    "revenue_delta_forecast",
    f"""
    SELECT CAST(round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                               * CAST(round(l_discount * 100) AS BIGINT))
                           AS DECIMAL(28,0)) * {_CENTS_TO_USD}, 2)
                AS DOUBLE) AS revenue_increase,
           CAST(count(*) AS BIGINT) AS n_qualifying
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure filter-aggregate — every predicate pushes "
        "to the scan, zero shuffles beyond the final partial combine.",
    tags=("agg", "bench"),
)
def q_revenue_delta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem
        .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
                & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
                & (F.col("l_quantity") < 24))
        .agg(F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")
                  * F.round(F.col("l_discount") * 100).cast("bigint"))
            .cast("decimal(28,0)")
            * F.lit("0.0001").cast("decimal(5,4)"), 2)
             .cast("double").alias("revenue_increase"),
             F.count(F.lit(1)).alias("n_qualifying"))
    )


@query(
    "priority_shipping_summary",
    """
    SELECT l.l_linestatus AS line_status,
           CAST(count(*) FILTER (WHERE o.o_orderpriority IN
               ('1-URGENT', '2-HIGH')) AS BIGINT) AS high_priority_count,
           CAST(count(*) FILTER (WHERE o.o_orderpriority NOT IN
               ('1-URGENT', '2-HIGH')) AS BIGINT) AS low_priority_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: join + conditional counts per group — the "
        "priority split computed in one pass with count_if.",
    tags=("join", "agg", "bench"),
)
def q_priority_shipping_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem
        .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date")))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(F.count_if(high).alias("high_priority_count"),
             F.count_if(~high).alias("low_priority_count"))
    )


@query(
    "market_segment_summary",
    f"""
    SELECT c.c_mktsegment AS market_segment,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           {money_sum_sql('o.o_totalprice')} AS total_spend,
           round({money_sum_sql('o.o_totalprice')} / count(o.o_orderkey), 6)
             AS avg_order_value
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="C3-feeding behavioral rollup per market segment (left join keeps "
        "order-less customers — the segmentation feature source).",
    tags=("join", "agg", "tier-c"),
)
def q_market_segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy(F.col("c_mktsegment").alias("market_segment"))
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            money_sum("o_totalprice").alias("total_spend"),
            F.round(money_sum("o_totalprice") / F.count("o_orderkey"), 6)
            .alias("avg_order_value"),
        )
    )


@query(
    "local_supplier_volume",
    f"""
    SELECT n.n_name AS nation_name,
           {disc_price_sum_sql('l.l_extendedprice', 'l.l_discount')} AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: local-supplier volume — six-table join where "
        "the supplier must share the customer's nation (a join predicate "
        "across two dims). Region/nation/supplier/customer broadcast; "
        "the fact table joins without a shuffle; date filter pushes to "
        "the orders scan.",
    tags=("join", "agg", "bench"),
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        lineitem
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("s_nationkey") == F.col("c_nationkey")))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(disc_price_sum().alias("revenue"),
             F.count(F.lit(1)).alias("n_lineitems"))
    )


@query(
    "top_returning_customers",
    f"""
    WITH scored AS (
      SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
             {disc_price_sum_sql('l.l_extendedprice', 'l.l_discount')}
               AS return_revenue,
             CAST(count(*) AS BIGINT) AS n_return_lines
      FROM customer c
      JOIN orders o   ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate <  DATE '1996-07-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, nation_name, return_revenue, n_return_lines
    FROM scored
    ORDER BY return_revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: top-20 customers by returned-line revenue in "
        "a half-year window. Return flag and date predicates push to "
        "the scans; dims broadcast; the limit cutoff orders by the "
        "ROUNDED revenue with a custkey tiebreak so the top-20 set is "
        "deterministic across engines.",
    tags=("join", "agg", "topk", "bench"),
)
def q_top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    scored = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("date"))),
            F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(disc_price_sum().alias("return_revenue"),
             F.count(F.lit(1)).alias("n_return_lines"))
    )
    return (
        scored
        .orderBy(F.desc("return_revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "nation_name",
                "return_revenue", "n_return_lines")
    )


@query(
    "customer_order_distribution",
    """
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 shape: LEFT OUTER join with a non-key join predicate "
        "(customers keep their zero row), per-customer order count, then "
        "a second aggregation into the count-of-counts distribution. Two "
        "shuffles (custkey, then the tiny c_count key); the outer join "
        "preserves customers with no qualifying orders — the shape that "
        "an inner-join formulation silently gets wrong.",
    tags=("join", "agg", "bench"),
)
def q_customer_order_distribution(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    c_orders = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "small_quantity_revenue",
    f"""
    WITH avg_qty AS (
      SELECT l.l_partkey, 0.2 * avg(l.l_quantity) AS qty_limit
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand = 'Brand#23'
      GROUP BY l.l_partkey
    )
    SELECT CAST(round({money_sum_sql('l.l_extendedprice')} / 7.0, 2)
                AS DOUBLE) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small_lines
    FROM lineitem l JOIN avg_qty a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < a.qty_limit
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery per group — the "
        "per-part average quantity — decorrelated into an aggregate + "
        "self-join on partkey (what Catalyst does to the subquery form). "
        "The brand filter shrinks the agg side so AQE broadcasts it; the "
        "fact table is scanned once per side with the partkey filter "
        "pushed. The 0.2·avg threshold is bitwise-identical across "
        "engines (integer-valued quantities sum exactly in doubles), so "
        "the strict < cut is deterministic.",
    tags=("join", "agg", "subquery", "bench"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_lines = lineitem.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#23")
                    .select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"))
    avg_qty = (brand_lines.groupBy("l_partkey")
               .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_limit"))
               .withColumnRenamed("l_partkey", "a_partkey"))
    return (
        lineitem.join(F.broadcast(avg_qty),
                      F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(F.round(money_sum("l_extendedprice") / F.lit(7.0), 2)
             .alias("avg_yearly"),
             F.count(F.lit(1)).alias("n_small_lines"))
    )


@query(
    "large_order_customers",
    """
    WITH big_orders AS (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey AS order_key,
           o.o_orderdate AS order_date, o.o_totalprice AS total_price,
           b.sum_qty
    FROM big_orders b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_price DESC, order_key
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: HAVING-filtered aggregate (orders whose line "
        "quantities sum past 250) used as a semi-join driver back into "
        "orders and customer, top-100 by order value. The aggregate "
        "output is tiny after HAVING, so both enrichment joins broadcast "
        "it; sum_qty is exact (integer-valued doubles) and the limit "
        "tiebreaks on the unique orderkey.",
    tags=("join", "agg", "topk", "bench"),
)
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (lineitem.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .filter(F.col("sum_qty") > 250))
    return (
        F.broadcast(big)
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "c_custkey",
                F.col("o_orderkey").alias("order_key"),
                F.col("o_orderdate").alias("order_date"),
                F.col("o_totalprice").alias("total_price"), "sum_qty")
        .orderBy(F.desc("total_price"), F.asc("order_key"))
        .limit(100)
    )
