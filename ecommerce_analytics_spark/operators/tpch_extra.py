"""Remaining TPC-H query shapes, adapted to the driver star schema.

Round-1 covered Q1/Q3/Q5/Q6/Q10/Q12/Q13/Q17/Q18; this module completes
the classic decision-support shapes the reference's declared "dbt-style
SQL transformation" layer (README.md:51-57, SURVEY §2.9 C2) would have
to serve: correlated scalar subqueries (Q2/Q15), EXISTS / NOT-EXISTS
semi- and anti-joins (Q4/Q21/Q22), two-fact-direction nation pair
analysis (Q7), conditional market share (Q8/Q14), multi-branch
disjunctive predicate pushdown (Q19), and grouped distinct-count with
an exclusion anti-join (Q16).

Adaptations forced by the driver schema (TESTDATA.md): there is no
``partsupp`` table, so supply cost derives from the fact table itself
(min unit price per (part, supplier) — a pure-double min with no
arithmetic, bitwise identical across engines) or from ``p_retailprice``
(a clean 2-decimal money column) where an exact money computation is
needed; ``lineitem`` has no commit/receipt dates, so "late" means
shipped > 60 days after the order date; ``customer`` has no phone, so
Q22's country-code grouping becomes nation grouping.

All money aggregation goes through numerics.py exact-DECIMAL helpers
(round-1 lesson: double sums are non-associative across plan shapes
and engines; the driver hashes raw values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import (
    dec2, disc_price_dec, disc_price_dec_sql, disc_price_sum,
    disc_price_sum_sql, money_sum, money_sum_sql,
)
from ecommerce_analytics_spark.plans.registry import query


def _unit_cost_catalog(lineitem: DataFrame) -> DataFrame:
    """partsupp stand-in: min observed unit price per (part, supplier).

    Pure double division + min — no summation, so every engine computes
    the identical IEEE-754 values regardless of partitioning.
    """
    return (lineitem
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("supply_cost")))


_CATALOG_SQL = """
  catalog AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS supply_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
  )
"""


@query(
    "min_cost_supplier_region",
    f"""
    WITH {_CATALOG_SQL}
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation_name,
           p.p_partkey AS part_key, c.supply_cost
    FROM catalog c
    JOIN part p ON p.p_partkey = c.ps_partkey
    JOIN supplier s ON s.s_suppkey = c.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
      AND c.supply_cost = (
        SELECT min(c2.supply_cost)
        FROM catalog c2
        JOIN supplier s2 ON s2.s_suppkey = c2.ps_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE c2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, s.s_name, part_key
    LIMIT 100
    """,
    doc="TPC-H Q2 shape: minimum-cost supplier per part within a region "
        "— a correlated MIN subquery, decorrelated in the Spark plan "
        "into a per-part aggregate joined back on (partkey, cost) "
        "equality (exactly what Catalyst's RewriteCorrelatedScalarQuery "
        "produces). The catalog derives from one fact-table scan "
        "(no partsupp in the driver schema); the dim chain broadcasts. "
        "Cost equality is safe: min over identically-computed doubles, "
        "no summation anywhere.",
    tags=("join", "subquery", "tpch"),
)
def q_min_cost_supplier_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    europe_supp = (supplier
                   .join(F.broadcast(nation),
                         F.col("s_nationkey") == F.col("n_nationkey"))
                   .join(F.broadcast(region.filter(F.col("r_name")
                                                   == "EUROPE")),
                         F.col("n_regionkey") == F.col("r_regionkey")))
    catalog = (_unit_cost_catalog(lineitem)
               .join(F.broadcast(europe_supp.select(
                   "s_suppkey", "s_name", "s_acctbal", "n_name")),
                   F.col("l_suppkey") == F.col("s_suppkey")))
    target_parts = part.filter((F.col("p_size") == 15)
                               & (F.col("p_type") == "LARGE"))
    catalog = catalog.join(
        F.broadcast(target_parts.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"))
    best = (catalog.groupBy("p_partkey")
            .agg(F.min("supply_cost").alias("best_cost"))
            .withColumnRenamed("p_partkey", "b_partkey"))
    return (catalog
            .join(F.broadcast(best),
                  (F.col("p_partkey") == F.col("b_partkey"))
                  & (F.col("supply_cost") == F.col("best_cost")))
            .select("s_acctbal", "s_name",
                    F.col("n_name").alias("nation_name"),
                    F.col("p_partkey").alias("part_key"), "supply_cost")
            .orderBy(F.desc("s_acctbal"), "s_name", "part_key")
            .limit(100))


@query(
    "late_shipment_priority_check",
    """
    SELECT o.o_orderpriority AS order_priority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1997-01-01'
      AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY order_priority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery → left-semi join, "
        "priority distribution of orders with a late line (shipped > 60 "
        "days after order date — the driver lineitem has no commit/"
        "receipt dates). The quarter filter pushes to the orders scan; "
        "the semi-join deduplicates before the tiny 5-key aggregate.",
    tags=("join", "semi", "tpch"),
)
def q_late_shipment_priority_check(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    window_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date")))
    late = window_orders.join(
        lineitem,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return (late.groupBy(F.col("o_orderpriority").alias("order_priority"))
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("order_priority"))


@query(
    "nation_trade_volume",
    f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           {disc_price_sum_sql('l.l_extendedprice', 'l.l_discount')}
             AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= DATE '1996-01-01'
      AND l.l_shipdate < DATE '1998-01-01'
      AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, ship_year
    """,
    doc="TPC-H Q7 shape: bilateral trade volume between two nations by "
        "ship year. The fact table shuffles once on orderkey for the "
        "orders join; supplier/customer/nation (aliased twice) all "
        "broadcast, and the nation-pair disjunction prunes before the "
        "aggregate. Revenue in exact DECIMAL.",
    tags=("join", "agg", "tpch"),
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(F.col("n_nationkey").alias("ns_key"),
                       F.col("n_name").alias("supp_nation"))
    nc = nation.select(F.col("n_nationkey").alias("nc_key"),
                       F.col("n_name").alias("cust_nation"))
    return (
        lineitem
        .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date")))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .filter(((F.col("supp_nation") == "NATION_1")
                 & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2")
                   & (F.col("cust_nation") == "NATION_1")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(disc_price_sum().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year"))


@query(
    "nation_market_share",
    f"""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           round(
             CAST(sum(CASE WHEN ns.n_name = 'NATION_5'
                           THEN {disc_price_dec_sql('l.l_extendedprice',
                                                    'l.l_discount')}
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum({disc_price_dec_sql('l.l_extendedprice',
                                            'l.l_discount')}) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    GROUP BY year(o.o_orderdate)
    ORDER BY order_year
    """,
    doc="TPC-H Q8 shape: a nation's market share inside a region-and-"
        "part-type segment, per year — conditional numerator over total "
        "denominator in one aggregate pass (no second scan). Seven-table "
        "join: fact shuffles once on orderkey; part/customer/supplier/"
        "nation×2/region broadcast. Both sums are exact DECIMAL; the "
        "share divides two identically-computed doubles, so round(.,6) "
        "agrees across engines.",
    tags=("join", "agg", "tpch"),
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    asia_cust = (customer
                 .join(F.broadcast(nation),
                       F.col("c_nationkey") == F.col("n_nationkey"))
                 .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                       F.col("n_regionkey") == F.col("r_regionkey"))
                 .select("c_custkey"))
    supp_nation = (supplier
                   .join(F.broadcast(nation.select(
                       "n_nationkey", F.col("n_name").alias("supp_nation"))),
                       F.col("s_nationkey") == F.col("n_nationkey"))
                   .select("s_suppkey", "supp_nation"))
    rev = disc_price_dec()
    return (
        lineitem
        .join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(asia_cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supp_nation),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", rev)
                  .otherwise(F.lit(0))).cast("double")
            / F.sum(rev).cast("double"), 6).alias("mkt_share"))
        .orderBy("order_year"))


@query(
    "promo_revenue_share",
    f"""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN {disc_price_dec_sql('l.l_extendedprice',
                                                       'l.l_discount')}
                              ELSE 0 END) AS DOUBLE)
             / CAST(sum({disc_price_dec_sql('l.l_extendedprice',
                                            'l.l_discount')}) AS DOUBLE),
             6) AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= DATE '1997-09-01'
      AND l.l_shipdate < DATE '1997-10-01'
    """,
    doc="TPC-H Q14 shape: promotion revenue percentage for one ship "
        "month — conditional share in a single pass over the month "
        "slice (date filter pushed to the scan), part broadcast. Exact "
        "DECIMAL sums; one-row output.",
    tags=("join", "agg", "tpch"),
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = disc_price_dec()
    return (
        lineitem
        .filter((F.col("l_shipdate") >= F.lit("1997-09-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1997-10-01").cast("date")))
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("p_partkey") == F.col("l_partkey"))
        .agg(F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                    .otherwise(F.lit(0))).cast("double")
            / F.sum(rev).cast("double"), 6).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines")))


@query(
    "top_revenue_supplier",
    f"""
    WITH supplier_revenue AS (
      SELECT l_suppkey,
             sum({disc_price_dec_sql()}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1997-01-01'
        AND l_shipdate < DATE '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS supp_key, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier_revenue r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue)
                             FROM supplier_revenue)
    ORDER BY supp_key
    """,
    doc="TPC-H Q15 shape: top supplier by quarterly revenue — an "
        "aggregate reused twice (per-supplier revenue AND its global "
        "max), the classic materialized-view/scalar-subquery shape. "
        "Revenue stays in exact DECIMAL through the max-equality "
        "comparison (associative, engine-independent), cast to DOUBLE "
        "only at the output edge; ties would surface as extra rows, "
        "identically in both engines.",
    tags=("join", "subquery", "agg", "tpch"),
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    supp_rev = (
        lineitem
        .filter((F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
                & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date")))
        .groupBy("l_suppkey")
        .agg(F.sum(disc_price_dec()).alias("total_revenue")))
    best = supp_rev.agg(F.max("total_revenue").alias("best_revenue"))
    return (supp_rev
            .join(F.broadcast(best),
                  F.col("total_revenue") == F.col("best_revenue"))
            .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                  F.col("s_suppkey") == F.col("l_suppkey"))
            .select(F.col("s_suppkey").alias("supp_key"), "s_name",
                    F.col("total_revenue").cast("double")
                    .alias("total_revenue"))
            .orderBy("supp_key"))


@query(
    "supplier_count_by_part_attrs",
    f"""
    WITH {_CATALOG_SQL}
    SELECT p.p_brand AS brand, p.p_type AS part_type, p.p_size AS size,
           CAST(count(DISTINCT c.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM catalog c
    JOIN part p ON p.p_partkey = c.ps_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 5, 9, 14, 20, 28, 36, 45)
      AND c.ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, brand, part_type, size
    """,
    doc="TPC-H Q16 shape: distinct supplier count per (brand, type, "
        "size) with an exclusion list (negative-balance suppliers stand "
        "in for the complaints filter; catalog derived from the fact "
        "table — no partsupp). NOT IN compiles to a broadcast anti-join "
        "(the exclusion list is tiny and provably non-null); the "
        "distinct count shuffles the deduped catalog only.",
    tags=("join", "anti", "agg", "tpch"),
)
def q_supplier_count_by_part_attrs(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    excluded = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 9, 14, 20, 28, 36, 45))
    return (
        _unit_cost_catalog(lineitem)
        .join(F.broadcast(excluded),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts.select("p_partkey", "p_brand", "p_type",
                                       "p_size")),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"),
                 F.col("p_type").alias("part_type"),
                 F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "part_type", "size"))


@query(
    "disjunctive_promo_revenue",
    f"""
    SELECT {disc_price_sum_sql('l.l_extendedprice', 'l.l_discount')}
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: three OR'd conjunctions mixing part and "
        "lineitem predicates — the disjunctive-pushdown test. Catalyst "
        "extracts the common l_quantity/p_size envelope below the join "
        "(visible as pushed scan filters) and re-checks the full "
        "disjunction above it; part broadcasts. One-row exact-DECIMAL "
        "output.",
    tags=("join", "agg", "tpch"),
)
def q_disjunctive_promo_revenue(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("p_partkey") == F.col("l_partkey"))
    branch = (
        ((F.col("p_brand") == "Brand#12")
         & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23")
           & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3")
           & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return joined.filter(branch).agg(
        disc_price_sum().alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


@query(
    "last_shipper_waiting_orders",
    """
    WITH order_supplier AS (
      SELECT l.l_orderkey, l.l_suppkey, max(l.l_shipdate) AS supp_last_ship
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ), ranked AS (
      SELECT l_orderkey, l_suppkey, supp_last_ship,
             count(*) OVER (PARTITION BY l_orderkey) AS n_suppliers,
             max(supp_last_ship) OVER (PARTITION BY l_orderkey)
               AS order_last_ship
      FROM order_supplier
    ), flagged AS (
      SELECT *,
             sum(CASE WHEN supp_last_ship = order_last_ship
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_orderkey) AS n_at_max
      FROM ranked
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM flagged r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.n_suppliers >= 2
      AND r.supp_last_ship = r.order_last_ship
      AND r.n_at_max = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 25
    """,
    doc="TPC-H Q21 shape: suppliers who kept finished multi-supplier "
        "orders waiting — the supplier whose lines shipped strictly "
        "last (driver lineitem has no receipt/commit dates, so 'late' "
        "is the unique latest shipper). The classic EXISTS/NOT-EXISTS "
        "double self-join collapses into one (orderkey, suppkey) "
        "aggregate plus window functions over orderkey — a single "
        "shuffle of the pre-aggregated fact instead of three fact-table "
        "self-joins; timestamps compare exactly, so cross-engine "
        "agreement is structural.",
    tags=("join", "window", "agg", "tpch"),
)
def q_last_shipper_waiting_orders(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    order_supplier = (
        lineitem
        .join(F.broadcast(orders.filter(F.col("o_orderstatus") == "F")
                          .select("o_orderkey")),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last_ship")))
    w = Window.partitionBy("l_orderkey")
    ranked = order_supplier.select(
        "l_orderkey", "l_suppkey", "supp_last_ship",
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
        F.max("supp_last_ship").over(w).alias("order_last_ship"),
        F.sum(F.when(F.col("supp_last_ship")
                     == F.max("supp_last_ship").over(w), 1)
              .otherwise(0)).over(w).alias("n_at_max"))
    return (ranked
            .filter((F.col("n_suppliers") >= 2)
                    & (F.col("supp_last_ship") == F.col("order_last_ship"))
                    & (F.col("n_at_max") == 1))
            .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
                  F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(25))


@query(
    "dormant_high_balance_customers",
    f"""
    WITH threshold AS (
      SELECT {money_sum_sql('c_acctbal')} / count(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation_name,
           CAST(count(*) AS BIGINT) AS numcust,
           {money_sum_sql('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT avg_bal FROM threshold)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY n.n_name
    ORDER BY nation_name
    """,
    doc="TPC-H Q22 shape: high-balance customers with no recent orders "
        "(no phone column → nation grouping; 'no orders in 7 years' → "
        "no orders since 2000). Scalar AVG subquery computed as exact-"
        "DECIMAL sum over count (double sums diverge across engines), "
        "broadcast into the filter; the NOT EXISTS compiles to a left-"
        "anti join against the date-filtered orders scan.",
    tags=("join", "anti", "subquery", "tpch"),
)
def q_dormant_high_balance_customers(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    threshold = (customer.filter(F.col("c_acctbal") > 0.0)
                 .agg((money_sum("c_acctbal")
                       / F.count(F.lit(1))).alias("avg_bal")))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")) \
        .select("o_custkey")
    return (customer
            .join(F.broadcast(threshold))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, F.col("o_custkey") == F.col("c_custkey"),
                  "left_anti")
            .join(F.broadcast(nation),
                  F.col("n_nationkey") == F.col("c_nationkey"))
            .groupBy(F.col("n_name").alias("nation_name"))
            .agg(F.count(F.lit(1)).alias("numcust"),
                 money_sum("c_acctbal").alias("total_acctbal"))
            .orderBy("nation_name"))


@query(
    "nation_year_profit",
    """
    SELECT ns.n_name AS nation_name,
           CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
           CAST(round(sum(
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
             - CAST(p.p_retailprice AS DECIMAL(18,2))
               * CAST(l.l_quantity AS DECIMAL(9,0))
               * CAST(0.6 AS DECIMAL(2,1))
           ), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY ns.n_name, year(o.o_orderdate)
    ORDER BY nation_name, order_year DESC
    """,
    doc="TPC-H Q9 shape: profit by supplier nation and order year over "
        "a part-name segment ('red' — a token that exists in the driver's part names at every SF; TPC-H's 'green' matches zero rows there). No partsupp in the driver schema, so unit "
        "cost is 60% of p_retailprice (a clean 2-decimal money column) "
        "— the entire profit expression stays in exact DECIMAL "
        "(price·discount minus retail·qty·0.6), making the grouped sum "
        "associative and engine-independent. Part/supplier/nation "
        "broadcast; the fact shuffles once for the orders join.",
    tags=("join", "agg", "tpch"),
)
def q_nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit = (
        dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
        - dec2("p_retailprice") * F.col("l_quantity").cast("decimal(9,0)")
        * F.lit("0.6").cast("decimal(2,1)"))
    return (
        lineitem
        .join(F.broadcast(part.filter(F.col("p_name").like("%red%"))
                          .select("p_partkey", "p_retailprice")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("n_name").alias("nation_name"),
                 F.year("o_orderdate").alias("order_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy("nation_name", F.desc("order_year")))


_SLA_DAYS = 7

_LATENCY_SLA_ORACLE = f"""
WITH lat AS (
  SELECT o.o_orderpriority,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS lat_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       round(quantile_cont(lat_days, 0.5), 6) AS p50_days,
       round(quantile_cont(lat_days, 0.9), 6) AS p90_days,
       round(quantile_cont(lat_days, 0.99), 6) AS p99_days,
       CAST(max(lat_days) AS BIGINT) AS max_days,
       round(CAST(sum(CASE WHEN lat_days <= {_SLA_DAYS}
                      THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS within_{_SLA_DAYS}d
FROM lat GROUP BY o_orderpriority
"""


@query(
    "shipment_latency_sla",
    _LATENCY_SLA_ORACLE,
    doc=f"Order-to-ship latency SLA table per order priority: exact "
        f"p50/p90/p99 of datediff(shipdate, orderdate) in whole days "
        f"(integer latencies; Spark percentile() == DuckDB "
        f"quantile_cont, the value_percentiles precedent), max, and "
        f"the share shipped within {_SLA_DAYS} days from exact "
        f"integer counts — the fulfillment-operations dashboard the "
        f"reference's shipping analytics (analytics_queries.sql "
        f"priority reports) implies but never computes. One orderkey "
        f"equi-join, one 5-row aggregate; at 100 TB the exact "
        f"percentile swaps for approx_percentile with a documented "
        f"error bound, the counts stay exact.",
    tags=("agg", "percentile", "join", "tier-b"),
)
def q_shipment_latency_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = (orders.join(li, orders.o_orderkey == li.l_orderkey)
           .select("o_orderpriority",
                   F.datediff(F.to_date("l_shipdate"),
                              F.to_date("o_orderdate")).alias("lat_days")))
    within = F.sum(F.when(F.col("lat_days") <= _SLA_DAYS, 1)
                   .otherwise(0))
    return (lat.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).cast("long").alias("n_lineitems"),
                 F.round(F.expr("percentile(lat_days, 0.5)"), 6)
                 .alias("p50_days"),
                 F.round(F.expr("percentile(lat_days, 0.9)"), 6)
                 .alias("p90_days"),
                 F.round(F.expr("percentile(lat_days, 0.99)"), 6)
                 .alias("p99_days"),
                 F.max("lat_days").cast("long").alias("max_days"),
                 F.round(within.cast("double") / F.count(F.lit(1)), 6)
                 .alias(f"within_{_SLA_DAYS}d")))
