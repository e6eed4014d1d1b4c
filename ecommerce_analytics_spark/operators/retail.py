"""Retail-transaction binding over the driver star schema.

The reference operates on UK Online Retail invoice lines
(data_loader.py:41-84). The driver supplies TPC-H-ish tables instead,
so every retail-shaped operator binds through this view (FIXTURES.md
§C): ``lineitem ⋈ orders`` with

    customer_id   = o_custkey        (CustomerID)
    invoice_no    = l_orderkey       (InvoiceNo)
    line_no       = l_linenumber
    stock_code    = l_partkey        (StockCode)
    invoice_date  = l_shipdate       (InvoiceDate)
    quantity      = l_quantity       (Quantity)
    unit_price    = l_extendedprice  (UnitPrice)
    total_amount  = l_extendedprice * (1 - l_discount)   (TotalAmount, P6)
    is_return     = l_returnflag = 'R'                   (IsReturn, P7)
    is_credit_note= is_return AND o_orderstatus = 'F'    ('C'-invoice analog)

Determinism contract: ``(l_orderkey, l_linenumber)`` is NOT unique in
the synthetic data, so ordered operators sort by the full ORDER_KEYS
tuple — distinct rows are totally ordered; remaining ties are
bit-identical rows, which window frames treat interchangeably (the
output multiset is unchanged). The DuckDB oracles use the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table

# Total order for every sequential/window operator (and its oracles).
ORDER_KEYS = ("invoice_date", "invoice_no", "line_no", "stock_code",
              "supp_id", "quantity", "unit_price")

# Thresholds — reference semantics (qty > 10, amount > 100;
# data_loader.py:128-131) rescaled to the synthetic distribution
# (quantity uniform 1..50, amount ~U(0..100k)).
BULK_QTY = 40
HIGH_VALUE_AMOUNT = 75000.0


def transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders → retail-transaction view.

    orders is far below the broadcast threshold at test SFs, so
    Catalyst broadcasts it; at cluster scale AQE falls back to a
    sort-merge join on the shared l_orderkey/o_orderkey key.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    # orders is KEYED: one canonical value per o_orderkey for the two
    # columns the view consumes (per-column min — NULLs skipped, so a
    # conflicting duplicate resolves to the most informative copy;
    # identical in both engines and map-side combinable, unlike a
    # row_number pick which pays a full per-partition sort). A
    # duplicated order row would otherwise fan every one of its
    # lineitems into bit-identical txn rows, and the flagship's TWO
    # differently-sorted windows then pair the tied rows' positions
    # inconsistently — between engines AND between runs (found by the
    # hostile fixture's redated-duplicate class; the same-attribute
    # duplicate only passed on data luck). One partially-aggregated
    # orders-sized exchange, dwarfed by the fact join it protects;
    # retail_validation's n_dup_orderkey counts what it collapses.
    #
    # Cost adjudication (round 7, interleaved same-session A/B at
    # sf0.1, min-of-7): flagship classification 1.47s canonical vs
    # 1.20s raw (+0.26s = the orders agg exchange ahead of the
    # broadcast build). Accepted: the alternative that also fixes the
    # tie-pairing defect is partitioning the product window by
    # (customer, stock), which re-shuffles the FACT table — strictly
    # worse at any scale; and the orders agg is map-side combinable,
    # so its relative cost shrinks as the fact side grows.
    # min(o_orderstatus) is a STRING aggregate — its buffer is not
    # hash-aggregatable, so carrying it forced SortAggregate (a full
    # sort of the orders table before the partial agg, and again after
    # the exchange) into every transactions() consumer. The view only
    # ever consumes the canonical status through `= 'F'`, and over the
    # same total order min(s) = 'F' ⟺ some s = 'F' AND no s < 'F' —
    # two integer max() flags, so the whole canon is HashAggregate
    # again. NULL discipline matches min(): when() on a NULL status
    # falls to otherwise(0), exactly as min() skips NULLs, and an
    # all-NULL group yields flags (0,0) → FALSE, which is what
    # coalesce(min=NULL = 'F', FALSE) produced.
    orders = (load_table(spark, sf_dir, "orders")
              .groupBy("o_orderkey")
              .agg(F.min("o_custkey").alias("o_custkey"),
                   F.max(F.when(F.col("o_orderstatus") == "F", 1)
                         .otherwise(0)).alias("_status_has_f"),
                   F.max(F.when(F.col("o_orderstatus") < "F", 1)
                         .otherwise(0)).alias("_status_below_f")))
    status_f = ((F.col("_status_has_f") == 1)
                & (F.col("_status_below_f") == 0))
    joined = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    # coalesce(..., FALSE): only an explicit 'R' flag is a return — a
    # NULL l_returnflag / o_orderstatus row is NOT (two-valued flags
    # keep every downstream CASE/filter deterministic; a NULL boolean
    # also round-trips differently per client: None here, NaN from
    # SUM-based engines). No-op on clean data; load-bearing on the
    # hostile retail fixture.
    is_return = F.coalesce(F.col("l_returnflag") == "R", F.lit(False))
    return joined.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("l_orderkey").alias("invoice_no"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_partkey").alias("stock_code"),
        F.col("l_suppkey").alias("supp_id"),
        F.col("l_shipdate").alias("invoice_date"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("unit_price"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("total_amount"),
        is_return.alias("is_return"),
        F.coalesce(is_return & status_f, F.lit(False))
        .alias("is_credit_note"),
    )


# The same view as a DuckDB CTE — prepended to every retail oracle.
TXN_CTE = """
WITH o_canon AS (
  -- one canonical order value per key (transactions() twin:
  -- per-column min over the two consumed columns)
  SELECT o_orderkey, min(o_custkey) AS o_custkey,
         min(o_orderstatus) AS o_orderstatus
  FROM orders GROUP BY o_orderkey
), txn AS (
  SELECT o.o_custkey                            AS customer_id,
         l.l_orderkey                           AS invoice_no,
         l.l_linenumber                         AS line_no,
         l.l_partkey                            AS stock_code,
         l.l_suppkey                            AS supp_id,
         l.l_shipdate                           AS invoice_date,
         l.l_quantity                           AS quantity,
         l.l_extendedprice                      AS unit_price,
         l.l_extendedprice * (1 - l.l_discount) AS total_amount,
         coalesce(l.l_returnflag = 'R', FALSE)  AS is_return,
         coalesce(l.l_returnflag = 'R' AND o.o_orderstatus = 'F', FALSE)
                                                AS is_credit_note
  FROM lineitem l JOIN o_canon o ON l.l_orderkey = o.o_orderkey
)
"""

# Oracle-side spelling: ASC NULLS FIRST matches Spark's ASC default
# (DuckDB defaults to NULLS LAST) — a no-op on clean data where no
# ORDER_KEYS column is nullable, load-bearing on the hostile retail
# fixture (NULL l_shipdate / l_quantity / l_extendedprice reach every
# windowed operator; tests/test_hostile_retail.py).
ORDER_KEYS_SQL = ", ".join(f"{k} NULLS FIRST" for k in ORDER_KEYS)
