"""Sequential event classification — the flagship query (SURVEY.md §2.8).

The reference classifies each transaction into 7 event types with an
order-dependent running-state loop (data_loader.py:103-143, pandas
``iterrows`` + dict state). Here the same semantics are pure window
functions — fully distributed, one hash-partition shuffle per window
spec, no driver-side state:

    prior_purchases  = count of this customer's earlier purchases
    last_purchase_qty = most recent prior purchase qty of the same
                        (customer, stock_code)

    event_type = CASE
      WHEN is_return AND is_credit_note                 'credit_note_return'
      WHEN is_return AND abs(qty) = last_purchase_qty   'full_return'
      WHEN is_return                                    'partial_return'
      WHEN prior_purchases = 0                          'first_purchase'
      WHEN quantity > BULK_QTY                          'bulk_purchase'
      WHEN total_amount > HIGH_VALUE_AMOUNT             'high_value_purchase'
      ELSE                                              'repeat_purchase'

Intentional divergence from the reference (documented, SURVEY §2.8):
its ``full_return`` branch is unreachable (dict keyed by customer but
probed by (customer, stock_code), data_loader.py:120 vs :137-138); we
implement the evident intent — compare against the most recent prior
purchase quantity for that (customer, stock_code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.retail import (
    BULK_QTY, HIGH_VALUE_AMOUNT, ORDER_KEYS, ORDER_KEYS_SQL, TXN_CTE,
    transactions,
)
from ecommerce_analytics_spark.plans.registry import query


def classify_events(txn: DataFrame) -> DataFrame:
    """Add prior_purchases / last_purchase_qty / event_type columns.

    Both window specs partition by customer_id ALONE so Catalyst plans
    ONE exchange (hash on customer) followed by two sorts — previously
    the product window partitioned by (customer, stock_code) and paid a
    second full shuffle of the fact table. The product-scoped lookup
    still works under the customer-only partition: ordering by
    (stock_code, time) makes each stock's history contiguous, so the
    last prior purchase struct in the frame either belongs to the
    current row's stock_code (→ its qty) or to an earlier stock block
    (→ this stock has no prior purchase → null), which is exactly the
    (customer, stock_code)-partitioned semantics.
    """
    order_cols = [F.col(c) for c in ORDER_KEYS]
    w_cust = (Window.partitionBy("customer_id").orderBy(*order_cols)
              .rowsBetween(Window.unboundedPreceding, -1))
    w_prod = (Window.partitionBy("customer_id")
              .orderBy(F.col("stock_code"), *order_cols)
              .rowsBetween(Window.unboundedPreceding, -1))

    not_return = ~F.col("is_return")
    prior_purchases = F.count(F.when(not_return, F.lit(1))).over(w_cust)
    # quantity IS NOT NULL keeps the null discipline identical to the
    # oracle's last_value(CASE WHEN NOT is_return THEN quantity END
    # IGNORE NULLS): a purchase row with NULL quantity must be SKIPPED
    # (the oracle's CASE yields NULL → skipped), not captured as a
    # non-null struct carrying a null qty. Unreachable on clean data
    # (quantity is never null); load-bearing for the hostile variant.
    last_purchase = F.last(
        F.when(not_return & F.col("quantity").isNotNull(),
               F.struct("stock_code", "quantity")),
        ignorenulls=True).over(w_prod)
    last_purchase_qty = F.when(
        last_purchase["stock_code"] == F.col("stock_code"),
        last_purchase["quantity"])

    classified = (
        txn
        .withColumn("prior_purchases", prior_purchases)
        .withColumn("last_purchase_qty", last_purchase_qty)
        .withColumn(
            "event_type",
            F.when(F.col("is_return") & F.col("is_credit_note"),
                   "credit_note_return")
            .when(F.col("is_return")
                  & (F.abs(F.col("quantity")) == F.col("last_purchase_qty")),
                  "full_return")
            .when(F.col("is_return"), "partial_return")
            .when(F.col("prior_purchases") == 0, "first_purchase")
            .when(F.col("quantity") > BULK_QTY, "bulk_purchase")
            .when(F.col("total_amount") > HIGH_VALUE_AMOUNT,
                  "high_value_purchase")
            .otherwise("repeat_purchase"))
    )
    return classified


_CLASSIFY_ORACLE = TXN_CTE + f"""
, classified AS (
  SELECT txn.*,
         count(CASE WHEN NOT is_return THEN 1 END) OVER (
           PARTITION BY customer_id ORDER BY {ORDER_KEYS_SQL}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchases,
         last_value(CASE WHEN NOT is_return THEN quantity END IGNORE NULLS) OVER (
           PARTITION BY customer_id, stock_code ORDER BY {ORDER_KEYS_SQL}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_qty
  FROM txn
)
SELECT customer_id, invoice_no, line_no, stock_code, invoice_date,
       quantity, total_amount, is_return, prior_purchases, last_purchase_qty,
       CASE
         WHEN is_return AND is_credit_note THEN 'credit_note_return'
         WHEN is_return AND abs(quantity) = last_purchase_qty THEN 'full_return'
         WHEN is_return THEN 'partial_return'
         WHEN prior_purchases = 0 THEN 'first_purchase'
         WHEN quantity > {BULK_QTY} THEN 'bulk_purchase'
         WHEN total_amount > {HIGH_VALUE_AMOUNT} THEN 'high_value_purchase'
         ELSE 'repeat_purchase'
       END AS event_type
FROM classified
"""


@query(
    "event_classification",
    _CLASSIFY_ORACLE,
    doc="Flagship §2.8: 7-way sequential classification via window functions "
        "(data_loader.py:103-143 re-expressed without driver-side state).",
    tags=("flagship", "window", "tier-a"),
)
def q_event_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    classified = classify_events(transactions(spark, sf_dir))
    return classified.select(
        "customer_id", "invoice_no", "line_no", "stock_code", "invoice_date",
        "quantity", "total_amount", "is_return", "prior_purchases",
        "last_purchase_qty", "event_type",
    )


_DISTRIBUTION_ORACLE = TXN_CTE + f"""
, classified AS (
  SELECT txn.*,
         count(CASE WHEN NOT is_return THEN 1 END) OVER (
           PARTITION BY customer_id ORDER BY {ORDER_KEYS_SQL}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_purchases,
         last_value(CASE WHEN NOT is_return THEN quantity END IGNORE NULLS) OVER (
           PARTITION BY customer_id, stock_code ORDER BY {ORDER_KEYS_SQL}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_qty
  FROM txn
), typed AS (
  SELECT CASE
           WHEN is_return AND is_credit_note THEN 'credit_note_return'
           WHEN is_return AND abs(quantity) = last_purchase_qty THEN 'full_return'
           WHEN is_return THEN 'partial_return'
           WHEN prior_purchases = 0 THEN 'first_purchase'
           WHEN quantity > {BULK_QTY} THEN 'bulk_purchase'
           WHEN total_amount > {HIGH_VALUE_AMOUNT} THEN 'high_value_purchase'
           ELSE 'repeat_purchase'
         END AS event_type
  FROM classified
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE) AS share
FROM typed
GROUP BY event_type
"""


@query(
    "event_type_distribution_txn",
    _DISTRIBUTION_ORACLE,
    doc="A1 over the classified stream: event-type counts + share.",
    tags=("agg", "tier-a"),
)
def q_event_type_distribution_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    classified = classify_events(transactions(spark, sf_dir))
    counts = classified.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"))
    total = Window.partitionBy()
    return counts.select(
        "event_type", "n_events",
        (F.col("n_events") / F.sum("n_events").over(total)).alias("share"),
    )
