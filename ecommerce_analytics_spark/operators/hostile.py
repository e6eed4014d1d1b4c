"""Adversarial-input certification queries (VERDICT r5 #8).

The suites cover null/empty/tie/skew handling piecewise; these two
registered queries pin it END TO END: a deterministic HOSTILE variant
of the input — nulls injected into every nullable column the operator
touches, mass-identical timestamps, a single mega-entity owning ~10%
of all rows, empty/null/whitespace texts — is constructed IDENTICALLY
inside the Spark plan and the DuckDB oracle (the _CORPUS_SQL pattern),
and the full operator output must hash-match. Any divergence in
three-valued logic, null-ordering, null-partitioning, or empty-string
hashing between the two engines flips the hash.

Null-ordering note: the hostile mutation nulls `quantity`, which is a
member of retail.ORDER_KEYS. Spark's default ASC sort is NULLS FIRST;
DuckDB's is NULLS LAST — since round 7 retail.ORDER_KEYS_SQL spells
NULLS FIRST for EVERY oracle (the hostile retail fixture made the
clean oracles face nullable keys too), and this module reuses that
single definition.

Null-partitioning note: rows with customer_id NULL form ONE window
partition in both engines (SQL PARTITION BY groups nulls; Spark
hash-partitions null to a single key) — certified here, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.classification import (
    classify_events,
)
from ecommerce_analytics_spark.operators.retail import (
    BULK_QTY, HIGH_VALUE_AMOUNT, ORDER_KEYS, ORDER_KEYS_SQL, TXN_CTE,
    transactions,
)
from ecommerce_analytics_spark.plans.registry import query

MEGA_CUSTOMER = 999_999_999
TIE_DATE = "2024-06-15"

# Deterministic, non-overlapping-by-priority mutation rules keyed on
# invoice_no residues. CASE is first-match in both engines, so
# overlapping residues resolve identically.
_H_CUST = (f"CASE WHEN invoice_no % 10 = 0 THEN {MEGA_CUSTOMER} "
           f"WHEN invoice_no % 97 = 1 THEN NULL "
           f"ELSE customer_id END")
_H_DATE = (f"CASE WHEN invoice_no % 7 = 2 THEN DATE '{TIE_DATE}' "
           f"ELSE invoice_date END")
_H_QTY = "CASE WHEN invoice_no % 101 = 3 THEN NULL ELSE quantity END"
_H_AMT = ("CASE WHEN invoice_no % 103 = 5 THEN NULL "
          "ELSE total_amount END")
_H_RET = "CASE WHEN invoice_no % 107 = 7 THEN NULL ELSE is_return END"

_HOSTILE_CTE = TXN_CTE + f"""
, hostile AS (
  SELECT {_H_CUST} AS customer_id,
         invoice_no, line_no, stock_code, supp_id,
         {_H_DATE} AS invoice_date,
         {_H_QTY} AS quantity,
         unit_price,
         {_H_AMT} AS total_amount,
         {_H_RET} AS is_return,
         is_credit_note
  FROM txn
)
"""

# single source of truth since r7 — ORDER_KEYS_SQL itself is NULLS FIRST
_ORDER_KEYS_NF = ORDER_KEYS_SQL


def hostile_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of the `hostile` CTE — same mutations, same
    priorities, via one projection over the clean transaction view."""
    txn = transactions(spark, sf_dir)
    return txn.select(
        F.expr(_H_CUST).alias("customer_id"),
        "invoice_no", "line_no", "stock_code", "supp_id",
        F.expr(_H_DATE).alias("invoice_date"),
        F.expr(_H_QTY).alias("quantity"),
        "unit_price",
        F.expr(_H_AMT).alias("total_amount"),
        F.expr(_H_RET).alias("is_return"),
        "is_credit_note",
    )


_HOSTILE_CLASSIFY_ORACLE = _HOSTILE_CTE + f"""
, classified AS (
  SELECT hostile.*,
         count(CASE WHEN NOT is_return THEN 1 END) OVER (
           PARTITION BY customer_id ORDER BY {_ORDER_KEYS_NF}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prior_purchases,
         last_value(CASE WHEN NOT is_return THEN quantity END
                    IGNORE NULLS) OVER (
           PARTITION BY customer_id, stock_code
           ORDER BY {_ORDER_KEYS_NF}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_purchase_qty
  FROM hostile
)
SELECT customer_id, invoice_no, line_no, stock_code, invoice_date,
       quantity, total_amount,
       CAST(is_return AS INTEGER) AS is_return_flag,
       prior_purchases, last_purchase_qty,
       CASE
         WHEN is_return AND is_credit_note THEN 'credit_note_return'
         WHEN is_return AND abs(quantity) = last_purchase_qty
           THEN 'full_return'
         WHEN is_return THEN 'partial_return'
         WHEN prior_purchases = 0 THEN 'first_purchase'
         WHEN quantity > {BULK_QTY} THEN 'bulk_purchase'
         WHEN total_amount > {HIGH_VALUE_AMOUNT}
           THEN 'high_value_purchase'
         ELSE 'repeat_purchase'
       END AS event_type
FROM classified
"""


@query(
    "event_classification_hostile",
    _HOSTILE_CLASSIFY_ORACLE,
    doc="Flagship §2.8 under adversarial input: the full 7-way "
        "sequential classification over a hostile transaction variant "
        "— a mega customer owning every invoice_no%10==0 row (~10% of "
        "the corpus in ONE window partition), NULL customer_id / "
        "quantity / total_amount / is_return slices, and a mass "
        "identical-timestamp slice — hash-matched end to end. Pins "
        "the cleaning→window→CASE path's three-valued logic, null "
        "partition/sort discipline (NULLS FIRST spelled in the "
        "oracle), and tie-handling under the full ORDER_KEYS total "
        "order.",
    tags=("flagship", "window", "hostile", "skew"),
)
def q_event_classification_hostile(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    classified = classify_events(hostile_transactions(spark, sf_dir))
    # is_return rides out as a NULLABLE INT, not a nullable boolean:
    # a null boolean reaches pandas as object-None from Spark but
    # float-NaN from DuckDB, which the driver's exact value hash
    # (rightly) distinguishes; a nullable int lands as float64-NaN on
    # both sides.
    return classified.select(
        "customer_id", "invoice_no", "line_no", "stock_code",
        "invoice_date", "quantity", "total_amount",
        F.col("is_return").cast("int").alias("is_return_flag"),
        "prior_purchases", "last_purchase_qty", "event_type",
    )


# ---- hostile corpus for the dedup family -----------------------------

_H_TEXT = ("CASE WHEN doc_id % 13 = 1 THEN '' "
           "WHEN doc_id % 17 = 2 THEN NULL "
           "WHEN doc_id % 19 = 3 THEN ' ' "
           "WHEN doc_id % 11 = 4 THEN 'the same hostile text "
           "duplicated across many documents' "
           "ELSE text END")

_HOSTILE_CORPUS_SQL = f"""
corpus AS (
  SELECT doc_id, {_H_TEXT} AS text FROM documents
)
"""


@query(
    "dedup_exact_hostile",
    f"""
    WITH {_HOSTILE_CORPUS_SQL.strip()}
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS canonical_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM corpus GROUP BY md5(text)
    """,
    doc="N1 exact dedup under adversarial input: the corpus is mutated "
        "in-plan with empty-string texts, NULL texts, single-space "
        "texts, and one string verbatim-duplicated across ~9% of all "
        "docs (a mega fingerprint group). Certifies that both engines "
        "hash '' and ' ' distinctly, group NULL fingerprints together "
        "(md5(NULL) IS NULL aggregates as one group), and agree on "
        "min/count over the skewed group — the null/empty discipline "
        "of the cheapest, first-run dedup pass.",
    tags=("dedup", "hostile", "skew"),
)
def q_dedup_exact_hostile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.select("doc_id", F.expr(_H_TEXT).alias("text"))
    return (
        corpus.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )
