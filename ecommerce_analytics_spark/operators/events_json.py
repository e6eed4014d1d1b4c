"""The reference's event artifact: nested JSON, cross-engine certified.

``transform_to_events`` (data_loader.py:98-203) is the reference's
primary OUTPUT: one JSON document per transaction — scalars
(event_id, 7-way event_type, user_id, ISO timestamp) plus a nested
``metadata`` object (P11) — dumped to file / Kafka (S3/S4). The
engine has certified every ingredient separately (classification,
CASE columns, struct construction, ISO formatting); this query
certifies the ASSEMBLED document: the exact serialized JSON string
hash-matches a DuckDB oracle that builds the same document by string
concatenation.

INTENTIONAL deviations from the reference's field list (ADVICE r4 —
consumers of the reference's raw Kafka/file events should map these):
- money travels as integer ``unit_price_cents``/``total_amount_cents``
  (the reference emits ``unit_price``/``total_amount`` floats) — float
  rendering is engine- and locale-ambiguous, cents are byte-exact and
  the engine-wide §1.3 money convention;
- ``invoice_no``/``stock_code`` are JSON numbers (the reference emits
  strings) — the driver tables type them integral, and numbers render
  identically in both engines;
- ``description``/``country`` are dropped — the driver schema carries
  neither column, so emitting them would hardcode empty placeholders.
A consumer needing the reference's exact field set divides cents by
100 and casts the two keys to strings at the edge; the document
STRUCTURE (scalars + nested metadata) and every retained field's
semantics are byte-certified below.

Serialization contract (what makes the cross-check exact):
- every struct field is pre-rendered to a JSON-stable type — longs
  (quantities, integer cents for money — no float formatting
  ambiguity), booleans, and alphanumeric strings (no escaping
  needed) — so Spark's ``to_json`` output is byte-predictable:
  no spaces, field order = struct order, true/false booleans;
- timestamps pre-formatted to ISO yyyy-MM-dd'T'HH:mm:ss strings
  (§1.3: timestamps travel as ISO strings at the edge).

Map-only on top of the flagship classification plan — the one
customer-hash exchange it already pays; the JSON render is codegen
(StructsToJson), no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.numerics import cents
from ecommerce_analytics_spark.operators.classification import (
    classify_events,
)
from ecommerce_analytics_spark.operators.retail import (
    BULK_QTY, HIGH_VALUE_AMOUNT, ORDER_KEYS_SQL, TXN_CTE, transactions,
)
from ecommerce_analytics_spark.plans.registry import query

_SEASON = ("CASE WHEN month(invoice_date) IN (11, 12) THEN 'holiday' "
           "WHEN month(invoice_date) IN (3, 4, 5) THEN 'spring' "
           "WHEN month(invoice_date) IN (6, 7, 8) THEN 'summer' "
           "ELSE 'fall' END")

# same window skeleton as the certified classification oracle, with
# unit_price carried through for the metadata object
_CLS_SQL = TXN_CTE + f"""
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
SELECT customer_id, invoice_no, stock_code, invoice_date, quantity,
       unit_price, total_amount, is_return,
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

_EVENTS_JSON_ORACLE = (f"""
SELECT CAST(invoice_no AS VARCHAR) || '_' || CAST(stock_code AS VARCHAR)
         AS event_id,
       '{{"event_id":"' || invoice_no || '_' || stock_code
       || '","event_type":"' || event_type
       || '","user_id":"customer_' || customer_id
       || '","timestamp":"' || strftime(invoice_date, '%Y-%m-%dT%H:%M:%S')
       || '","metadata":{{"invoice_no":' || invoice_no
       || ',"stock_code":' || stock_code
       || ',"quantity":' || CAST(quantity AS BIGINT)
       || ',"unit_price_cents":' || CAST(round(unit_price * 100) AS BIGINT)
       || ',"total_amount_cents":' || CAST(round(total_amount * 100) AS BIGINT)
       || ',"is_return":' || CASE WHEN is_return THEN 'true' ELSE 'false' END
       || ',"customer_type":"'
       || CASE WHEN customer_id < 0 THEN 'anonymous' ELSE 'identified' END
       || '","season":"' || {_SEASON} || '"}}}}' AS event_json
FROM (
""" + _CLS_SQL + """
) cls
WHERE customer_id IS NOT NULL AND invoice_date IS NOT NULL
  AND quantity IS NOT NULL AND unit_price IS NOT NULL
  AND total_amount IS NOT NULL""")


@query(
    "retail_events_json", _EVENTS_JSON_ORACLE,
    doc="The reference's assembled event document "
        "(transform_to_events, data_loader.py:146-178): classified "
        "transaction → nested JSON with metadata object, serialized "
        "via to_json and hash-matched BYTE-FOR-BYTE against a DuckDB "
        "oracle that concatenates the same document — certifying the "
        "JSON edge itself, not just its ingredients. All "
        "formatting-ambiguous values pre-rendered (integer cents, "
        "ISO strings, booleans). Map-only over the flagship "
        "classification exchange.",
    tags=("tier-a", "json", "edge", "flagship"),
)
def q_retail_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Required-fields contract (both sides): the reference's
    # transform_to_events CRASHES on a missing value (int()/float()
    # casts, data_loader.py:155-157) — a populated row is its
    # documented precondition. Serializing a null field is also
    # engine-ambiguous (to_json OMITS null struct fields; string
    # concatenation NULL-poisons the whole document), so the JSON
    # edge emits only fully-populated documents. No-op on clean data.
    cls = (classify_events(transactions(spark, sf_dir))
           .filter(F.col("customer_id").isNotNull()
                   & F.col("invoice_date").isNotNull()
                   & F.col("quantity").isNotNull()
                   & F.col("unit_price").isNotNull()
                   & F.col("total_amount").isNotNull()))
    meta = F.struct(
        F.col("invoice_no").cast("long").alias("invoice_no"),
        F.col("stock_code").cast("long").alias("stock_code"),
        F.col("quantity").cast("long").alias("quantity"),
        cents("unit_price").alias("unit_price_cents"),
        cents("total_amount").alias("total_amount_cents"),
        F.col("is_return").alias("is_return"),
        F.when(F.col("customer_id") < 0, "anonymous")
        .otherwise("identified").alias("customer_type"),
        F.expr(_SEASON).alias("season"))
    event = F.struct(
        F.concat_ws("_", "invoice_no", "stock_code").alias("event_id"),
        F.col("event_type").alias("event_type"),
        F.format_string("customer_%d", F.col("customer_id"))
        .alias("user_id"),
        F.date_format("invoice_date", "yyyy-MM-dd'T'HH:mm:ss")
        .alias("timestamp"),
        meta.alias("metadata"))
    return cls.select(
        F.concat_ws("_", "invoice_no", "stock_code").alias("event_id"),
        F.to_json(event).alias("event_json"))
