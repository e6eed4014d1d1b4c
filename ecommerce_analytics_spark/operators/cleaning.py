"""Batch cleaning / projection operators (SURVEY.md §2.2, P1-P11).

Re-expresses the reference's pandas cleaning pipeline
(data_loader.py:36-96) and event synthesis (:146-178) as declarative
column expressions — Catalyst pushes the range predicates into the
parquet scan and prunes unused columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.retail import (
    ORDER_KEYS, ORDER_KEYS_SQL, TXN_CTE, transactions,
)
from ecommerce_analytics_spark.plans.registry import query

_CLEAN_ORACLE = TXN_CTE + """
SELECT CAST(invoice_no AS VARCHAR) || '_' || CAST(stock_code AS VARCHAR) AS event_id,
       'customer_' || CAST(customer_id AS VARCHAR) AS user_key,
       CASE WHEN month(invoice_date) IN (11, 12) THEN 'holiday'
            WHEN month(invoice_date) IN (3, 4, 5) THEN 'spring'
            WHEN month(invoice_date) IN (6, 7, 8) THEN 'summer'
            ELSE 'fall' END AS season,
       CASE WHEN customer_id IS NULL OR customer_id % 10 = 0
            THEN 'anonymous'
            ELSE 'identified' END AS customer_type,
       quantity, unit_price, total_amount, is_return, invoice_date
FROM txn
WHERE quantity > -100000 AND quantity < 100000
  AND unit_price > 0 AND unit_price < 100000
"""


@query(
    "clean_transactions",
    _CLEAN_ORACLE,
    doc="P1-P11 composite: range filters (data_loader.py:68,78), derived "
        "TotalAmount/IsReturn (:81,:84), key synthesis (:147,:110), season "
        "and customer_type CASE (:169-178,:163-167).",
    tags=("projection", "filter", "tier-a"),
)
def q_clean_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    txn = transactions(spark, sf_dir)
    month = F.month("invoice_date")
    return (
        txn
        # P4/P5 range predicates — pushed to the scan by Catalyst
        .filter((F.col("quantity") > -100000) & (F.col("quantity") < 100000))
        .filter((F.col("unit_price") > 0) & (F.col("unit_price") < 100000))
        .select(
            # P8 key synthesis
            F.concat_ws("_", F.col("invoice_no").cast("string"),
                        F.col("stock_code").cast("string")).alias("event_id"),
            F.concat(F.lit("customer_"),
                     F.col("customer_id").cast("string")).alias("user_key"),
            # P9 season CASE
            F.when(month.isin(11, 12), "holiday")
            .when(month.isin(3, 4, 5), "spring")
            .when(month.isin(6, 7, 8), "summer")
            .otherwise("fall").alias("season"),
            # P10 customer_type CASE (anonymous analog: custkey % 10 == 0
            # or MISSING — the reference's whole point for this rule is
            # null CustomerIDs, data_loader.py:50-62; a NULL % 10 would
            # otherwise three-valued-logic its way to 'identified')
            F.when(F.col("customer_id").isNull()
                   | (F.col("customer_id") % 10 == 0), "anonymous")
            .otherwise("identified").alias("customer_type"),
            "quantity", "unit_price", "total_amount", "is_return",
            "invoice_date",
        )
    )


_SURROGATE_ORACLE = TXN_CTE + f"""
SELECT invoice_no, line_no, stock_code,
       CASE WHEN customer_id IS NULL OR customer_id % 10 = 0
            THEN -CAST(row_number() OVER (
                   ORDER BY {ORDER_KEYS_SQL}, customer_id NULLS FIRST)
                 AS BIGINT)
            ELSE customer_id END AS customer_id_filled,
       (customer_id IS NULL OR customer_id % 10 = 0) AS is_anonymous
FROM txn
"""


@query(
    "surrogate_customer_ids",
    _SURROGATE_ORACLE,
    doc="P3 null/surrogate-key policy (data_loader.py:50-62): 'missing' "
        "customers get unique negative IDs. Global row_number is fine at "
        "test SF; the 100 TB path swaps in monotonically_increasing_id() "
        "(unique, distributed, not dense) — same uniqueness contract.",
    tags=("projection", "tier-a"),
)
def q_surrogate_customer_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    txn = transactions(spark, sf_dir)
    # customer_id tie-breaks the surrogate numbering: a duplicated
    # orderkey whose two order rows differ only in custkey produces
    # txn rows tied on every ORDER_KEYS column — without the extra key
    # the two engines hand out adjacent -n values in opposite orders
    w = Window.orderBy(*[F.col(c) for c in ORDER_KEYS],
                       F.col("customer_id"))
    # NULL customer_id is the operator's raison d'être (P3: missing
    # customers get unique negative surrogates, data_loader.py:50-62)
    is_anon = F.col("customer_id").isNull() | (F.col("customer_id") % 10 == 0)
    return txn.select(
        "invoice_no", "line_no", "stock_code",
        F.when(is_anon, -F.row_number().over(w).cast("long"))
        .otherwise(F.col("customer_id")).alias("customer_id_filled"),
        is_anon.alias("is_anonymous"),
    )


_PROPS_ORACLE = """
WITH safe AS (
  -- json_valid guard: share Spark get_json_object's null-on-corrupt
  -- semantics (DuckDB's json_extract_string is strict and would
  -- ERROR on a malformed props payload the operator must tolerate)
  SELECT event_type,
         CASE WHEN json_valid(props)
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       avg(k) AS avg_k, min(k) AS min_k, max(k) AS max_k
FROM safe
GROUP BY event_type
"""


_POLY_ORACLE = """
WITH safe AS (
  -- json_valid guard: DuckDB's json_extract_string ERRORS on
  -- malformed JSON where Spark's get_json_object returns NULL (the
  -- defensive behavior the operator certifies); the guard makes the
  -- oracle share Spark's null-on-corrupt semantics
  SELECT event_id, event_type,
         CASE WHEN json_valid(props)
              THEN json_extract_string(props, '$.k') END AS k_raw
  FROM events
), mixed AS (
  SELECT event_id, event_type,
         CASE WHEN event_id % 3 = 0
              THEN '{"k": "' || k_raw || '", "flag": "true"}'
              ELSE '{"k": ' || k_raw || ', "flag": true}'
         END AS props
  FROM safe
)
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       COALESCE(json_extract_string(props, '$.flag') = 'true', FALSE)
         AS flag_value
FROM mixed
"""


@query(
    "events_validation",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_ts,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_user,
           CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_type,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_value,
           CAST(sum(CASE WHEN props IS NOT NULL
                          AND NOT json_valid(props)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_props,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
             AS n_dup_event_id,
           CAST(sum(CASE WHEN ts IS NOT NULL AND user_id IS NOT NULL
                          AND event_type IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_time_valid
    FROM events
    """,
    doc="The event-stream ingest gate — the documented INPUT CONTRACT "
        "for the time/journey operators: sessionization, window "
        "revenue, and Markov attribution require non-NULL ts, "
        "user_id, and event_type (a NULL-timestamp event has no "
        "well-defined session or journey position, and the engines "
        "legitimately order/group it differently), while the "
        "aggregation/LTV/props families are certified null-tolerant "
        "(tests/test_hostile_events.py). One map-side pass counts the "
        "violation classes — NULL ts/user/type/value, non-JSON props "
        "— plus the time-contract-valid remainder. Production "
        "pipelines run this (or filter on its predicate) at ingest.",
    tags=("validation", "agg", "tier-a"),
)
def q_events_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.io import load_table
    events = load_table(spark, sf_dir, "events")

    def count_when(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    # Spark's json_valid twin: get_json_object(x, '$') is NULL exactly
    # when x is not parseable JSON (and passes NULL through). The twin
    # is NOT bit-identical to DuckDB's json_valid — two DOCUMENTED
    # divergence classes exist (verified on Spark 4.1.2 / DuckDB,
    # round 7): (1) trailing garbage after a complete value
    # ('{"a":1} x') — Spark's Jackson stops at the first complete
    # value → counted VALID here, json_valid says false; (2) trailing
    # comma ('{"a":1,}') — DuckDB's yyjson is lenient → json_valid
    # true, Spark strict → counted BAD here. Neither is expressible
    # identically in both engines with built-ins (try_parse_json also
    # accepts trailing garbage), so the ingest contract accepts these
    # two classes as engine-defined; every AGREEING class — including
    # the bare literal 'null', which get_json_object keeps (returns
    # the string 'null', not SQL NULL) and json_valid accepts — is
    # pinned by tests/test_hostile_events.py.
    bad_props = (F.col("props").isNotNull()
                 & F.get_json_object("props", "$").isNull())
    return events.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        count_when(F.col("ts").isNull()).alias("n_null_ts"),
        count_when(F.col("user_id").isNull()).alias("n_null_user"),
        count_when(F.col("event_type").isNull()).alias("n_null_type"),
        count_when(F.col("value").isNull()).alias("n_null_value"),
        count_when(bad_props).alias("n_bad_props"),
        # at-least-once duplicate deliveries (exactly-once violations
        # upstream): per-event analytics gate these with a full-row
        # DISTINCT; certified in tests/test_hostile_dup_events.py
        (F.count(F.lit(1)) - F.countDistinct("event_id")).cast("long")
        .alias("n_dup_event_id"),
        count_when(F.col("ts").isNotNull()
                   & F.col("user_id").isNotNull()
                   & F.col("event_type").isNotNull())
        .alias("n_time_valid"),
    )


@query(
    "retail_validation",
    """
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
      (SELECT CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM orders) AS n_null_orderdate,
      (SELECT CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM orders) AS n_null_custkey,
      (SELECT CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM orders) AS n_null_totalprice,
      (SELECT CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
              AS BIGINT) FROM orders) AS n_neg_totalprice,
      (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
       FROM orders) AS n_dup_orderkey,
      (SELECT CAST(count(*) AS BIGINT) FROM orders o
       WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        AS n_orphan_custkey,
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lineitems,
      (SELECT CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM lineitem) AS n_null_qty,
      (SELECT CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0
              END) AS BIGINT) FROM lineitem) AS n_null_price,
      (SELECT CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
              AS BIGINT) FROM lineitem) AS n_neg_price,
      (SELECT CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM lineitem) AS n_null_shipdate,
      (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
       WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS n_orphan_lines,
      (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_customers,
      (SELECT CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
       FROM customer) AS n_dup_custkey,
      (SELECT CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM customer) AS n_null_nationkey,
      (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_parts,
      (SELECT CAST(count(*) - count(DISTINCT p_partkey) AS BIGINT)
       FROM part) AS n_dup_partkey,
      (SELECT CAST(sum(CASE WHEN p_name IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM part) AS n_null_pname,
      (SELECT CAST(sum(CASE WHEN p_retailprice < 0 THEN 1 ELSE 0 END)
              AS BIGINT) FROM part) AS n_neg_retailprice,
      (SELECT CAST(count(*) AS BIGINT) FROM supplier) AS n_suppliers,
      (SELECT CAST(count(*) - count(DISTINCT s_suppkey) AS BIGINT)
       FROM supplier) AS n_dup_suppkey,
      (SELECT CAST(sum(CASE WHEN s_nationkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) FROM supplier) AS n_null_s_nationkey
    """,
    doc="The relational ingest gate (VERDICT r6 #1) — the documented "
        "INPUT CONTRACT for the retail/star/window families over all "
        "five relational tables (lineitem, orders, customer, part, "
        "supplier): one map-side pass per table counts the violation "
        "classes the hostile retail fixture salts (NULL order dates / "
        "custkeys / prices / names, negative prices, duplicate "
        "o_orderkey / c_custkey / p_partkey / s_suppkey ingest rows) "
        "plus two referential-orphan counts via broadcast anti-joins "
        "(orders→customer, lineitem→orders). Operators that need a "
        "clean subset declare it in-plan (dated orders for time "
        "curves, positive prices for ln(), both skyline coordinates, "
        "non-NULL names for string similarity, canonical-row picks "
        "for keyed CDC snapshots — each certified on the salted "
        "fixture in tests/test_hostile_retail.py); production "
        "pipelines run this gate at ingest and alert on nonzero "
        "classes.",
    tags=("validation", "tier-a", "north-star"),
)
def q_retail_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.io import load_table

    def count_when(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    o_agg = orders.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        count_when(F.col("o_orderdate").isNull()).alias("n_null_orderdate"),
        count_when(F.col("o_custkey").isNull()).alias("n_null_custkey"),
        count_when(F.col("o_totalprice").isNull()).alias("n_null_totalprice"),
        count_when(F.col("o_totalprice") < 0).alias("n_neg_totalprice"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long")
        .alias("n_dup_orderkey"))
    orphan_cust = (orders.filter(F.col("o_custkey").isNotNull())
                   .join(customer.select("c_custkey"),
                         F.col("o_custkey") == F.col("c_custkey"),
                         "left_anti")
                   .agg(F.count(F.lit(1)).cast("long")
                        .alias("n_orphan_custkey")))
    l_agg = lineitem.agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        count_when(F.col("l_quantity").isNull()).alias("n_null_qty"),
        count_when(F.col("l_extendedprice").isNull()).alias("n_null_price"),
        count_when(F.col("l_extendedprice") < 0).alias("n_neg_price"),
        count_when(F.col("l_shipdate").isNull()).alias("n_null_shipdate"))
    orphan_lines = (lineitem
                    .join(orders.select("o_orderkey"),
                          F.col("l_orderkey") == F.col("o_orderkey"),
                          "left_anti")
                    .agg(F.count(F.lit(1)).cast("long")
                         .alias("n_orphan_lines")))
    c_agg = customer.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (F.count(F.lit(1)) - F.countDistinct("c_custkey")).cast("long")
        .alias("n_dup_custkey"),
        count_when(F.col("c_nationkey").isNull()).alias("n_null_nationkey"))
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    p_agg = part.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (F.count(F.lit(1)) - F.countDistinct("p_partkey")).cast("long")
        .alias("n_dup_partkey"),
        count_when(F.col("p_name").isNull()).alias("n_null_pname"),
        count_when(F.col("p_retailprice") < 0).alias("n_neg_retailprice"))
    s_agg = supplier.agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        (F.count(F.lit(1)) - F.countDistinct("s_suppkey")).cast("long")
        .alias("n_dup_suppkey"),
        count_when(F.col("s_nationkey").isNull())
        .alias("n_null_s_nationkey"))
    return (o_agg
            .crossJoin(F.broadcast(orphan_cust))
            .crossJoin(F.broadcast(l_agg))
            .crossJoin(F.broadcast(orphan_lines))
            .crossJoin(F.broadcast(c_agg))
            .crossJoin(F.broadcast(p_agg))
            .crossJoin(F.broadcast(s_agg))
            .select("n_orders", "n_null_orderdate", "n_null_custkey",
                    "n_null_totalprice", "n_neg_totalprice",
                    "n_dup_orderkey", "n_orphan_custkey",
                    "n_lineitems", "n_null_qty", "n_null_price",
                    "n_neg_price", "n_null_shipdate", "n_orphan_lines",
                    "n_customers", "n_dup_custkey", "n_null_nationkey",
                    "n_parts", "n_dup_partkey", "n_null_pname",
                    "n_neg_retailprice", "n_suppliers", "n_dup_suppkey",
                    "n_null_s_nationkey"))


@query(
    "polymorphic_props_extract",
    _POLY_ORACLE,
    doc="P17 defensive polymorphic extract (EnrichmentFunction.java:84-110 "
        "handles Number-or-String amounts and Boolean-or-String flags): "
        "a mixed-encoding JSON corpus is synthesized (every 3rd event "
        "string-typed), then values normalize through extract + cast — "
        "get_json_object strips quotes either way, the cast lands the "
        "final type.",
    tags=("json", "tier-a"),
)
def q_polymorphic_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.io import load_table
    events = load_table(spark, sf_dir, "events")
    k_raw = F.get_json_object("props", "$.k")
    mixed = events.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 3 == 0,
               F.concat(F.lit('{"k": "'), k_raw, F.lit('", "flag": "true"}')))
        .otherwise(F.concat(F.lit('{"k": '), k_raw, F.lit(', "flag": true}')))
        .alias("props"))
    return mixed.select(
        "event_id", "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        # coalesce: corrupt-props rows get FALSE, not a NULL boolean
        # (nullable booleans hit the None-vs-NaN pandas
        # canonicalization asymmetry between the engines)
        F.coalesce(F.get_json_object("props", "$.flag") == "true",
                   F.lit(False)).alias("flag_value"),
    )


@query(
    "props_json_extract",
    _PROPS_ORACLE,
    doc="P12/P17 JSON boundary: parse the untrusted props JSON string "
        "(get_json_object → null on corrupt, mirroring the parse-error "
        "drop at RealTimeAnalytics.java:76-82), aggregate per type.",
    tags=("json", "tier-a"),
)
def q_props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.io import load_table
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg(k).alias("avg_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


_FUNNEL_ORACLE = TXN_CTE + """
SELECT CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(*) FILTER (WHERE quantity > -100000 AND quantity < 100000)
            AS BIGINT) AS n_after_quantity_filter,
       CAST(count(*) FILTER (WHERE quantity > -100000 AND quantity < 100000
                               AND unit_price > 0 AND unit_price < 100000)
            AS BIGINT) AS n_clean,
       CAST(count(*) FILTER (WHERE quantity > -100000 AND quantity < 100000
                               AND unit_price > 0 AND unit_price < 100000
                               AND is_return)
            AS BIGINT) AS n_returns,
       round(CAST(count(*) FILTER (WHERE quantity > -100000
                                     AND quantity < 100000
                                     AND unit_price > 0
                                     AND unit_price < 100000
                                     AND is_return) AS DOUBLE)
             / nullif(count(*) FILTER (WHERE quantity > -100000
                                         AND quantity < 100000
                                         AND unit_price > 0
                                         AND unit_price < 100000), 0),
             6) AS return_pct,
       CAST(count(*) FILTER (WHERE customer_id % 10 = 0) AS BIGINT)
         AS n_anonymous,
       round(CAST(count(*) FILTER (WHERE customer_id % 10 = 0) AS DOUBLE)
             / nullif(count(*), 0), 6) AS anonymous_pct
FROM txn
"""


@query(
    "cleaning_funnel",
    _FUNNEL_ORACLE,
    doc="The reference's log-based invariant reporting as a first-class "
        "query (data_loader.py:43,71,76,91 logs row counts in/out of "
        "every filter; :87-89 return ratio; :194-196 anonymous ratio): "
        "the whole filter funnel — raw → quantity-range → price-range — "
        "plus return/anonymous ratios, in ONE conditional-count scan "
        "(count_if), zero shuffles beyond the final partial combine. At "
        "100 TB this replaces four sequential count() jobs (four full "
        "scans) with one.",
    tags=("agg", "quality", "tier-a"),
)
def q_cleaning_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    txn = transactions(spark, sf_dir)
    qty_ok = (F.col("quantity") > -100000) & (F.col("quantity") < 100000)
    price_ok = (F.col("unit_price") > 0) & (F.col("unit_price") < 100000)
    clean = qty_ok & price_ok
    anon = F.col("customer_id") % 10 == 0
    return txn.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_if(qty_ok).alias("n_after_quantity_filter"),
        F.count_if(clean).alias("n_clean"),
        F.count_if(clean & F.col("is_return")).alias("n_returns"),
        # nullif guards: on degenerate (all-filtered / empty) input both
        # twins yield NULL instead of engine-specific div-by-zero output
        F.round(F.count_if(clean & F.col("is_return")).cast("double")
                / F.nullif(F.count_if(clean), F.lit(0)), 6)
        .alias("return_pct"),
        F.count_if(anon).alias("n_anonymous"),
        F.round(F.count_if(anon).cast("double")
                / F.nullif(F.count(F.lit(1)), F.lit(0)), 6)
        .alias("anonymous_pct"),
    )


@query(
    "props_variant_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(k) AS BIGINT) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM (SELECT event_type,
                 TRY_CAST(json_extract_string(
                     TRY_CAST(props AS JSON), '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
    """,
    doc="Spark-4 VARIANT path for the semi-structured props column: "
        "try_parse_json → variant_get('$.k') — the open-schema "
        "binary encoding that replaces per-query string re-parsing "
        "(get_json_object) and is the storage shape shredding-aware "
        "readers push into. Null/empty/invalid props flow through the "
        "try_ semantics as NULLs on both engines (exercised at "
        "sf0.01, where a third of events carry no props). Exact "
        "integer rollup per event type.",
    tags=("projection", "json", "variant"),
)
def q_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.io import load_table
    events = load_table(spark, sf_dir, "events")
    k = F.expr(
        "variant_get(try_parse_json(nullif(props, '')), '$.k', 'bigint')")
    return (events.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.count("k").cast("long").alias("n_with_k"),
                 F.sum("k").cast("long").alias("sum_k"),
                 F.min("k").cast("long").alias("min_k"),
                 F.max("k").cast("long").alias("max_k")))
