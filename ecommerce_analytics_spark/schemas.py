"""Schema contracts (SURVEY.md §1).

Every StructType the engine exposes. The retail/event schemas mirror the
reference's data model (data_loader.py:41-84, :146-178 /
CustomerEvent.java:12-17 / init-db.js:5-137); the star-schema tables
mirror the driver's synthetic parquet (FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference retail transaction table (UK Online Retail CSV,
#     data_loader.py:41-84) --------------------------------------------
RETAIL_TRANSACTION = T.StructType([
    T.StructField("InvoiceNo", T.StringType(), False),
    T.StructField("StockCode", T.StringType(), False),
    T.StructField("Description", T.StringType(), True),
    T.StructField("Quantity", T.IntegerType(), True),
    T.StructField("InvoiceDate", T.TimestampType(), True),
    T.StructField("UnitPrice", T.DoubleType(), True),
    T.StructField("CustomerID", T.LongType(), True),
    T.StructField("Country", T.StringType(), True),
])

# --- Reference customer event (data_loader.py:146-178; typed struct
#     instead of Map<String,Object> per SURVEY §1.3) -------------------
EVENT_METADATA = T.StructType([
    T.StructField("invoice_no", T.StringType(), True),
    T.StructField("stock_code", T.StringType(), True),
    T.StructField("description", T.StringType(), True),
    T.StructField("quantity", T.IntegerType(), True),
    T.StructField("unit_price", T.DoubleType(), True),
    T.StructField("total_amount", T.DoubleType(), True),
    T.StructField("country", T.StringType(), True),
    T.StructField("is_return", T.BooleanType(), True),
    T.StructField("customer_type", T.StringType(), True),
    T.StructField("season", T.StringType(), True),
])

EVENT_SIMULATION = T.StructType([
    T.StructField("original_timestamp", T.StringType(), True),
    T.StructField("simulated_timestamp", T.StringType(), True),
    T.StructField("compression_factor", T.IntegerType(), True),
])

CUSTOMER_EVENT = T.StructType([
    T.StructField("event_id", T.StringType(), False),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("user_id", T.StringType(), True),
    T.StructField("timestamp", T.StringType(), True),  # ISO-8601 at the edge
    T.StructField("metadata", EVENT_METADATA, True),
    T.StructField("simulation", EVENT_SIMULATION, True),
])

# Enriched event additions (EnrichedEvent.java:10-22)
ENRICHED_EXTRAS = T.StructType([
    T.StructField("processing_time", T.LongType(), True),
    T.StructField("user_segment", T.StringType(), True),
    T.StructField("customer_ltv", T.DoubleType(), True),
    T.StructField("risk_score", T.DoubleType(), True),
])

# --- Materialized-view contracts (init-db.js:5-137) -------------------
HOURLY_REVENUE = T.StructType([
    T.StructField("hour_timestamp", T.TimestampType(), False),
    T.StructField("total_revenue", T.DoubleType(), True),
    T.StructField("order_count", T.LongType(), True),
    T.StructField("unique_customers", T.LongType(), True),
])

POPULAR_PRODUCTS = T.StructType([
    T.StructField("product_id", T.StringType(), False),
    T.StructField("product_name", T.StringType(), True),
    T.StructField("total_quantity", T.LongType(), True),
    T.StructField("total_revenue", T.DoubleType(), True),
])

RECOMMENDATION = T.StructType([
    T.StructField("product_id", T.StringType(), False),
    T.StructField("recommendations", T.ArrayType(T.StructType([
        T.StructField("product_id", T.StringType(), False),
        T.StructField("similarity_score", T.DoubleType(), True),
        T.StructField("product_name", T.StringType(), True),
    ])), True),
])

# --- Driver synthetic star schema (FIXTURES.md §A) --------------------
DRIVER_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
