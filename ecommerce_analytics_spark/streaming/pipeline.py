"""Streaming ingest edge: JSON parse + corrupt-record routing (P12/T7)
and the enriched-event JSON sink shape (S6/S7).

Mirrors RealTimeAnalytics.java:65-102: parse JSON → null on failure →
split valid/corrupt (the reference drops; we route to a dead-letter
side so nothing is silently lost), enrich, serialize back to JSON with
a server-side stored_at timestamp (S7, RealTimeAnalytics.java:152).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_JSON_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.StringType()),  # ISO-8601 at the edge (§1.3)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def parse_event_lines(lines: DataFrame) -> DataFrame:
    """from_json over raw lines; adds is_corrupt instead of dropping
    (RealTimeAnalytics.java:79 drops silently — we keep a dead-letter
    bit so T7 error routing is observable)."""
    parsed = lines.select(
        F.col("value").alias("raw"),
        F.from_json("value", EVENT_JSON_SCHEMA).alias("e"))
    return parsed.select(
        "raw", "e.*",
        (F.col("e").isNull() | F.col("e.event_id").isNull())
        .alias("is_corrupt"),
    ).withColumn("ts", F.to_timestamp("ts"))


def split_dead_letter(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, dead_letter) — foreachBatch writes each to its own sink."""
    return (parsed.filter(~F.col("is_corrupt")).drop("is_corrupt", "raw"),
            parsed.filter(F.col("is_corrupt")).select("raw"))


def to_event_json(enriched: DataFrame) -> DataFrame:
    """S6/S7 sink shape: struct → JSON string, ISO timestamps at the
    edge, server-side stored_at (current_timestamp, the Spark analog of
    the Mongo insert stamp)."""
    return enriched.select(
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct(
            *[c for c in enriched.columns if c != "ts"],
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
            F.date_format(F.current_timestamp(),
                          "yyyy-MM-dd'T'HH:mm:ss").alias("stored_at"),
        )).alias("value"),
    )
