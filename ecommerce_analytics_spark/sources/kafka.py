"""Kafka source/sink wiring (SURVEY §2.1 S4-S6).

Mirrors the reference topology: raw topic consumed from earliest with
a consumer group (RealTimeAnalytics.java:48-63), processed events
produced keyed by event_id with acks=all durability
(event_simulator.py:115-122, :196-201).

The spark-sql-kafka connector jar is not on the test classpath, so
everything is a config builder behind ``kafka_available()``; the
streaming tests drive the identical plans through file sources
(streaming/windows.py) — source swap is a one-line change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_TOPIC = "uk-retail-raw"          # create_topics.sh:13
PROCESSED_TOPIC = "uk-retail-processed"  # RealTimeAnalytics.java:57


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka") \
            .option("kafka.bootstrap.servers", "x:1") \
            .option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def read_kafka_stream(spark: SparkSession, bootstrap: str,
                      topic: str = RAW_TOPIC,
                      schema: T.StructType | None = None,
                      starting_offsets: str = "earliest") -> DataFrame:
    """S5: subscribe from earliest; S9 deserialization = cast + from_json
    (null on corrupt → route via streaming/pipeline.split_dead_letter)."""
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    value = F.col("value").cast("string")
    if schema is None:
        return df.select(F.col("key").cast("string").alias("key"),
                         value.alias("value"))
    return df.select(F.from_json(value, schema).alias("e")).select("e.*")


def write_kafka_stream(df: DataFrame, bootstrap: str,
                       topic: str = PROCESSED_TOPIC,
                       checkpoint: str = "/tmp/ckpt-kafka",
                       key_col: str = "event_id"):
    """S4/S6: keyed producer, exactly-once-ish via checkpoint + idempotent
    downstream dedup on event_id (A8/T6)."""
    out = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"))
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("kafka.acks", "all")
        .option("checkpointLocation", checkpoint)
    )
