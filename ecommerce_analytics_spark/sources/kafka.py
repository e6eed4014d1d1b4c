"""Kafka source/sink wiring (SURVEY §2.1 S4-S6).

Mirrors the reference topology: raw topic consumed from earliest with
a consumer group (RealTimeAnalytics.java:48-63), processed events
produced keyed by event_id with acks=all durability
(event_simulator.py:115-122, :196-201).

The spark-sql-kafka connector jar is not on the test classpath, so the
physical source/sink is split from the wire-format codec:

* ``decode_kafka_records`` / ``encode_kafka_records`` — the actual
  S5/S9/S4 logic (key/value casts, from_json/to_json) shared by every
  path;
* ``read_kafka_stream`` / ``write_kafka_stream`` — the real connector
  builders (format("kafka")), gated by ``kafka_available``;
* ``FileKafkaBroker`` — an in-process integration fake: each topic is
  a directory of JSON files holding the same (key, value) wire records
  the connector would move, driven through the SAME codec functions.
  The end-to-end test runs produce → readStream → parse → enrich →
  sink → consume against it (tests/test_kafka_fake.py), so the full
  RealTimeAnalytics.java:48-107 pipeline shape executes in-process;
  swapping the fake for the connector changes only the format() call.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RAW_TOPIC = "uk-retail-raw"          # create_topics.sh:13
PROCESSED_TOPIC = "uk-retail-processed"  # RealTimeAnalytics.java:57

# Kafka wire shape after the binary→string cast: what both the real
# connector source and the file fake present to the codec.
WIRE_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("value", T.StringType()),
])


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka") \
            .option("kafka.bootstrap.servers", "x:1") \
            .option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def decode_kafka_records(records: DataFrame,
                         schema: T.StructType | None = None) -> DataFrame:
    """S5/S9 deserialization over (key, value) wire records: cast +
    from_json (null on corrupt → route via streaming/pipeline.
    split_dead_letter). Shared by the connector source and the fake."""
    value = F.col("value").cast("string")
    if schema is None:
        return records.select(F.col("key").cast("string").alias("key"),
                              value.alias("value"))
    return records.select(F.from_json(value, schema).alias("e")).select("e.*")


def encode_kafka_records(df: DataFrame,
                         key_col: str = "event_id") -> DataFrame:
    """S4/S6 producer shape: key = event id, value = row as JSON."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"))


def read_kafka_stream(spark: SparkSession, bootstrap: str,
                      topic: str = RAW_TOPIC,
                      schema: T.StructType | None = None,
                      starting_offsets: str = "earliest") -> DataFrame:
    """S5: subscribe from earliest (RealTimeAnalytics.java:48-63)."""
    df = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_records(df, schema)


def write_kafka_stream(df: DataFrame, bootstrap: str,
                       topic: str = PROCESSED_TOPIC,
                       checkpoint: str = "/tmp/ckpt-kafka",
                       key_col: str = "event_id"):
    """S4/S6: keyed producer, exactly-once-ish via checkpoint + idempotent
    downstream dedup on event_id (A8/T6)."""
    out = encode_kafka_records(df, key_col)
    return (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("kafka.acks", "all")
        .option("checkpointLocation", checkpoint)
    )


class FileKafkaBroker:
    """File-backed Kafka stand-in: topic = directory of JSON files of
    (key, value) records. Streaming reads use Spark's file source
    (new files = new micro-batch input, like new Kafka offsets)."""

    def __init__(self, root: str):
        self.root = root

    def topic_dir(self, topic: str) -> str:
        return os.path.join(self.root, topic)

    def produce(self, df: DataFrame, topic: str,
                key_col: str = "event_id", mode: str = "append") -> None:
        """Batch produce: the event_simulator.py:115-122 role."""
        encode_kafka_records(df, key_col).write.mode(mode) \
            .json(self.topic_dir(topic))

    def read_stream(self, spark: SparkSession, topic: str,
                    schema: T.StructType | None = None) -> DataFrame:
        """Streaming consume — same decode path as read_kafka_stream."""
        records = (spark.readStream.schema(WIRE_SCHEMA)
                   .json(self.topic_dir(topic)))
        return decode_kafka_records(records, schema)

    def read_batch(self, spark: SparkSession, topic: str,
                   schema: T.StructType | None = None) -> DataFrame:
        records = spark.read.schema(WIRE_SCHEMA).json(self.topic_dir(topic))
        return decode_kafka_records(records, schema)

    def write_stream(self, df: DataFrame, topic: str, checkpoint: str,
                     key_col: str = "event_id"):
        """Streaming produce — same encode path as write_kafka_stream."""
        out = encode_kafka_records(df, key_col)
        return (out.writeStream.format("json")
                .option("path", self.topic_dir(topic))
                .option("checkpointLocation", checkpoint))
