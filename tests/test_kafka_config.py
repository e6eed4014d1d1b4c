"""Kafka wiring (S4-S6): config builders produce the reference topology
without a broker; availability gate degrades cleanly (no jar in env)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table


def test_kafka_availability_gate(spark):
    from ecommerce_analytics_spark.sources.kafka import kafka_available
    assert kafka_available(spark) is False  # no connector jar in v1 image


def test_kafka_sink_builder_shape(spark, sf_dir):
    from ecommerce_analytics_spark.sources.kafka import write_kafka_stream
    from ecommerce_analytics_spark.streaming.windows import streaming_events
    import os, shutil, tempfile
    d = tempfile.mkdtemp()
    try:
        ev = load_table(spark, sf_dir, "events").limit(10)
        ev.withColumn("ts", F.unix_micros("ts") * 1000) \
            .coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "p"))
        stream = streaming_events(spark, os.path.join(d, "p"))
        writer = write_kafka_stream(stream, "broker:9092",
                                    topic="uk-retail-processed",
                                    checkpoint=os.path.join(d, "ck"))
        # the writer itself needs jar+broker to start; assert the wire
        # shape via the same projection on the batch twin: keyed by
        # event_id, value = full-record JSON (S4/S6 contract)
        assert writer._df.columns == ["key", "value"]
        batch = load_table(spark, sf_dir, "events").limit(5)
        wire = batch.select(
            F.col("event_id").cast("string").alias("key"),
            F.to_json(F.struct(*batch.columns)).alias("value"))
        row = wire.first()
        assert row["key"].isdigit()
        assert '"event_type"' in row["value"]
    finally:
        shutil.rmtree(d, ignore_errors=True)
