"""End-to-end Kafka-topology integration test against the file-backed
broker fake (S4-S6 + P12/P13/P14 + T7): the full reference pipeline
produce → consume → parse → dead-letter split → enrich → keyed sink →
downstream consume (RealTimeAnalytics.java:48-107), with the real
codec/builder code paths from sources/kafka.py — only format("kafka")
is swapped for files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.events_enrichment import (
    risk_expr, segment_expr,
)
from ecommerce_analytics_spark.sources.kafka import (
    PROCESSED_TOPIC, RAW_TOPIC, FileKafkaBroker,
)
from ecommerce_analytics_spark.streaming.pipeline import (
    parse_event_lines, split_dead_letter,
)

PROCESSED_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.StringType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("user_segment", T.StringType()),
    T.StructField("risk_score", T.DoubleType()),
])

N_EVENTS = 300
N_CORRUPT = 3


def test_kafka_fake_end_to_end(spark, sf_dir, tmp_path):
    broker = FileKafkaBroker(str(tmp_path / "broker"))

    # -- produce (event_simulator role): JSON events keyed by event_id
    events = load_table(spark, sf_dir, "events") \
        .orderBy("event_id").limit(N_EVENTS)
    wire_in = events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "user_id", "event_type", "value")
    broker.produce(wire_in, RAW_TOPIC)
    # inject corrupt records (T7: must route to dead letter, not crash)
    corrupt = spark.createDataFrame(
        [("bad", "{not json"), ("bad2", ""), ("bad3", '{"event_id": null}')],
        "key string, value string")
    corrupt.coalesce(1).write.mode("append").json(broker.topic_dir(RAW_TOPIC))

    # -- consume + parse + split + enrich + produce processed
    raw = broker.read_stream(spark, RAW_TOPIC)  # real decode path
    assert raw.isStreaming
    valid, dead = split_dead_letter(parse_event_lines(raw))
    enriched = (valid
                .withColumn("user_segment", segment_expr())
                .withColumn("risk_score", risk_expr()))
    q1 = broker.write_stream(enriched, PROCESSED_TOPIC,
                             checkpoint=str(tmp_path / "ck1")).start()
    q2 = (dead.writeStream.format("json")
          .option("path", broker.topic_dir("dead-letter"))
          .option("checkpointLocation", str(tmp_path / "ck2")).start())
    for q in (q1, q2):
        q.processAllAvailable()
        q.stop()

    # -- downstream consume of the processed topic
    out = broker.read_batch(spark, PROCESSED_TOPIC, PROCESSED_SCHEMA) \
        .toPandas().set_index("event_id")
    assert len(out) == N_EVENTS  # every valid event exactly once
    dead_rows = spark.read.json(broker.topic_dir("dead-letter")).collect()
    assert len(dead_rows) == N_CORRUPT  # corrupt routed, not dropped

    # keyed-producer contract: key == event_id (S4)
    keys = broker.read_batch(spark, PROCESSED_TOPIC).toPandas()
    parsed_keys = sorted(int(k) for k in keys["key"])
    assert parsed_keys == sorted(out.index.tolist())

    # enrichment parity with the batch formulation (P13/P14)
    from ecommerce_analytics_spark.plans.registry import query_map
    batch = (query_map()["segment_and_risk"](spark, sf_dir)
             .filter(F.col("event_id").isin(*out.index.tolist()))
             .toPandas().set_index("event_id"))
    assert len(batch) == N_EVENTS
    for eid, row in batch.iterrows():
        got = out.loc[eid]
        assert got["user_segment"] == row["user_segment"], eid
        assert got["risk_score"] == pytest.approx(row["risk_score"]), eid
        assert got["value"] == pytest.approx(row["value"]), eid


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
