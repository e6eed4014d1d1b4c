"""T3 replay-with-compression semantics and S7/T6 foreachBatch sink
with checkpoint-backed exactly-once recovery."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_compress_timeline(spark, sf_dir):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.streaming.replay import (
        compress_timeline, replay_stats)
    events = load_table(spark, sf_dir, "events")
    factor = 1000
    replayed = compress_timeline(events, factor,
                                 start_at="2025-01-01T00:00:00")
    agg = replayed.agg(
        F.min("replay_ts").alias("r0"), F.max("replay_ts").alias("r1"),
        F.min("ts").alias("t0"), F.max("ts").alias("t1")).collect()[0]
    real_span = (agg["t1"] - agg["t0"]).total_seconds()
    replay_span = (agg["r1"] - agg["r0"]).total_seconds()
    assert abs(replay_span - real_span / factor) < 1.0
    assert str(agg["r0"]).startswith("2025-01-01")
    # simulation struct matches the reference schema (§1.3)
    sim = replayed.select("simulation.*").first()
    assert sim["compression_factor"] == factor
    assert sim["original_timestamp"] < "2025"  # ISO strings, 2024 data
    # ordering preserved: replay_ts is monotone in ts
    inversions = (
        compress_timeline(events, factor)
        .select("ts", "replay_ts")
        .join(compress_timeline(events, factor)
              .select(F.col("ts").alias("ts2"),
                      F.col("replay_ts").alias("replay_ts2")),
              F.col("ts") < F.col("ts2"))
        .filter(F.col("replay_ts") > F.col("replay_ts2")).count())
    assert inversions == 0


def test_replay_stats(spark, sf_dir):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.streaming.replay import replay_stats
    events = load_table(spark, sf_dir, "events")
    row = replay_stats(events, 1000).collect()[0]
    assert row["n_events"] == events.count()
    assert abs(row["compressed_seconds"] * 1000 - row["span_seconds"]) < 1.0
    assert row["events_per_second"] > 0


def test_foreach_batch_sink_with_checkpoint(spark, sf_dir, tmp_path):
    """S7: per-batch sink writes with a server-side stored_at column;
    T6: restarting from the checkpoint does not re-deliver processed
    batches (no duplicate rows in the sink)."""
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.streaming.windows import streaming_events
    src = str(tmp_path / "src")
    os.makedirs(src)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events").limit(200)
    events.withColumn("ts", F.unix_micros("ts") * 1000) \
        .coalesce(1).write.mode("append").parquet(src)

    def sink(batch_df, epoch_id):
        (batch_df
         .withColumn("stored_at", F.current_timestamp())
         .withColumn("epoch", F.lit(epoch_id))
         .write.mode("append").parquet(out))

    def run_once():
        q = (streaming_events(spark, src).writeStream
             .foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .start())
        q.processAllAvailable()
        q.stop()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == 200
    run_once()  # restart from checkpoint: nothing new → no duplicates
    assert spark.read.parquet(out).count() == n1
    assert spark.read.parquet(out).filter(
        F.col("stored_at").isNull()).count() == 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
