"""Streaming day-close EWMA == batch EWMA on every finalized day.

Two time-ordered micro-batches (one file per trigger) force both
state behaviors the processor claims: a day spanning the batch
boundary must keep accumulating (not finalize early), and the
recurrence seed/state must carry across batches. The stream emits
exactly the batch rows for all days except each type's last (still
open at end of input), value-identical (same IEEE recurrence over
the same exact cent sums)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_ewma_matches_batch(spark, sf_dir, events_stream_dir):
    from ecommerce_analytics_spark.streaming.ewma_state import (
        streaming_ewma_daily_revenue)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_ewma_daily_revenue(stream)
    q = (out.writeStream.format("memory").queryName("ewma_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.event_type, r.day): (r.rev, r.ewma) for r in
           spark.sql("SELECT * FROM ewma_stream").collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    batch = query_map()["ewma_daily_revenue"](spark, sf_dir)
    last_day = (batch.groupBy("event_type")
                .agg(F.max("day").alias("last_day")))
    expected = (batch.join(last_day, "event_type")
                .filter(F.col("day") < F.col("last_day"))
                .collect())

    assert len(got) == len(expected) > 0
    for r in expected:
        rev, ewma = got[(r.event_type, r.day)]
        assert rev == r.rev, (r.event_type, r.day)
        assert ewma == r.ewma, (r.event_type, r.day)  # bitwise


def test_streaming_ewma_survives_checkpoint_restart(spark, sf_dir,
                                                    tmp_path):
    """Kill the stream after batch 1, restart from the checkpoint with
    new input present: recovered state (open-day sums + recurrence
    seed) must produce the same finalized rows as an uninterrupted
    run — i.e. batch parity again, through a parquet sink."""
    import os
    import shutil

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.streaming.ewma_state import (
        streaming_ewma_daily_revenue)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    # build the two time-split files but reveal them one at a time
    events = load_table(spark, sf_dir, "events")
    median = events.approxQuantile("event_id", [0.5], 0.0)[0]
    staging = str(tmp_path / "staging")
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    for i, part in enumerate((
            events.filter(F.col("event_id") <= median),
            events.filter(F.col("event_id") > median))):
        part.withColumn("ts", F.unix_micros("ts") * 1000).coalesce(1) \
            .write.mode("overwrite").parquet(f"{staging}/f{i}")
        srcs = [f for f in os.listdir(f"{staging}/f{i}")
                if f.endswith(".parquet")]
        shutil.copy(f"{staging}/f{i}/{srcs[0]}", f"{staging}/part-{i}.parquet")

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = streaming_events(spark, indir)
        q = (streaming_ewma_daily_revenue(stream)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").start())
        q.processAllAvailable()
        q.stop()

    shutil.copy(f"{staging}/part-0.parquet", f"{indir}/part-0.parquet")
    run_once()                       # batch 1 only, then "crash"
    shutil.copy(f"{staging}/part-1.parquet", f"{indir}/part-1.parquet")
    run_once()                       # restart from checkpoint

    got = {(r.event_type, r.day): (r.rev, r.ewma) for r in
           spark.read.schema("event_type string, day string, "
                             "rev double, ewma double")
           .parquet(sink).collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    batch = query_map()["ewma_daily_revenue"](spark, sf_dir)
    last_day = (batch.groupBy("event_type")
                .agg(F.max("day").alias("last_day")))
    expected = (batch.join(last_day, "event_type")
                .filter(F.col("day") < F.col("last_day"))
                .collect())
    assert len(got) == len(expected) > 0
    for r in expected:
        assert got[(r.event_type, r.day)] == (r.rev, r.ewma)


def test_state_store_reader_exposes_open_day_state(spark, sf_dir,
                                                   tmp_path):
    """Operational state inspection (Spark 4 state data source): after
    the EWMA stream drains, format('statestore') over the checkpoint
    must show exactly one open day per event_type — the corpus's last
    day — with cent sums matching an independent batch computation.
    This is how a 100 TB deployment audits keyed state without
    touching the running query."""
    import os
    import shutil

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.numerics import cents
    from ecommerce_analytics_spark.streaming.ewma_state import (
        streaming_ewma_daily_revenue)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    events = load_table(spark, sf_dir, "events")
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    events.withColumn("ts", F.unix_micros("ts") * 1000).coalesce(1) \
        .write.parquet(str(tmp_path / "f0"))
    src = [f for f in os.listdir(tmp_path / "f0")
           if f.endswith(".parquet")][0]
    shutil.copy(str(tmp_path / "f0" / src), f"{indir}/p0.parquet")

    ckpt = str(tmp_path / "ckpt")
    q = (streaming_ewma_daily_revenue(streaming_events(spark, indir))
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "sink"))
         .option("checkpointLocation", ckpt)
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()

    state = {r.key.event_type: r.value.groupState for r in
             spark.read.format("statestore").load(ckpt).collect()}

    last_day = events.agg(
        F.date_format(F.max(F.to_date("ts")), "yyyy-MM-dd")).first()[0]
    expected = {r.event_type: r.c for r in
                (events.filter(F.date_format(F.to_date("ts"),
                                             "yyyy-MM-dd") == last_day)
                 .groupBy("event_type")
                 .agg(F.sum(cents("value")).alias("c")).collect())}

    assert set(state) == set(expected)
    for et, gs in state.items():
        assert gs.open_days == [last_day], et
        assert gs.open_cents == [expected[et]], et
        assert gs.has_ewma


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
