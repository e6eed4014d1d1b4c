"""Streaming journey hops == batch journey hops on finalized days,
and the attribution computed from the streamed hops is bit-identical
to the batch math over the same journeys.

Exclusion contract (the growth_state day-close protocol): the
stream's forward hops all emit immediately; only the '-> NULL'
closure of each user's still-open last day is pending at stream end.
So: streamed hops == batch hops minus the NULL closures of each
user's max active day (when not converted), and attribution over
(streamed hops + those pending closures) == attribution over all
batch hops EXACTLY."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_attribution_matches_batch(spark, sf_dir,
                                             events_stream_dir):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.attribution import (
        CONV_TYPE, attribution_from_hops, journey_hops)
    from ecommerce_analytics_spark.streaming.attribution_state import (
        streaming_journey_hops)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_journey_hops(stream)
    q = (out.writeStream.format("memory").queryName("hops_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM hops_stream")

    events = load_table(spark, sf_dir, "events")

    # expected pending closures: each user's max active day, if that
    # day's journey did not convert
    days = events.select("user_id", F.to_date("ts").alias("day"),
                         "event_type")
    last_day = days.groupBy("user_id").agg(F.max("day").alias("day"))
    conv_days = (days.filter(F.col("event_type") == CONV_TYPE)
                 .select("user_id", "day").distinct())
    pending_keys = last_day.join(conv_days, ["user_id", "day"],
                                 "left_anti")

    batch_hops_full = journey_hops(events)

    # batch twin of the streamed multiset: full hops minus the NULL
    # closures on pending keys. journey_hops doesn't carry keys, so
    # recompute the closure srcs directly: last pre-truncation state
    # of each pending journey.
    from pyspark.sql import Window
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = (events.select("user_id", F.to_date("ts").alias("day"),
                         "event_type", "ts", "event_id")
           .withColumn("rn", F.row_number().over(w)))
    closures = (seq.join(pending_keys, ["user_id", "day"])
                .groupBy("user_id", "day")
                .agg(F.max_by("event_type", "rn").alias("src"))
                .select("user_id",
                        F.date_format("day", "yyyy-MM-dd").alias("day"),
                        "src", F.lit("NULL").alias("dst")))

    # 1) hop multiset parity
    streamed_plus = streamed.select("src", "dst").unionByName(
        closures.select("src", "dst"))
    diff = (streamed_plus.groupBy("src", "dst").count()
            .join(batch_hops_full.groupBy("src", "dst").count()
                  .withColumnRenamed("count", "c2"),
                  ["src", "dst"], "full")
            .filter(F.coalesce("count", F.lit(0))
                    != F.coalesce("c2", F.lit(0))))
    assert diff.count() == 0

    # 2) attribution parity: same math over the two equal multisets
    chan = (events.filter(F.col("event_type") != CONV_TYPE)
            .select(F.col("event_type").alias("c")).distinct())
    a = {r["channel"]: r for r in attribution_from_hops(
        spark, streamed_plus, chan).collect()}
    b = {r["channel"]: r for r in attribution_from_hops(
        spark, batch_hops_full.select("src", "dst"), chan).collect()}
    assert set(a) == set(b)
    for ch in b:
        for col in ("p_conv_full", "p_conv_removed", "removal_effect",
                    "attribution_share"):
            assert a[ch][col] == b[ch][col], (ch, col)  # bit-identical


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
