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
