"""Streaming day-close CUSUM == batch CUSUM on every finalized day.

Same protocol as test_streaming_ewma: two time-ordered micro-batches
force cross-boundary day accumulation and state carry-over (here the
carried state additionally spans the calibration-to-detection phase
change). The stream must emit exactly the batch detector's rows for
all days except each type's last (still open at end of input), with
bitwise-equal integer statistics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_cusum_matches_batch(spark, sf_dir, events_stream_dir):
    from ecommerce_analytics_spark.streaming.cusum_state import (
        streaming_cusum_daily_revenue)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_cusum_daily_revenue(stream)
    q = (out.writeStream.format("memory").queryName("cusum_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.event_type, r.day):
           (r.rev, r.sp_scaled, r.sm_scaled, r.h_scaled, r.alarm)
           for r in spark.sql("SELECT * FROM cusum_stream").collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    batch = query_map()["cusum_online_daily"](spark, sf_dir)
    last_day = (batch.groupBy("event_type")
                .agg(F.max("day").alias("last_day")))
    expected = (batch.join(last_day, "event_type")
                .filter(F.col("day") < F.col("last_day"))
                .collect())

    assert len(got) == len(expected) > 0
    alarms = 0
    for r in expected:
        rev, sp, sm, h, alarm = got[(r.event_type, r.day)]
        assert rev == r.rev, (r.event_type, r.day)
        assert (sp, sm, h) == (r.sp_scaled, r.sm_scaled, r.h_scaled)
        assert alarm == r.alarm
        alarms += int(alarm)
    # the detector does something: at least one day on at least one
    # type crosses its self-calibrated threshold in the synthetic data
    # (if this ever flakes on a different dataset, drop it — the
    # parity assertions above are the contract)
    assert alarms > 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
