"""Streaming day-close Holt-Winters == batch HW on every finalized day.

Beyond the ewma/cusum protocol, this twin must also zero-fill calendar
gaps inside keyed state (the batch spine's absent-day zeros), so a
second test feeds a synthetic stream with a multi-day gap spanning the
micro-batch boundary and checks the gap days are finalized with x=0
through the same recurrence."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_streaming_hw_matches_batch(spark, sf_dir, events_stream_dir):
    from ecommerce_analytics_spark.operators.timeseries import (
        HW_PERIOD as BATCH_PERIOD)
    from ecommerce_analytics_spark.streaming.hw_state import (
        HW_PERIOD, streaming_holt_winters_daily_revenue)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    assert HW_PERIOD == BATCH_PERIOD  # single-recurrence contract

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_holt_winters_daily_revenue(stream)
    q = (out.writeStream.format("memory").queryName("hw_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.event_type, r.day):
           (r.rev, r.lvl, r.trend, r.season, r.forecast_next)
           for r in spark.sql("SELECT * FROM hw_stream").collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    batch = query_map()["holt_winters_daily_revenue"](spark, sf_dir)
    last_day = (batch.groupBy("event_type")
                .agg(F.max("day").alias("last_day")))
    expected = (batch.join(last_day, "event_type")
                .filter(F.col("day") < F.col("last_day"))
                .collect())

    assert len(got) == len(expected) > 0
    for r in expected:
        rev, lvl, trend, season, fc = got[(r.event_type, r.day)]
        assert rev == r.rev, (r.event_type, r.day)
        # bitwise: identical closure over identical exact cent sums
        assert (lvl, trend, season, fc) == (
            r.lvl, r.trend, r.season, r.forecast_next), (
            r.event_type, r.day)


def test_streaming_hw_zero_fills_cross_batch_gap(spark, tmp_path):
    """Days 1-9 in batch one, then a 3-day gap, then days 13-14 in
    batch two: the gap days (10, 11, 12) must finalize with x = 0
    through the recurrence — matching a reference run of the shared
    closures over the explicitly zero-filled series."""
    import pandas as pd

    from ecommerce_analytics_spark.streaming.hw_state import (
        HW_PERIOD, make_hw_recurrence,
        streaming_holt_winters_daily_revenue)

    days_a = [f"2024-03-{d:02d}" for d in range(1, 10)]
    days_b = ["2024-03-13", "2024-03-14"]
    indir = tmp_path / "in"
    indir.mkdir()
    for i, days in enumerate((days_a, days_b)):
        rows = [{"event_type": "purchase",
                 "ts": pd.Timestamp(f"{d} 12:00:00"),
                 "value": float(100 + 10 * j), "user_id": 1,
                 "event_id": i * 100 + j, "props": "{}"}
                for j, d in enumerate(days)]
        pd.DataFrame(rows).to_parquet(
            indir / f"part-{i}.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True)

    stream = (spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    out = streaming_holt_winters_daily_revenue(stream)
    q = (out.writeStream.format("memory").queryName("hw_gap")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {r.day: (r.rev, r.lvl, r.trend, r.season)
           for r in spark.sql("SELECT * FROM hw_gap").collect()}

    # referee: the shared recurrence over the explicit dense series
    # (day 14 stays open — never finalized)
    dense = ([10000 + 1000 * j for j in range(9)]   # days 1-9
             + [0, 0, 0]                            # gap days 10-12
             + [10000])                             # day 13 (j=0 of b)
    seed, step = make_hw_recurrence()
    lvl, trend, sarr = seed(dense[:HW_PERIOD])
    want = {}
    all_days = (days_a + ["2024-03-10", "2024-03-11", "2024-03-12"]
                + ["2024-03-13"])
    all_days.sort()
    for t in range(HW_PERIOD, len(dense)):
        x = float(dense[t]) / 100.0
        lvl, trend, sarr, season, fc = step(lvl, trend, sarr, x)
        want[all_days[t]] = (x, lvl, trend, season)

    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d], d
    assert got["2024-03-10"][0] == 0.0  # the gap really was zero-filled


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
