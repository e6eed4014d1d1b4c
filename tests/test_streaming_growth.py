"""Streaming day-close growth marks == batch new/returning split.

The stream (keyed by user) finalizes each user's activity day when a
newer day for that user arrives; its cumulative marks must equal the
batch first-day computation restricted to every user's all-but-last
active day, and aggregating the marks per day must reproduce the
registered q_daily_new_vs_returning counts on that same restriction."""

from __future__ import annotations

import duckdb


def test_streaming_growth_matches_batch(spark, sf_dir,
                                        events_stream_dir):
    from ecommerce_analytics_spark.streaming.growth_state import (
        streaming_new_vs_returning_marks)
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events)

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_new_vs_returning_marks(stream)
    q = (out.writeStream.format("memory").queryName("growth_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id, r.day): r.is_new
           for r in spark.sql("SELECT * FROM growth_stream").collect()}

    want = {(r[0], r[1]): r[2] for r in duckdb.sql(f"""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          FROM '{sf_dir}/events.parquet'
        ), fd AS (
          SELECT user_id, min(day) AS first_day, max(day) AS last_day
          FROM ud GROUP BY user_id
        )
        SELECT u.user_id, strftime(u.day, '%Y-%m-%d'),
               u.day = f.first_day
        FROM ud u JOIN fd f ON f.user_id = u.user_id
        WHERE u.day < f.last_day
    """).fetchall()}

    assert len(got) == len(want) > 0
    assert got == want

    # aggregating the marks reproduces the registered batch counts on
    # the finalized (user, day) restriction
    per_day: dict = {}
    for (_, day), is_new in got.items():
        n_active, n_new = per_day.get(day, (0, 0))
        per_day[day] = (n_active + 1, n_new + (1 if is_new else 0))
    want_day = {r[0]: (r[1], r[2]) for r in duckdb.sql(f"""
        WITH ud AS (
          SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          FROM '{sf_dir}/events.parquet'
        ), fd AS (
          SELECT user_id, min(day) AS first_day, max(day) AS last_day
          FROM ud GROUP BY user_id
        )
        SELECT strftime(u.day, '%Y-%m-%d'), count(*),
               sum(CASE WHEN u.day = f.first_day THEN 1 ELSE 0 END)
        FROM ud u JOIN fd f ON f.user_id = u.user_id
        WHERE u.day < f.last_day
        GROUP BY u.day
    """).fetchall()}
    assert per_day == want_day


def test_streaming_growth_first_day_survives_restarts(spark, tmp_path):
    """A user active on days 1, 3, 5 across three micro-batches must
    mark day 1 new and days 3 (and later 5, were it finalized)
    returning — first_day is sticky in state across batches."""
    import pandas as pd

    from ecommerce_analytics_spark.streaming.growth_state import (
        streaming_new_vs_returning_marks)

    indir = tmp_path / "in"
    indir.mkdir()
    for i, day in enumerate(("2024-03-01", "2024-03-03", "2024-03-05")):
        pd.DataFrame([{"event_id": i, "ts": pd.Timestamp(f"{day} 09:00"),
                       "user_id": 7, "event_type": "view",
                       "value": 1.0, "props": "{}"}]).to_parquet(
            indir / f"part-{i}.parquet", coerce_timestamps="us",
            allow_truncated_timestamps=True)

    stream = (spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
        .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    out = streaming_new_vs_returning_marks(stream)
    q = (out.writeStream.format("memory").queryName("growth_sticky")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    rows = {r.day: r.is_new for r in
            spark.sql("SELECT * FROM growth_sticky").collect()}
    assert rows == {"2024-03-01": True, "2024-03-03": False}


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
