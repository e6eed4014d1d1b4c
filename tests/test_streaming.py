"""Streaming parity tests (SURVEY §5.2.4): the same input through the
batch formulation and the Structured Streaming formulation must agree.
File-source micro-batches only — no broker needed."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


# events_stream_dir fixture lives in conftest.py (shared with
# test_streaming_funnel.py)


def _run_to_memory(df, name, output_mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).start())
    q.processAllAvailable()
    q.stop()


def test_streaming_hourly_revenue_matches_batch(spark, sf_dir,
                                                events_stream_dir):
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events, streaming_hourly_revenue)
    stream = streaming_events(spark, events_stream_dir)
    agg = streaming_hourly_revenue(stream)
    _run_to_memory(agg, "hourly_stream", "complete")
    got = {r["hour_timestamp"]: r for r in
           spark.sql("SELECT * FROM hourly_stream").collect()}

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.aggregates import (
        hourly_revenue_frame)
    from ecommerce_analytics_spark.plans.registry import query_map
    expected = {r["hour_timestamp"]: r for r in
                query_map()["hourly_revenue"](spark, sf_dir).collect()}
    # batch side of the shared builder in hll mode — the streaming agg
    # is the SAME estimate expression, so equality must be EXACT
    hll_mode = {r["hour_timestamp"]: r["unique_customers"] for r in
                hourly_revenue_frame(load_table(spark, sf_dir, "events"),
                                     distinct="hll").collect()}

    assert set(got) == set(expected)
    for hour, exp in expected.items():
        g = got[hour]
        assert g["total_revenue"] == pytest.approx(exp["total_revenue"])
        assert g["order_count"] == exp["order_count"]
        # streaming == batch-hll exactly (same sketch, same rows)
        assert g["unique_customers"] == hll_mode[hour]
        # and the estimate stays near the exact batch mode (T5/A6)
        assert abs(g["unique_customers"] - exp["unique_customers"]) \
            <= max(2, 0.1 * exp["unique_customers"])


def test_streaming_ltv_matches_batch_window(spark, sf_dir,
                                            events_stream_dir):
    from ecommerce_analytics_spark.streaming.ltv_state import streaming_ltv
    from ecommerce_analytics_spark.streaming.windows import streaming_events
    # one file per trigger → state must carry across micro-batches
    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_ltv(stream)
    _run_to_memory(out, "ltv_stream", "append")
    got = {r["event_id"]: r["customer_ltv"] for r in
           spark.sql("SELECT * FROM ltv_stream").collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    batch = query_map()["ltv_running"](spark, sf_dir).collect()
    assert len(got) == len(batch)
    # input files are event-time ordered, so arrival order == event order
    # and the stateful stream must reproduce the batch window exactly
    for row in batch:
        assert got[row["event_id"]] == pytest.approx(row["customer_ltv"]), \
            f"event {row['event_id']}"


def test_streaming_ltv_tws_matches_batch(spark, sf_dir, events_stream_dir):
    """Same parity on the Spark 4 transformWithStateInPandas API."""
    from ecommerce_analytics_spark.streaming.ltv_tws import (
        streaming_ltv_tws, tws_available)
    if not tws_available():
        pytest.skip("transformWithState needs google.protobuf "
                    "(not in the v1 image); applyInPandasWithState "
                    "parity covers T2")
    from ecommerce_analytics_spark.streaming.windows import streaming_events
    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_ltv_tws(stream)
    _run_to_memory(out, "ltv_tws_stream", "append")
    got = {r["event_id"]: r["customer_ltv"] for r in
           spark.sql("SELECT * FROM ltv_tws_stream").collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    batch = query_map()["ltv_running"](spark, sf_dir).collect()
    assert len(got) == len(batch)
    for row in batch:
        assert got[row["event_id"]] == pytest.approx(row["customer_ltv"]), \
            f"event {row['event_id']}"


def test_streaming_dedup(spark, events_stream_dir, tmp_path):
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_dedup, streaming_events)
    # duplicate every file → dedup must halve the count
    dup_dir = str(tmp_path / "dup")
    os.makedirs(dup_dir)
    for f in os.listdir(events_stream_dir):
        shutil.copy(f"{events_stream_dir}/{f}", f"{dup_dir}/{f}")
        shutil.copy(f"{events_stream_dir}/{f}", f"{dup_dir}/copy_{f}")
    stream = streaming_events(spark, dup_dir)
    deduped = streaming_dedup(stream)
    _run_to_memory(deduped.select("event_id"), "dedup_stream", "append")
    n = spark.sql("SELECT count(*) AS n FROM dedup_stream").collect()[0]["n"]
    n_distinct = spark.sql(
        "SELECT count(DISTINCT event_id) AS n FROM dedup_stream"
    ).collect()[0]["n"]
    assert n == n_distinct  # idempotent
    raw = streaming_events(spark, dup_dir)
    _run_to_memory(raw.select("event_id"), "raw_stream", "append")
    n_raw = spark.sql("SELECT count(*) AS n FROM raw_stream").collect()[0]["n"]
    assert n_raw == 2 * n


def test_streaming_session_window_matches_batch(spark, sf_dir,
                                                events_stream_dir):
    """Watermarked streaming session_window == the batch native
    sessionize (which itself oracle-matches the lag+cumsum SQL)."""
    from ecommerce_analytics_spark.streaming.windows import streaming_events
    stream = streaming_events(spark, events_stream_dir)
    agg = (
        stream
        .withWatermark("ts", "1 hour")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"),
             F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events", "total_value")
    )
    q = (agg.writeStream.format("memory").queryName("sess_stream")
         .outputMode("complete").start())
    q.processAllAvailable()
    q.stop()
    got = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                r["total_value"])
           for r in spark.sql("SELECT * FROM sess_stream").collect()}
    from ecommerce_analytics_spark.plans.registry import query_map
    batch = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                  r["total_value"])
             for r in query_map()["sessionize_native"](spark, sf_dir)
             .collect()}
    assert got == batch


def test_corrupt_record_routing(spark, tmp_path):
    from ecommerce_analytics_spark.streaming.pipeline import (
        parse_event_lines, split_dead_letter)
    lines_dir = str(tmp_path / "lines")
    os.makedirs(lines_dir)
    with open(f"{lines_dir}/events.jsonl", "w") as f:
        f.write('{"event_id": 1, "ts": "2024-01-01T00:00:00", '
                '"user_id": 7, "event_type": "purchase", "value": 10.5}\n')
        f.write("this is not json\n")
        f.write('{"event_id": 2, "ts": "2024-01-01T01:00:00", '
                '"user_id": 8, "event_type": "view", "value": 1.0}\n')
        f.write('{"broken": true}\n')
    lines = spark.readStream.format("text").load(lines_dir)
    valid, dead = split_dead_letter(parse_event_lines(lines))
    _run_to_memory(valid, "valid_stream", "append")
    _run_to_memory(dead, "dead_stream", "append")
    v = spark.sql("SELECT * FROM valid_stream ORDER BY event_id").collect()
    d = spark.sql("SELECT * FROM dead_stream").collect()
    assert [r["event_id"] for r in v] == [1, 2]
    assert v[0]["value"] == 10.5
    assert len(d) == 2  # the non-JSON line and the schema-miss line


def test_streaming_sliding_revenue_matches_batch(spark, sf_dir,
                                                 events_stream_dir):
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events, streaming_sliding_revenue)
    stream = streaming_events(spark, events_stream_dir)
    agg = streaming_sliding_revenue(stream)
    _run_to_memory(agg, "sliding_stream", "complete")
    got = {r["window_start"]: r for r in
           spark.sql("SELECT * FROM sliding_stream").collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    expected = {r["window_start"]: r for r in
                query_map()["sliding_window_revenue"](spark, sf_dir).collect()}

    assert set(got) == set(expected)
    for w, exp in expected.items():
        g = got[w]
        assert g["revenue"] == pytest.approx(exp["revenue"])
        assert g["n_events"] == exp["n_events"]
        assert abs(g["unique_users"] - exp["unique_users"]) \
            <= max(2, 0.1 * exp["unique_users"])


def test_stream_stream_interval_join_matches_batch(spark, sf_dir,
                                                   events_stream_dir):
    """The stream-stream interval join must produce exactly the pairs
    the batch range join aggregates (post_purchase_attribution's
    oracle certifies those semantics)."""
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events, streaming_purchase_attribution_join)
    joined = streaming_purchase_attribution_join(
        streaming_events(spark, events_stream_dir),
        streaming_events(spark, events_stream_dir))
    _run_to_memory(joined, "ss_join", "append")
    got = (spark.sql("SELECT p_event_id, count(*) AS n, "
                     "count(DISTINCT event_type) AS nt, "
                     "round(sum(value), 2) AS v "
                     "FROM ss_join GROUP BY p_event_id"))
    got_rows = {r["p_event_id"]: r for r in got.collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    exp_rows = {r["purchase_event_id"]: r for r in
                query_map()["post_purchase_attribution"](
                    spark, sf_dir).collect()}
    assert set(got_rows) == set(exp_rows)
    for k, exp in exp_rows.items():
        g = got_rows[k]
        assert g["n"] == exp["n_follow_events"]
        assert g["nt"] == exp["n_event_types"]
        assert g["v"] == pytest.approx(exp["follow_value"])


def test_streaming_histogram_sketch_matches_batch(spark, sf_dir,
                                                  events_stream_dir):
    """The mergeable histogram-quantile sketch's streaming twin: per-day
    bin counts maintained as a streaming aggregation equal the batch
    sketch state — and since estimates are a pure function of bin
    state, estimate parity follows."""
    from ecommerce_analytics_spark.operators.quantiles import _bin_col
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events)

    stream = streaming_events(spark, events_stream_dir)
    agg = (stream
           .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                    _bin_col().alias("bin"))
           .agg(F.count(F.lit(1)).alias("n")))
    _run_to_memory(agg, "hist_stream", "complete")
    got = {(r["day"], r["bin"]): r["n"]
           for r in spark.sql("SELECT * FROM hist_stream").collect()}

    from ecommerce_analytics_spark.io import load_table
    batch = (load_table(spark, sf_dir, "events")
             .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"),
                      _bin_col().alias("bin"))
             .agg(F.count(F.lit(1)).alias("n")))
    want = {(r["day"], r["bin"]): r["n"] for r in batch.collect()}
    assert got == want and len(want) > 0


def test_streaming_cms_matches_batch(spark, sf_dir, events_stream_dir):
    """Count-min sketch state is a plain (row, bucket) aggregation, so
    its streaming twin — the same groupBy over micro-batches — must
    equal the batch sketch cell-for-cell. With the state equal, every
    point estimate (min over rows) is equal too: the mergeability
    argument the 100 TB sketch store rests on."""
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.sketches import cms_cells
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events)

    key = "CAST(user_id AS STRING)"
    stream_cells = cms_cells(streaming_events(spark, events_stream_dir),
                             key)
    _run_to_memory(stream_cells, "cms_stream", "complete")
    got = {(r["row_id"], r["bucket"]): r["total"]
           for r in spark.sql("SELECT * FROM cms_stream").collect()}
    want = {(r["row_id"], r["bucket"]): r["total"]
            for r in cms_cells(load_table(spark, sf_dir, "events"),
                               key).collect()}
    assert got == want and len(want) > 0


def test_stream_stream_left_outer_join_null_completion(
        spark, sf_dir, events_stream_dir):
    """Watermarked LEFT OUTER stream-stream join: purchases with no
    follow-up event in their hour emit null-matched rows after the
    watermark passes their join window. Purchases too close to the end
    of the finite stream (watermark never passes them) are excluded
    from the comparison — that withholding IS the documented
    semantics, not a defect."""
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events, streaming_purchase_attribution_join)

    wm_hours = 2
    joined = streaming_purchase_attribution_join(
        streaming_events(spark, events_stream_dir),
        streaming_events(spark, events_stream_dir),
        watermark=f"{wm_hours} hours", how="left_outer")
    _run_to_memory(joined, "ss_left_join", "append")
    got_unmatched = {
        r["p_event_id"] for r in spark.sql(
            "SELECT p_event_id FROM ss_left_join "
            "WHERE event_id IS NULL").collect()}

    events = load_table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).first()[0]
    import datetime
    emit_horizon = (max_ts - datetime.timedelta(hours=wm_hours + 1))
    purchases = events.filter(F.col("event_type") == "purchase")
    e2 = events.alias("e2")
    want_unmatched = {
        r["event_id"] for r in
        purchases.alias("p").join(
            e2, F.expr("e2.user_id = p.user_id AND e2.ts > p.ts "
                       "AND e2.ts <= p.ts + INTERVAL 1 HOUR"),
            "left_anti")
        .filter(F.col("ts") <= F.lit(emit_horizon))
        .select("event_id").collect()}
    # every provably-emitted unmatched purchase appears exactly once,
    # and nothing unmatched appears that the batch anti-join rejects
    assert want_unmatched and want_unmatched <= got_unmatched
    batch_all_unmatched = {
        r["event_id"] for r in
        purchases.alias("p").join(
            e2, F.expr("e2.user_id = p.user_id AND e2.ts > p.ts "
                       "AND e2.ts <= p.ts + INTERVAL 1 HOUR"),
            "left_anti").select("event_id").collect()}
    assert got_unmatched <= batch_all_unmatched


def test_stream_static_broadcast_enrichment_matches_batch(
        spark, sf_dir, events_stream_dir):
    """J3 streaming form: micro-batched events joined against STATIC
    broadcast dims must equal the certified batch enrichment
    row-for-row."""
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_enrich_with_dims, streaming_events)

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    out = streaming_enrich_with_dims(
        stream,
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"))
    _run_to_memory(out, "enrich_stream", "append")
    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM enrich_stream").collect()))

    from ecommerce_analytics_spark.plans.registry import query_map
    want = sorted(map(tuple, query_map()[
        "enrich_events_with_customer"](spark, sf_dir).collect()))
    assert got == want and len(got) > 0


def test_watermark_drops_late_rows_and_reports_them(spark, tmp_path):
    """T5 semantics made observable: a late row arriving AFTER its
    window's state has been evicted (watermark passed the window end
    in an earlier batch) is dropped — counted in the state-operator
    metrics and NOT re-emitted — while a late-but-pre-eviction row is
    still folded in (the watermark is a bound, not an exact cut).
    The reference (processing-time only) has neither behavior."""
    import datetime as dt
    import os
    import shutil
    import time

    from ecommerce_analytics_spark.streaming.windows import (
        streaming_hourly_revenue)

    def T(h, m):
        return dt.datetime(2024, 1, 1, h, m)

    staging = str(tmp_path / "staging")
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    batches = [
        # batch 0: window 00:00 opens; far-ahead row advances the
        # watermark to 07:59 once the batch completes
        [(T(0, 10), "u1", "purchase", 10.0),
         (T(9, 59), "u2", "purchase", 99.0)],
        # batch 1: late row while 00:00 state is evicted THIS batch —
        # folded in (pre-eviction), window emitted as 110
        [(T(0, 20), "u3", "purchase", 100.0),
         (T(10, 30), "u4", "purchase", 7.0)],
        # batch 2: late row AFTER eviction — must be dropped
        [(T(0, 40), "u5", "purchase", 1000.0),
         (T(11, 30), "u6", "purchase", 1.0)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "ts timestamp, user_id string, event_type string, "
                  "value double")
        df.coalesce(1).write.mode("overwrite").parquet(f"{staging}/f{i}")
        src = [f for f in os.listdir(f"{staging}/f{i}")
               if f.endswith(".parquet")][0]
        shutil.copy(f"{staging}/f{i}/{src}", f"{indir}/part-{i}.parquet")
        time.sleep(1.1)  # distinct mtimes fix the trigger order

    stream = (spark.readStream
              .schema("ts timestamp, user_id string, event_type string, "
                      "value double")
              .option("maxFilesPerTrigger", 1).parquet(indir))
    q = (streaming_hourly_revenue(stream)
         .writeStream.format("memory").queryName("wm_drop_stream")
         .outputMode("append").start())
    q.processAllAvailable()
    dropped = sum(op["numRowsDroppedByWatermark"]
                  for p in q.recentProgress
                  for op in p["stateOperators"])
    q.stop()

    emitted = spark.sql("SELECT * FROM wm_drop_stream").collect()
    zero_hour = [r for r in emitted if r.hour_timestamp == T(0, 0)]
    assert len(zero_hour) == 1            # never re-emitted
    assert zero_hour[0].total_revenue == 110.0   # 1000.0 dropped
    assert dropped >= 1


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
