"""Streaming funnel/cohort twins: cross-batch parity vs the batch
formulations (VERDICT r3 #5). Same harness as the LTV/quantile-sketch
parity tests — two time-ordered micro-batches from the shared
events_stream_dir fixture, memory sink, row-for-row comparison."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run_to_memory(df, name, output_mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).start())
    q.processAllAvailable()
    q.stop()


def test_streaming_funnel_matches_batch(spark, sf_dir, events_stream_dir):
    """Per-user (t1, t2, t3) from the keyed-state processor after both
    micro-batches == the batch conditional-min formulation, and the
    derived global funnel row == q_conversion_funnel."""
    from pyspark.sql import Window

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.streaming.funnel_state import (
        FUNNEL_STEPS, streaming_funnel)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    _run_to_memory(streaming_funnel(stream), "funnel_stream", "append")

    # latest emitted state per user (cross-batch carry-over: users in
    # both batches emit twice; n_seen is cumulative so max wins)
    got = {}
    for r in spark.sql("SELECT * FROM funnel_stream").collect():
        prev = got.get(r["user_id"])
        if prev is None or r["n_seen"] > prev["n_seen"]:
            got[r["user_id"]] = r
    assert len(got) > 0

    # batch ground truth: the same stacked conditional-min windows as
    # q_conversion_funnel's per_user stage
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    stepped = (
        events
        .withColumn("t1", F.min(F.when(
            F.col("event_type") == FUNNEL_STEPS[0], F.col("ts"))).over(w))
        .withColumn("t2", F.min(F.when(
            (F.col("event_type") == FUNNEL_STEPS[1])
            & (F.col("ts") > F.col("t1")), F.col("ts"))).over(w))
        .withColumn("t3", F.min(F.when(
            (F.col("event_type") == FUNNEL_STEPS[2])
            & (F.col("ts") > F.col("t2")), F.col("ts"))).over(w))
    )
    expected = {
        r["user_id"]: r
        for r in (stepped.groupBy("user_id")
                  .agg(F.unix_micros(F.first("t1")).alias("t1_us"),
                       F.unix_micros(F.first("t2")).alias("t2_us"),
                       F.unix_micros(F.first("t3")).alias("t3_us"))
                  .collect())
    }
    assert set(got) == set(expected)
    for uid, exp in expected.items():
        g = got[uid]
        assert (g["t1_us"], g["t2_us"], g["t3_us"]) == \
            (exp["t1_us"], exp["t2_us"], exp["t3_us"]), uid

    # the materialized-view read path: aggregate the latest states
    # into the single funnel row and compare against the batch query
    n_users = len(got)
    n1 = sum(1 for r in got.values() if r["t1_us"] is not None)
    n2 = sum(1 for r in got.values() if r["t2_us"] is not None)
    n3 = sum(1 for r in got.values() if r["t3_us"] is not None)
    batch_row = query_map()["conversion_funnel"](spark, sf_dir).first()
    assert (n_users, n1, n2, n3) == (
        batch_row["n_users"], batch_row["n_view"],
        batch_row["n_view_click"], batch_row["n_view_click_purchase"])


def test_streaming_cohort_pairs_match_batch(spark, sf_dir,
                                            events_stream_dir):
    """Emitted (user, cohort_week, active_week) pairs across both
    micro-batches == the batch distinct-pairs table (each pair emitted
    exactly once), and the triangle aggregated from them ==
    q_weekly_cohort_retention."""
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.streaming.funnel_state import (
        streaming_cohort_pairs)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    _run_to_memory(streaming_cohort_pairs(stream), "cohort_stream",
                   "append")
    emitted = spark.sql("SELECT * FROM cohort_stream").collect()
    got_pairs = {(r["user_id"], r["cohort_week"], r["active_week"])
                 for r in emitted}
    assert len(emitted) == len(got_pairs), "duplicate pair emitted"

    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    base = (events
            .select("user_id",
                    F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
                    .alias("active_week"))
            .withColumn("cohort_week", F.min("active_week").over(w)))
    want_pairs = {(r["user_id"], r["cohort_week"], r["active_week"])
                  for r in base.distinct().collect()}
    assert got_pairs == want_pairs

    # triangle parity: aggregate the emitted pairs with the batch
    # query's expressions and compare full rows
    pairs_df = spark.createDataFrame(
        [(u, c, a) for (u, c, a) in got_pairs],
        "user_id long, cohort_week string, active_week string")
    from pyspark.sql import Window as W2
    wc = W2.partitionBy("cohort_week")
    sized = pairs_df.withColumn(
        "cohort_size",
        F.count(F.when(F.col("active_week") == F.col("cohort_week"),
                       F.lit(1))).over(wc))
    triangle = {
        (r["cohort_week"], r["week_offset"]): (r["n_active"], r["retention"])
        for r in (sized.groupBy(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int")
            .alias("week_offset"))
            .agg(F.count(F.lit(1)).alias("n_active"),
                 F.round(F.count(F.lit(1)).cast("double")
                         / F.any_value("cohort_size"), 6)
                 .alias("retention"))
            .collect())
    }
    want_triangle = {
        (r["cohort_week"], r["week_offset"]): (r["n_active"], r["retention"])
        for r in query_map()["weekly_cohort_retention"](
            spark, sf_dir).collect()
    }
    assert triangle == want_triangle and len(triangle) > 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
