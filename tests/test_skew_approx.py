"""Parity tests for skew-mitigation rewrites and error-bound checks for
the approximate scale-path functions (the documented 100 TB swaps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table


def test_salted_groupby_sum_parity(spark, sf_dir):
    from ecommerce_analytics_spark.operators.skew import salted_groupby_sum
    events = load_table(spark, sf_dir, "events")
    naive = {r["event_type"]: r["s"] for r in
             events.groupBy("event_type")
             .agg(F.round(F.sum("value"), 6).alias("s")).collect()}
    salted = {r["event_type"]: round(r["sum_value"], 6) for r in
              salted_groupby_sum(events, "event_type", "value").collect()}
    assert set(naive) == set(salted)
    for k in naive:
        assert abs(naive[k] - salted[k]) < 1e-4  # float re-association


def test_salted_join_parity(spark, sf_dir):
    from ecommerce_analytics_spark.operators.skew import salted_join
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment")
    naive = events.join(customer, "user_id") \
        .groupBy("c_mktsegment").count().collect()
    salted = salted_join(events, customer, "user_id") \
        .groupBy("c_mktsegment").count().collect()
    assert sorted(map(tuple, naive)) == sorted(map(tuple, salted))


def test_approx_count_distinct_error_bound(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= max(2, 0.06 * row["exact"])


def test_approx_percentile_error_bound(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    row = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact"),
        F.percentile_approx("value", 0.5, 1000).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.05 * max(1.0, row["exact"])

def test_hll_sketch_mergeability_exact(spark, sf_dir):
    """Union of per-day sketches must equal the one-shot sketch estimate
    EXACTLY — same algorithm over the same values; this is the property
    that makes stored daily sketches re-aggregable at any grain."""
    from ecommerce_analytics_spark.operators.sketches import (
        HLL_LGK, daily_user_sketches)
    events = load_table(spark, sf_dir, "events")
    merged = (daily_user_sketches(spark, sf_dir)
              .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch"))
                   .alias("est")).collect()[0]["est"])
    one_shot = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)))
        .alias("est")).collect()[0]["est"]
    assert merged == one_shot


def test_hll_sketch_accuracy(spark, sf_dir):
    """Every per-day estimate within 5% of exact (lgK=12 ≈ 1.6% RSE)."""
    from ecommerce_analytics_spark.operators.sketches import (
        daily_user_sketches)
    events = load_table(spark, sf_dir, "events")
    est = {r["day"]: r["est"] for r in
           daily_user_sketches(spark, sf_dir)
           .select("day", F.hll_sketch_estimate("sketch").alias("est"))
           .collect()}
    exact = {r["day"]: r["exact"] for r in
             events.groupBy(F.to_date("ts").alias("day"))
             .agg(F.countDistinct("user_id").alias("exact")).collect()}
    assert set(est) == set(exact)
    for day, ex in exact.items():
        assert abs(est[day] - ex) <= max(2, 0.05 * ex), (day, est[day], ex)


def test_hll_query_runs_and_total_row(spark, sf_dir):
    from ecommerce_analytics_spark.operators.sketches import (
        q_daily_unique_users_hll,
    )
    rows = q_daily_unique_users_hll(spark, sf_dir).collect()
    total = [r for r in rows if r["day"] is None]
    assert len(total) == 1
    days = [r for r in rows if r["day"] is not None]
    assert len(days) >= 1
    # global estimate can't be below the largest single day
    assert total[0]["est_unique_users"] >= max(
        r["est_unique_users"] for r in days)


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
