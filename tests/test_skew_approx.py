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