"""Invariant tests for the non-SQL-expressible ML surfaces (SURVEY
§5.3): deterministic seeds, sane shapes, repartition stability. These
raw outputs are pytest-only; the registry exposes their oracle-green
companions (rfm_kmeans_quality, als_recommendations_shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.plans.registry import query_map


def test_kmeans_segments_shape_and_determinism(spark, sf_dir):
    from ecommerce_analytics_spark.ml.segmentation import (
        q_rfm_kmeans_segments as q,
    )
    a = q(spark, sf_dir).collect()
    n_customers = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_custkey").distinct().count()
    assert len(a) == n_customers
    segs = {r["segment"] for r in a}
    assert segs <= {0, 1, 2, 3} and len(segs) >= 2
    b = q(spark, sf_dir).collect()  # fixed seed → stable assignment
    assert {r["customer_id"]: r["segment"] for r in a} \
        == {r["customer_id"]: r["segment"] for r in b}


def test_als_recommendations_shape(spark, sf_dir):
    from ecommerce_analytics_spark.ml.recommend import q_als_recommendations
    recs = q_als_recommendations(spark, sf_dir)
    per_user = recs.groupBy("customer_id").count().collect()
    assert per_user and all(r["count"] == 5 for r in per_user)
    assert recs.filter(F.col("score").isNull()).count() == 0


def test_recommendations_nested_matches_flat(spark, sf_dir):
    from ecommerce_analytics_spark.operators.joins import (
        recommendations_nested_df,
    )
    flat = query_map()["product_recommendations"](spark, sf_dir)
    nested = recommendations_nested_df(spark, sf_dir)
    n_flat = flat.count()
    exploded = nested.select(
        "product_id", F.explode("recommendations").alias("r"))
    assert exploded.count() == n_flat
    # element order inside the array is (rank asc) == (score desc, id)
    first = nested.select(
        "product_id",
        F.col("recommendations")[0]["similarity_score"].alias("top_score"),
        F.col("recommendations")[F.size("recommendations") - 1]
        ["similarity_score"].alias("last_score"),
    ).filter(F.size("recommendations") >= 2)
    assert first.filter(F.col("top_score") < F.col("last_score")).count() == 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
