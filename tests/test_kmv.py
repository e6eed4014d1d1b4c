"""KMV bottom-k sketch properties beyond the oracle differential
(test_oracle.py covers both registered queries vs DuckDB):

* mergeability / partition invariance — the sketch is a pure function
  of the input SET, so any partitioning and any pre-merge grouping
  yields the identical minima array;
* exact-small-set path — groups under K distinct values estimate
  exactly;
* estimator accuracy — the emitted within-tolerance booleans hold on
  the real corpus (deterministically: same hashes every run).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.kmv import (
    KMV_K, kmv_hash, kmv_minima, q_kmv_customer_yoy_algebra,
    q_kmv_shipped_orders_by_year,
)


def _hashed(spark, n, key="k"):
    return (spark.range(n)
            .select((F.col("id") % 3).alias(key),
                    kmv_hash("id").alias("h")))


def test_partition_invariance(spark):
    base = _hashed(spark, 5000)
    one = kmv_minima(base.repartition(1), ["k"]).orderBy("k").collect()
    many = kmv_minima(base.repartition(13), ["k"]).orderBy("k").collect()
    assert [r.asDict() for r in one] == [r.asDict() for r in many]


def test_merge_of_partials_equals_direct(spark):
    """Merging per-subgroup sketches == sketching the whole group:
    the stored-sketch rollup contract."""
    base = _hashed(spark, 5000)
    direct = kmv_minima(base.select("h"), []).collect()[0]["mins"]
    per_key = kmv_minima(base, ["k"])
    merged = kmv_minima(
        per_key.select(F.explode("mins").alias("h")), []).collect()[0]["mins"]
    assert merged == direct
    assert len(direct) == KMV_K


def test_small_group_is_exact(spark):
    base = _hashed(spark, 50)  # far below K distinct ids
    mins = kmv_minima(base.select("h"), []).collect()[0]["mins"]
    assert len(mins) == 50
    assert mins == sorted(mins)


def test_registered_estimates_within_tol(spark, sf_dir):
    yearly = q_kmv_shipped_orders_by_year(spark, sf_dir).collect()
    assert yearly and all(r["est_within_tol"] for r in yearly)
    # sf0.001 lineitem already has >K distinct orders per ship year,
    # so the (k-1)M/h_k estimator path (not the exact path) is live
    assert any(r["n_mins"] == KMV_K for r in yearly)

    alg = q_kmv_customer_yoy_algebra(spark, sf_dir).collect()
    assert len(alg) == 1
    r = alg[0]
    assert r["union_within_tol"] and r["inter_within_tol"]
    assert r["exact_union"] >= r["exact_inter"] >= 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
