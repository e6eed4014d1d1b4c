"""Banded interval join == naive inequality join, including the edge
cases banding could plausibly break: intervals spanning many buckets,
exact boundary touches (strict overlap excludes them), and
zero-length intervals."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.intervals import (
    overlap_join_banded,
)

BUCKET = 100


def _naive(a, b):
    return (a.crossJoin(b)
            .filter((F.col("s") < F.col("pe")) & (F.col("ps") < F.col("e")))
            .select("aid", "bid"))


def test_banded_equals_naive_with_edge_cases(spark):
    a = spark.createDataFrame(
        [(1, 0, 50),        # inside one bucket
         (2, 90, 110),      # straddles a bucket boundary
         (3, 0, 1000),      # spans 10 buckets
         (4, 200, 200),     # zero-length
         (5, 300, 400)],    # ends exactly where promo 3 starts
        "aid long, s long, e long")
    b = spark.createDataFrame(
        [(1, 40, 60),
         (2, 100, 105),
         (3, 400, 500),     # touches interval 5 at 400 — NOT overlap
         (4, 150, 250),     # covers the zero-length point 200
         (5, 995, 1100)],   # overlaps only the long interval
        "bid long, ps long, pe long")
    got = sorted(
        overlap_join_banded(a, b, "s", "e", "ps", "pe", BUCKET)
        .select("aid", "bid").rdd.map(tuple).collect())
    want = sorted(_naive(a, b).rdd.map(tuple).collect())
    assert got == want
    # strictness spot-checks: the 400-touch is out, the zero-length
    # point inside (150,250) is in
    assert (5, 3) not in got
    assert (4, 4) in got
    assert (3, 5) in got


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
