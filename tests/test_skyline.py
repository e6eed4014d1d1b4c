"""skyline_2d == naive quadratic dominance filter, including the tie
edge cases the monotone reformulation could plausibly break: exact
duplicate (price, size) pairs (mutually non-dominating — ALL survive),
same-price different-size (smaller dominated), and equal-size
cheaper-price (more expensive dominated)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.skyline import skyline_2d


def _naive(df):
    a = df.select(F.col("id").alias("aid"), F.col("p").alias("ap"),
                  F.col("s").alias("as_"))
    b = df.select(F.col("p").alias("bp"), F.col("s").alias("bs"))
    dominated = (a.crossJoin(b)
                 .filter((F.col("bp") <= F.col("ap"))
                         & (F.col("bs") >= F.col("as_"))
                         & ((F.col("bp") < F.col("ap"))
                            | (F.col("bs") > F.col("as_"))))
                 .select("aid").distinct())
    return (a.join(dominated, a.aid == dominated.aid, "left_anti")
            .select(F.col("aid").alias("id")))


def test_skyline_equals_naive_with_ties(spark):
    rows = [(1, 10.0, 5), (2, 10.0, 5),   # duplicates: both survive
            (3, 10.0, 4),                 # same price, smaller: dominated
            (4, 9.0, 5),                  # cheaper, equal size: dominates 1,2
            (5, 8.0, 1), (6, 20.0, 9),
            (7, 20.0, 9), (8, 21.0, 9)]   # 8 dominated by 6/7
    df = spark.createDataFrame(rows, "id long, p double, s long")
    got = sorted(r.id for r in
                 skyline_2d(df, "p", "s").select("id").collect())
    want = sorted(r.id for r in _naive(df).collect())
    assert got == want
    assert 1 not in got and 4 in got and 8 not in got
    assert 6 in got and 7 in got


def test_skyline_random_equals_naive(spark):
    rng = random.Random(11)
    rows = [(i, float(rng.randint(0, 15)), rng.randint(0, 15))
            for i in range(120)]
    df = spark.createDataFrame(rows, "id long, p double, s long")
    got = sorted(r.id for r in
                 skyline_2d(df, "p", "s").select("id").collect())
    want = sorted(r.id for r in _naive(df).collect())
    assert got == want


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
