"""Two-phase salted A-ES top-K == single-phase window ranking, and
small-group edge (group smaller than K returns all its rows, ranked)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.weighted_sample import (
    _KEY_SQL, weighted_sample_per_group,
)

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


def _single_phase(df, group_col, k):
    w = (Window.partitionBy(group_col)
         .orderBy(F.desc("_key"), "doc_id"))
    return (df.withColumn("_key", F.expr(_KEY_SQL))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .drop("_key"))


def test_two_phase_equals_single_phase(spark):
    rng = random.Random(3)
    rows = [(f"d{i:04d}", rng.choice(["en", "es", "zh"]),
             rng.randint(1, 5000)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, n_chars int")
    k = 12
    got = sorted(map(tuple,
                     weighted_sample_per_group(df, "lang", k=k, salts=16)
                     .select("lang", "doc_id", "rk").collect()))
    want = sorted(map(tuple,
                      _single_phase(df, "lang", k)
                      .select("lang", "doc_id", "rk").collect()))
    assert got == want
    assert len(got) == 3 * k


def test_group_smaller_than_k_returns_all(spark):
    df = spark.createDataFrame(
        [("a", "tiny", 10), ("b", "tiny", 20), ("c", "big", 30)],
        "doc_id string, lang string, n_chars int")
    out = weighted_sample_per_group(df, "lang", k=5, salts=4)
    by_lang = {r.lang: r for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["tiny"].n == 2 and by_lang["big"].n == 1
    # ranks are dense 1..n within each group
    ranks = sorted(r.rk for r in out.filter(F.col("lang") == "tiny")
                   .collect())
    assert ranks == [1, 2]
