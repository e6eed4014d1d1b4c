"""Blocked levenshtein similarity join == naive quadratic join.

Random strings over a small alphabet (so near pairs actually occur),
all ≥ q*(d+1) chars (the count-filter completeness precondition
stringsim.py documents). The naive formulation is the exhaustive
cross product + levenshtein predicate; the blocked join must produce
exactly the same pair set with the same distances.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.stringsim import (
    MAX_DIST, Q, similarity_join_distinct,
)


def _random_words(seed: int, n: int) -> list[str]:
    rng = random.Random(seed)
    alphabet = "abc"
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(6, 12)))
            for _ in range(n // 2)]
    out = set(base)
    # mutated near-duplicates: 1-2 random edits of a base word
    while len(out) < n:
        w = list(rng.choice(base))
        for _ in range(rng.randint(1, 2)):
            op = rng.randint(0, 2)
            pos = rng.randrange(len(w))
            if op == 0:
                w[pos] = rng.choice(alphabet)
            elif op == 1 and len(w) > 6:
                del w[pos]
            else:
                w.insert(pos, rng.choice(alphabet))
        out.add("".join(w))
    return sorted(out)


def test_blocked_equals_naive_random(spark):
    words = _random_words(seed=7, n=60)
    vals = spark.createDataFrame([(w,) for w in words], "val string")

    got = sorted(
        similarity_join_distinct(vals, "val", q=Q, d=MAX_DIST)
        .select("val_a", "val_b", "edit_dist")
        .rdd.map(tuple).collect())

    a = vals.select(F.col("val").alias("x"))
    b = vals.select(F.col("val").alias("y"))
    want = sorted(
        a.crossJoin(b)
        .filter(F.col("x") < F.col("y"))
        .withColumn("d", F.levenshtein("x", "y"))
        .filter(F.col("d") <= MAX_DIST)
        .rdd.map(tuple).collect())

    assert got == want
    assert len(want) > 0  # the generator really produced near pairs


def test_payload_columns_ride_along(spark):
    vals = spark.createDataFrame(
        [("abcdef", 3), ("abcdxf", 5)], "val string, cnt long")
    rows = (similarity_join_distinct(vals, "val")
            .select("val_a", "val_b", "cnt_a", "cnt_b", "edit_dist")
            .collect())
    assert len(rows) == 1
    r = rows[0]
    assert (r.val_a, r.val_b, r.cnt_a, r.cnt_b, r.edit_dist) == \
        ("abcdef", "abcdxf", 3, 5, 1)


def test_short_value_precondition_enforced(spark):
    """Values shorter than q*(d+1) silently break the Gravano
    count-filter completeness bound — the join must REFUSE them at
    runtime (ADVICE r4), not drop true pairs."""
    import pytest

    vals = spark.createDataFrame(
        [("abcdef",), ("abc",)], "val string")  # "abc" < 2*(2+1)=6
    with pytest.raises(Exception, match="short"):
        similarity_join_distinct(vals, "val").collect()


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
