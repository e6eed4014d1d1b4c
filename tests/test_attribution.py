"""Right-answer referee for markov_attribution: a plain-float
reconstruction of the removal-effect model (journeys -> transition
matrix -> K-step reach probability per variant) must match the
fixed-point numbers to the truncation envelope, and the shares must
sum to 1."""

from __future__ import annotations

import collections

import duckdb


def _journeys(sf_dir: str):
    rows = duckdb.sql(f"""
        SELECT user_id, CAST(ts AS DATE) AS day, event_type
        FROM '{sf_dir}/events.parquet'
        ORDER BY user_id, day, ts, event_id""").fetchall()
    by_key = collections.defaultdict(list)
    for u, d, et in rows:
        by_key[(u, d)].append(et)
    out = []
    for seq in by_key.values():
        path = ["START"]
        converted = False
        for et in seq:
            if et == "purchase":
                path.append("CONV")
                converted = True
                break
            path.append(et)
        if not converted:
            path.append("NULL")
        out.append(path)
    return out


def _reach(trans: dict, iters: int) -> float:
    outdeg = collections.defaultdict(int)
    for (s, d), c in trans.items():
        outdeg[s] += c
    v = collections.defaultdict(float)
    for _ in range(iters):
        nv = collections.defaultdict(float)
        for (s, d), c in trans.items():
            tgt = 1.0 if d == "CONV" else 0.0 if d == "NULL" else v[d]
            nv[s] += (c / outdeg[s]) * tgt
        v = nv
    return v["START"]


def test_attribution_matches_float_model(spark, sf_dir):
    from ecommerce_analytics_spark.operators.attribution import ATTR_ITERS
    from ecommerce_analytics_spark.plans.registry import query_map

    got = {r["channel"]: r for r in
           query_map()["markov_attribution"](spark, sf_dir).collect()}
    assert set(got) == {"view", "click", "signup", "error"}

    paths = _journeys(sf_dir)
    full: collections.Counter = collections.Counter()
    for p in paths:
        for s, d in zip(p, p[1:]):
            full[(s, d)] += 1

    p_full = _reach(dict(full), ATTR_ITERS)
    effects = {}
    for ch in got:
        rem: collections.Counter = collections.Counter()
        for (s, d), c in full.items():
            if s == ch:
                continue
            rem[(s, "NULL" if d == ch else d)] += c
        p_rem = _reach(dict(rem), ATTR_ITERS)
        effects[ch] = (p_full - p_rem) / p_full
        g = got[ch]
        # fixed-point truncation: <=1e-9 per edge-step; generous bound
        assert abs(g["p_conv_full"] - p_full) < 1e-5
        assert abs(g["p_conv_removed"] - p_rem) < 1e-5
        assert abs(g["removal_effect"] - effects[ch]) < 1e-4

    tot = sum(effects.values())
    share_sum = 0.0
    for ch, g in got.items():
        assert abs(g["attribution_share"] - effects[ch] / tot) < 1e-4
        share_sum += g["attribution_share"]
    assert abs(share_sum - 1.0) < 1e-5


# ---------------------------------------------------------------------------
# Overflow-regime golden for the exact-decimal division (VERDICT r7 #2).
#
# The fixed-point recursion divides c_ij * val by c_i per edge. At test
# SFs the numerator stays far below 2^53; on a 100 TB event log c_ij
# reaches billions and the numerator passes the double-exact limit.
# attribution._idiv runs the division in DECIMAL(38,0) precisely for
# that regime — these tests pin a synthetic transition matrix THERE and
# assert (a) the decimal quotient matches exact Python `//`, and
# (b) the old BIGINT-via-double formulation actually diverges on the
# same rows, so the decimal form is load-bearing, not decorative.

ATTR_FIX = 1_000_000_000

# (c_ij, c_i): step-1 CONV edges (val = ATTR_FIX) whose numerator
# c_ij * ATTR_FIX > 2^53 AND whose double-rounded quotient is exactly
# one below the true one (found by exhaustive search, re-derived in
# the assertions below rather than hardcoded).
_DIVERGENT_EDGES = [
    (6_667_149_503, 13_996_067_577),
    (5_087_131_183, 6_298_014_443),
    (7_028_227_435, 7_295_579_795),
    (6_004_087_902, 16_317_965_740),
]


def test_idiv_overflow_regime_golden(spark):
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.operators.attribution import _idiv

    # one-variant transition matrix in the overflow regime: every node
    # carries one CONV edge from _DIVERGENT_EDGES plus a NULL edge
    # soaking up the rest of c_i, exactly the operator's edges shape
    rows = []
    for i, (c_ij, c_i) in enumerate(_DIVERGENT_EDGES, start=1):
        assert c_ij * ATTR_FIX > 2**53          # the regime
        assert c_ij * ATTR_FIX < 2**63          # still BIGINT-safe
        n = c_ij * ATTR_FIX - (c_ij * ATTR_FIX) % c_i
        assert int(float(n) / float(c_i)) != (c_ij * ATTR_FIX) // c_i, \
            "edge no longer diverges under double division"
        rows.append((i, c_i, [(3, c_ij), (4, c_i - c_ij)]))
    df = spark.createDataFrame(
        rows, "i int, c_i long, edges array<struct<j:int,c_ij:long>>")

    def val_step1(j):  # step 1 of the recursion: CONV=FIX, else 0
        return (F.when(j == F.lit(3), F.lit(ATTR_FIX).cast("bigint"))
                .otherwise(F.lit(0).cast("bigint")))

    got = df.select(
        "i",
        F.aggregate(
            "edges", F.lit(0).cast("bigint"),
            lambda s, e: s + _idiv(
                e["c_ij"].cast("decimal(38,0)") * val_step1(e["j"]),
                F.col("c_i"))).alias("v1"),
        # the formulation the decimal form replaced: BIGINT pmod, then
        # a BIGINT/BIGINT division that Spark runs in DOUBLE
        F.aggregate(
            "edges", F.lit(0).cast("bigint"),
            lambda s, e: s + ((e["c_ij"] * val_step1(e["j"])
                               - F.pmod(e["c_ij"] * val_step1(e["j"]),
                                        F.col("c_i")))
                              / F.col("c_i")).cast("bigint")).alias(
                                  "v1_double"),
    ).orderBy("i").collect()

    for row, (c_ij, c_i) in zip(got, _DIVERGENT_EDGES):
        exact = (c_ij * ATTR_FIX) // c_i        # Python exact //
        assert row.v1 == exact, f"decimal path wrong at i={row.i}"
        assert row.v1_double == exact - 1, (
            f"double path expected to sit one below at i={row.i}")


def test_idiv_matches_python_floordiv_randomized(spark):
    """Breadth companion: 200 random (a, b) pairs spanning 2^40..2^62
    numerators — decimal _idiv equals Python // on every one."""
    import random

    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.operators.attribution import _idiv

    rng = random.Random(42)
    pairs = []
    for _ in range(200):
        a = rng.randrange(2**40, 2**62)
        b = rng.randrange(1, a)
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a long, b long")
    got = df.select("a", "b", _idiv(F.col("a"), F.col("b"))
                    .alias("q")).collect()
    for r in got:
        assert r.q == r.a // r.b, (r.a, r.b, r.q)


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
