"""Property-based spot checks (SURVEY §5.2.5, hypothesis): invariants
that must hold for any input, independent of partitioning."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _events_strategy():
    event = st.tuples(
        st.integers(0, 3),                      # user_id
        st.integers(0, 10 ** 6),                # event_id (dedup below)
        st.integers(0, 10 ** 6),                # seconds offset
        st.sampled_from(EVENT_TYPES),
        st.floats(0, 1000, allow_nan=False, width=32),
    )
    return st.lists(event, min_size=1, max_size=30,
                    unique_by=lambda e: e[1])


@settings(max_examples=10, deadline=None)
@given(_events_strategy())
def test_ltv_final_equals_signed_sum(spark_h, rows):
    """Running-LTV last value per user == plain sum of signed amounts,
    under any partitioning."""
    from ecommerce_analytics_spark.operators.events_enrichment import (
        signed_amount)
    base = dt.datetime(2024, 1, 1)
    df = spark_h.createDataFrame(
        [(u, e, base + dt.timedelta(seconds=s), t, float(v))
         for u, e, s, t, v in rows],
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double").repartition(5)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = df.select(
        "user_id", "event_id", "ts",
        F.sum(signed_amount()).over(w).alias("ltv"))
    last = (running.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(F.desc("ts"), F.desc("event_id"))))
        .filter("rn = 1"))
    direct = df.groupBy("user_id").agg(
        F.sum(signed_amount()).alias("total"))
    # compare per user with float tolerance
    got = {r["user_id"]: r["ltv"] for r in last.collect()}
    exp = {r["user_id"]: r["total"] for r in direct.collect()}
    assert set(got) == set(exp)
    for u in exp:
        assert abs(got[u] - exp[u]) < 1e-6


@settings(max_examples=10, deadline=None)
@given(_events_strategy())
def test_exact_dedup_idempotent(spark_h, rows):
    """dropDuplicates twice == once; dedup of doubled input == dedup of
    the input."""
    base = dt.datetime(2024, 1, 1)
    df = spark_h.createDataFrame(
        [(u, e, base + dt.timedelta(seconds=s), t, float(v))
         for u, e, s, t, v in rows],
        "user_id long, event_id long, ts timestamp, event_type string, "
        "value double")
    doubled = df.unionAll(df).repartition(7)
    once = doubled.dropDuplicates(["event_id"])
    assert once.count() == df.count()
    assert once.dropDuplicates(["event_id"]).count() == df.count()


def test_simhash_hamming_probe_finds_near_identical(spark, sf_dir):
    """The Hamming probe join must recover injected near-duplicates
    (first token removed → a few signature bits flip) that exact-
    signature bucketing cannot see, plus the verbatim copies at
    distance 0."""
    from ecommerce_analytics_spark.plans.registry import query_map
    pdf = query_map()["dedup_simhash_hamming"](spark, sf_dir).toPandas()
    near = pdf[pdf.doc_a + 10_000_000 == pdf.doc_b]   # 1-token-trimmed
    exact = pdf[pdf.doc_a + 20_000_000 == pdf.doc_b]  # verbatim copies
    assert len(exact) > 0 and (exact.hamming_dist == 0).all()
    assert len(near) > 0
    # at least some trimmed docs land at distance 1-2 — invisible to
    # the exact-bucket query, visible to the probe join
    assert (near.hamming_dist > 0).any()


@settings(max_examples=8, deadline=None, derandomize=True)
@given(st.lists(
    st.tuples(
        st.lists(st.floats(-10, 10, allow_nan=False, width=32),
                 min_size=64, max_size=64),
        st.floats(0.1, 100.0, allow_nan=False),
    ),
    min_size=1, max_size=8))
def test_lsh_signature_scale_invariant(spark_h, vecs):
    """Hyperplane LSH band values depend only on vector DIRECTION:
    scaling by any positive constant must leave every band unchanged
    (the property the injected-copy guarantee rests on). Holds exactly
    in IEEE arithmetic: each product and the fold scale monotonically,
    so projection signs are preserved."""
    from ecommerce_analytics_spark.operators.similarity import lsh_band_cols
    rows = [(i, [float(x) for x in v], [float(x * s) for x in v])
            for i, (v, s) in enumerate(vecs)]
    df = spark_h.createDataFrame(
        rows, "vec_id long, orig array<float>, scaled array<float>")
    orig = [F.array(*lsh_band_cols(F.col("orig"))).alias("b_orig")]
    scaled = [F.array(*lsh_band_cols(F.col("scaled"))).alias("b_scaled")]
    out = df.select("vec_id", *orig, *scaled).collect()
    for r in out:
        assert r["b_orig"] == r["b_scaled"], r["vec_id"]


@settings(max_examples=15, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 2),                        # group key
              st.decimals(min_value="-99999.99", max_value="99999.99",
                          places=2),                    # money value
              st.decimals(min_value="0.00", max_value="0.99", places=2),
              st.decimals(min_value="0.00", max_value="0.99", places=2)),
    min_size=1, max_size=40))
def test_bigint_money_sums_are_exact(spark_h, rows):
    """The BIGINT-accumulator money sums equal exact Decimal
    arithmetic for ANY 2-dec inputs under any partitioning — the
    contract the r3 DECIMAL→BIGINT rewrite must preserve."""
    from decimal import ROUND_HALF_UP, Decimal

    from ecommerce_analytics_spark.numerics import (
        charge_sum, disc_price_sum, money_sum)

    df = spark_h.createDataFrame(
        [(g, float(p), float(d), float(t)) for g, p, d, t in rows],
        "g int, l_extendedprice double, l_discount double, l_tax double"
    ).repartition(7)
    got = {r["g"]: r for r in df.groupBy("g").agg(
        money_sum("l_extendedprice").alias("m"),
        disc_price_sum().alias("dp"),
        charge_sum().alias("ch")).collect()}

    cent = Decimal("0.01")
    for g in {r[0] for r in rows}:
        grp = [r for r in rows if r[0] == g]
        m = sum(p for _, p, _, _ in grp)
        dp = (sum(p * (1 - d) for _, p, d, _ in grp)
              .quantize(cent, rounding=ROUND_HALF_UP))
        ch = (sum(p * (1 - d) * (1 + t) for _, p, d, t in grp)
              .quantize(cent, rounding=ROUND_HALF_UP))
        # both sides are "nearest double to the exact decimal sum"
        assert float(m) == got[g]["m"], (g, m, got[g]["m"])
        assert float(dp) == got[g]["dp"], (g, dp, got[g]["dp"])
        assert float(ch) == got[g]["ch"], (g, ch, got[g]["ch"])


@given(st.lists(st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
                min_size=1, max_size=50, unique=True))
@settings(max_examples=20, deadline=None)
def test_morton_interleave_is_injective_and_bounded(spark_h, pairs):
    """Morton codes are a bijection on [0,2^16)^2: distinct inputs give
    distinct codes (layout ordering never collapses two cells) and
    every code fits 32 bits."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.operators.layout import morton_key

    df = spark_h.createDataFrame(pairs, "a long, b long")
    codes = [r["m"] for r in df.select(
        morton_key(F.col("a"), F.col("b")).alias("m")).collect()]
    assert len(set(codes)) == len(pairs)
    assert all(0 <= c < (1 << 32) for c in codes)


@given(st.lists(st.tuples(st.integers(0, 1000), st.integers(0, 300)),
                min_size=1, max_size=12),
       st.lists(st.tuples(st.integers(0, 1000), st.integers(0, 300)),
                min_size=1, max_size=12))
@settings(max_examples=12, deadline=None)
def test_banded_interval_join_equals_naive(spark_h, a_raw, b_raw):
    """overlap_join_banded == the naive inequality join for arbitrary
    interval sets (starts 0-1000, lengths 0-300, bucket 100 — spans
    multiple buckets, boundary touches, zero-length all generated)."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.operators.intervals import (
        overlap_join_banded,
    )

    a = spark_h.createDataFrame(
        [(i, s, s + l) for i, (s, l) in enumerate(a_raw)],
        "aid long, s long, e long")
    b = spark_h.createDataFrame(
        [(i, s, s + l) for i, (s, l) in enumerate(b_raw)],
        "bid long, ps long, pe long")
    got = sorted(overlap_join_banded(a, b, "s", "e", "ps", "pe", 100)
                 .select("aid", "bid").rdd.map(tuple).collect())
    want = sorted(
        a.crossJoin(b)
        .filter((F.col("s") < F.col("pe")) & (F.col("ps") < F.col("e")))
        .select("aid", "bid").rdd.map(tuple).collect())
    assert got == want


def test_holt_winters_recurrence_consistency(spark_h, sf_dir):
    """The emitted Holt-Winters rows satisfy the defining recurrences
    EXACTLY when recomputed from the outputs alone (seasonal lag 7,
    one-step forecast uses the season emitted 6 days earlier) — a
    referee that would catch any misalignment of the rolling seasonal
    state without reimplementing the seeding."""
    from ecommerce_analytics_spark.operators.timeseries import (
        HW_PERIOD, q_holt_winters_daily_revenue,
    )
    rows = q_holt_winters_daily_revenue(spark_h, sf_dir).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["day"])
        for t in range(len(rs)):
            r = rs[t]
            # s_new = 0.5*(x - l' - b') + 0.5*s_old, with s_old the
            # season emitted exactly HW_PERIOD days earlier
            if t >= HW_PERIOD:
                prev, old = rs[t - 1], rs[t - HW_PERIOD]
                lvl = (0.5 * (r["rev"] - old["season"])
                       + 0.5 * (prev["lvl"] + prev["trend"]))
                assert lvl == r["lvl"], (et, r["day"])
                trend = 0.5 * (lvl - prev["lvl"]) + 0.5 * prev["trend"]
                assert trend == r["trend"], (et, r["day"])
                s_new = (0.5 * (r["rev"] - prev["lvl"] - prev["trend"])
                         + 0.5 * old["season"])
                assert s_new == r["season"], (et, r["day"])
            # forecast uses the season from HW_PERIOD-1 days back
            if t >= HW_PERIOD - 1:
                s_next = rs[t - (HW_PERIOD - 1)]["season"]
                assert r["forecast_next"] == (
                    r["lvl"] + r["trend"] + s_next), (et, r["day"])


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
