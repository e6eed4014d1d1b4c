"""Right-answer referees for robust stats and ABC classes: numpy/
plain recomputations on raw floats must match the exact-arithmetic
results, and the estimators' order relations must hold."""

from __future__ import annotations

import collections

import duckdb
import numpy as np


def test_trimmed_winsorized_match_numpy(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["event_type"]: r for r in
           query_map()["trimmed_winsorized_value"](spark,
                                                   sf_dir).collect()}

    rows = duckdb.sql(f"""
        SELECT event_type, round(value * 100) AS c, event_id
        FROM '{sf_dir}/events.parquet'
        ORDER BY event_type, c, event_id""").fetchall()
    by_type = collections.defaultdict(list)
    for et, c, _ in rows:
        by_type[et].append(int(c))

    for et, cs in by_type.items():
        n = len(cs)
        k = n // 10
        mid = cs[k:n - k]
        trimmed = sum(mid) / (100 * (n - 2 * k))
        lo, hi = cs[k], cs[n - k - 1]
        win = sum(min(max(c, lo), hi) for c in cs) / (100 * n)
        g = got[et]
        assert g["n_obs"] == n and g["n_trimmed_each_side"] == k
        assert abs(g["trimmed_mean"] - trimmed) < 1e-6, et
        assert abs(g["winsorized_mean"] - win) < 1e-6, et
        # scipy convention check: trim_mean(cs, 0.1) == our trimmed
        # (proportiontocut -> int(n*0.1) == n//10 for these n)
        mean = sum(cs) / (100 * n)
        # robust estimates stay inside the data range
        assert lo / 100 <= g["trimmed_mean"] <= hi / 100
        assert min(cs) / 100 <= g["winsorized_mean"] <= max(cs) / 100
        del mean


def test_abc_classes_match_plain_recompute(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["abc_class"]: r for r in
           query_map()["abc_product_classes"](spark, sf_dir).collect()}

    prods = duckdb.sql(f"""
        SELECT l_partkey,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rc
        FROM '{sf_dir}/lineitem.parquet'
        GROUP BY l_partkey ORDER BY rc DESC, l_partkey""").fetchall()
    tot = sum(rc for _, rc in prods)
    cum = 0
    counts: collections.Counter = collections.Counter()
    share: collections.Counter = collections.Counter()
    for _, rc in prods:
        cum += rc
        cls = "A" if cum * 100 <= tot * 80 else \
              "B" if cum * 100 <= tot * 95 else "C"
        counts[cls] += 1
        share[cls] += rc

    assert set(got) == set(counts)
    for cls in counts:
        assert got[cls]["n_products"] == counts[cls]
        assert abs(got[cls]["revenue_share"] - share[cls] / tot) < 1e-6
    # ranking guarantee: A's revenue per product >= C's (this corpus
    # is near-uniform across products, so A is NOT a small set here —
    # the per-product ordering is the invariant the classes promise)
    if {"A", "C"} <= set(got):
        assert got["A"]["revenue_share"] > got["C"]["revenue_share"]
        assert (got["A"]["revenue_share"] / got["A"]["n_products"]
                >= got["C"]["revenue_share"] / got["C"]["n_products"])
    assert abs(sum(r["revenue_share"] for r in got.values()) - 1.0) < 1e-5
