"""Right-answer referee for km_second_order_survival: a plain-float
Kaplan-Meier recomputation (the lifelines algorithm) must match the
log-space fixed-point curve, and the estimator's invariants
(monotone non-increasing, [0,1], exact risk-set accounting) must
hold."""

from __future__ import annotations

import collections
import math

import duckdb


def test_km_matches_plain_float_estimator(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    rows = sorted(query_map()["km_second_order_survival"](
        spark, sf_dir).collect(), key=lambda r: r["t_days"])

    orders = duckdb.sql(f"""
        SELECT o_custkey, o_orderdate FROM '{sf_dir}/orders.parquet'
        ORDER BY o_custkey, o_orderdate, o_orderkey""").fetchall()
    by_cust = collections.defaultdict(list)
    for c, d in orders:
        by_cust[c].append(d)
    mx = max(d for _, d in orders)
    durs = []
    for ds in by_cust.values():
        if len(ds) >= 2:
            durs.append(((ds[1] - ds[0]).days, 1))
        else:
            durs.append(((mx - ds[0]).days, 0))

    # plain-float KM
    d_t: collections.Counter = collections.Counter()
    c_t: collections.Counter = collections.Counter()
    for t, e in durs:
        c_t[t] += 1
        d_t[t] += e
    total = len(durs)
    removed = 0
    s = 1.0
    exp = {}
    for t in sorted(c_t):
        n = total - removed
        if d_t[t] >= 1:
            s *= (n - d_t[t]) / n
            exp[t] = (n, d_t[t], s)
        removed += c_t[t]

    assert [r["t_days"] for r in rows] == sorted(exp)
    prev = 1.0 + 1e-12
    for r in rows:
        n, d, s = exp[r["t_days"]]
        assert r["n_at_risk"] == n and r["n_events"] == d
        assert abs(r["survival"] - s) < 1e-5, r["t_days"]
        assert 0.0 <= r["survival"] <= prev + 1e-9  # monotone, in [0,1]
        prev = r["survival"]
