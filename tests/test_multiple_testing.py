"""Right-answer referee for bh_nation_return_tests: a plain-Python
recomputation using scipy-free exact formulas (z from counts, A&S CDF,
textbook BH step-up) must match, the A&S polynomial must agree with a
high-precision erfc-based CDF to its documented 7.5e-8 envelope, and
the BH invariants (monotone step-up, adjusted >= raw) must hold."""

from __future__ import annotations

import math

import duckdb


def _phi_as(x: float) -> float:
    t = 1.0 / (1.0 + 0.2316419 * x)
    poly = ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
             - 0.356563782) * t + 0.319381530) * t
    return 1.0 - 0.3989422804014327 * math.exp(-x * x / 2.0) * poly


def test_bh_matches_textbook_recompute(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["nation"]: r for r in
           query_map()["bh_nation_return_tests"](spark, sf_dir).collect()}

    rows = duckdb.sql(f"""
        SELECT n.n_name,
               CASE WHEN dayofweek(l.l_shipdate) IN (0, 6)
                    THEN 1 ELSE 0 END,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{sf_dir}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{sf_dir}/nation.parquet' n
          ON n.n_nationkey = c.c_nationkey""").fetchall()
    counts: dict = {}
    for nat, wk, ret in rows:
        c = counts.setdefault(nat, [0, 0, 0, 0])  # x1 n1 x2 n2
        if wk:
            c[0] += ret
            c[1] += 1
        else:
            c[2] += ret
            c[3] += 1

    tests = []
    for nat, (x1, n1, x2, n2) in counts.items():
        if n1 == 0 or n2 == 0:
            continue
        pool = (x1 + x2) / (n1 + n2)
        z = (x1 / n1 - x2 / n2) / math.sqrt(
            pool * (1.0 - pool) * (1.0 / n1 + 1.0 / n2))
        p = 2.0 * (1.0 - _phi_as(abs(z)))
        # A&S envelope vs the exact normal CDF (erfc-based)
        exact = 2.0 * (0.5 * math.erfc(abs(z) / math.sqrt(2.0)))
        assert abs(p - exact) < 2e-7
        tests.append((nat, z, p))

    m = len(tests)
    ranked = sorted(tests, key=lambda t: (t[2], t[0]))
    adj, running = {}, float("inf")
    for i in range(m - 1, -1, -1):
        nat, z, p = ranked[i]
        running = min(running, p * m / (i + 1))
        adj[nat] = min(running, 1.0)

    assert set(got) == {t[0] for t in tests}
    prev_adj = None
    for i, (nat, z, p) in enumerate(ranked):
        g = got[nat]
        assert abs(g["z_stat"] - z) < 1e-6, nat
        assert abs(g["p_value"] - p) < 1e-6, nat
        assert abs(g["bh_adjusted_p"] - adj[nat]) < 1e-6, nat
        assert g["significant_fdr05"] == (adj[nat] <= 0.05)
        assert g["bh_adjusted_p"] >= g["p_value"] - 1e-9  # adj >= raw
        if prev_adj is not None:  # step-up monotone in rank order
            assert g["bh_adjusted_p"] >= prev_adj - 1e-9
        prev_adj = g["bh_adjusted_p"]
