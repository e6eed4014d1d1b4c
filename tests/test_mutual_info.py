"""Right-answer referee for mi_feature_ranking: plain-float
contingency MI (the mutual_info_score formula) must match the
fixed-point number to the snapping tolerance, and MI's information
inequalities must hold."""

from __future__ import annotations

import collections
import math

import duckdb


def test_mi_matches_plain_float_contingency(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["feature"]: r for r in
           query_map()["mi_feature_ranking"](spark, sf_dir).collect()}
    assert set(got) == {"linestatus", "quantity_bin",
                        "discount_pct", "ship_month"}

    rows = duckdb.sql(f"""
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END,
               l_linestatus,
               CAST(CAST(l_quantity AS BIGINT) // 10 AS VARCHAR),
               CAST(CAST(round(l_discount * 100) AS BIGINT) AS VARCHAR),
               CAST(month(l_shipdate) AS VARCHAR)
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()

    feats = {"linestatus": 1, "quantity_bin": 2,
             "discount_pct": 3, "ship_month": 4}
    for feature, idx in feats.items():
        cxy: collections.Counter = collections.Counter()
        for r in rows:
            cxy[(r[idx], r[0])] += 1
        cx: collections.Counter = collections.Counter()
        cy: collections.Counter = collections.Counter()
        for (b, y), c in cxy.items():
            cx[b] += c
            cy[y] += c
        n = sum(cxy.values())
        mi = sum((c / n) * math.log(c * n / (cx[b] * cy[y]))
                 for (b, y), c in cxy.items())
        hy = -sum((c / n) * math.log(c / n) for c in cy.values())

        g = got[feature]
        assert g["n_cells"] == len(cxy)
        tol = 1e-6 + len(cxy) * 1e-9
        assert abs(g["mi_nats"] - mi) < tol, feature
        assert abs(g["uncertainty_coef"] - mi / hy) < 1e-5, feature
        # information inequalities: 0 <= MI <= H(label)
        assert -tol <= g["mi_nats"] <= hy + tol
        assert -1e-5 <= g["uncertainty_coef"] <= 1 + 1e-5


def test_decision_stump_matches_plain_float(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["feature"]: r for r in
           query_map()["decision_stump_returns"](spark,
                                                 sf_dir).collect()}

    rows = duckdb.sql(f"""
        SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END,
               l_linestatus,
               CAST(CAST(l_quantity AS BIGINT) // 10 AS VARCHAR),
               CAST(CAST(round(l_discount * 100) AS BIGINT) AS VARCHAR),
               CAST(month(l_shipdate) AS VARCHAR)
        FROM '{sf_dir}/lineitem.parquet'""").fetchall()

    def ent(d, n, total):
        s = 0.0
        for c in (d, n - d):
            if 0 < c < n or (c == n and c > 0):
                if c > 0:
                    s += (c / total) * math.log(n / c)
        return s

    feats = {"linestatus": 1, "quantity_bin": 2,
             "discount_pct": 3, "ship_month": 4}
    for feature, idx in feats.items():
        n1: collections.Counter = collections.Counter()
        d1: collections.Counter = collections.Counter()
        for r in rows:
            n1[r[idx]] += 1
            d1[r[idx]] += r[0]
        n = sum(n1.values())
        d = sum(d1.values())
        hy = ent(d, n, n)
        best = None
        for b in sorted(n1):
            n_in, d_in = n1[b], d1[b]
            n_out, d_out = n - n_in, d - d_in
            gain = hy - ent(d_in, n_in, n) - ent(d_out, n_out, n)
            if best is None or gain > best[1] + 1e-12:
                best = (b, gain, n_in, d_in, n_out, d_out)
        b, gain, n_in, d_in, n_out, d_out = best
        g = got[feature]
        assert g["split_bin"] == b, feature
        assert g["n_in"] == n_in
        assert abs(g["gain_nats"] - gain) < 1e-5
        assert abs(g["p_return_in"] - d_in / n_in) < 1e-6
        assert abs(g["p_return_out"] - d_out / n_out) < 1e-6
        assert g["gain_nats"] >= -1e-9  # gain is non-negative
