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
