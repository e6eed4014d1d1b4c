"""Right-answer referees for the retail-economics queries: numpy/plain
recomputations on raw floats must match the exact-arithmetic results
to the snapping tolerance."""

from __future__ import annotations

import collections
import math

import duckdb
import numpy as np


def test_cohort_ltv_matches_plain_recompute(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    rows = query_map()["cohort_ltv_curve"](spark, sf_dir).collect()

    orders = duckdb.sql(f"""
        SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
               round(o_totalprice * 100) AS cents
        FROM '{sf_dir}/orders.parquet'""").fetchall()
    first = {}
    for c, m, _ in orders:
        if c not in first or m < first[c]:
            first[c] = m
    sizes: collections.Counter = collections.Counter(first.values())
    rev: collections.Counter = collections.Counter()
    for c, m, cents in orders:
        f = first[c]
        age = (m.year - f.year) * 12 + (m.month - f.month)
        rev[(f, age)] += int(cents)

    exp = {}
    for (f, age) in sorted(rev):
        prev = exp.get((f, age - 1), (0, 0))[1] if age > 0 else 0
        # cumulative walks sparse ages too: sum all ages <= age
        cum = sum(v for (g, a), v in rev.items() if g == f and a <= age)
        exp[(f, age)] = (rev[(f, age)], cum)

    assert len(rows) == len(exp)
    for r in rows:
        key = tuple(int(x) for x in r["cohort_month"].split("-"))
        match = [(f, a) for (f, a) in exp
                 if (f.year, f.month) == key and a == r["age_months"]]
        assert len(match) == 1
        f, a = match[0]
        period, cum = exp[(f, a)]
        assert abs(r["period_revenue"] - period / 100) < 1e-6
        assert abs(r["cum_revenue"] - cum / 100) < 1e-6
        assert r["n_customers"] == sizes[f]
        assert abs(r["cum_ltv_per_customer"]
                   - cum / 100 / sizes[f]) < 1e-5
        # curve invariant: cumulative >= period, both positive
        assert r["cum_revenue"] >= r["period_revenue"] > 0


def test_elasticity_matches_numpy_lstsq(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["p_brand"]: r for r in
           query_map()["price_elasticity_by_brand"](spark,
                                                    sf_dir).collect()}

    rows = duckdb.sql(f"""
        SELECT p.p_brand, l.l_extendedprice, l.l_quantity
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey
    """).fetchall()
    by_brand = collections.defaultdict(list)
    for b, ep, q in rows:
        # the query's exact formulation: cents ratio, integer quantity
        by_brand[b].append((math.log(round(ep * 100) / int(q)),
                            math.log(int(q))))

    assert set(got) == set(by_brand)
    for b, obs in by_brand.items():
        x = np.array([o[0] for o in obs])
        y = np.array([o[1] for o in obs])
        slope, intercept = np.polyfit(x, y, 1)
        g = got[b]
        assert g["n_obs"] == len(obs)
        assert abs(g["elasticity"] - slope) < 1e-4, b
        assert abs(g["intercept_ln_qty"] - intercept) < 1e-3, b
        # demand curves slope down in this synthetic data
        assert g["elasticity"] < 0
