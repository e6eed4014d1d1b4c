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
