"""Right-answer referees for the decomposition and PSI monitors: the
DuckDB oracles certify both engines agree; these certify the agreed
numbers ARE classical additive decomposition / textbook PSI — plain
float recomputations with no integer-ratio tricks must match to the
snapping tolerance."""

from __future__ import annotations

import collections
import datetime
import math

import duckdb


def test_seasonal_decompose_matches_plain_float(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    rows = query_map()["seasonal_decompose_daily"](spark, sf_dir).collect()

    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(round(value * 100)) / 100.0 AS rev
            FROM '{sf_dir}/events.parquet'
            GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    series: dict[str, list] = collections.defaultdict(list)
    for et, day, rev in daily:
        series[et].append((day, rev))

    # plain-float classical decomposition per type
    exp = {}
    for et, pts in series.items():
        days = [d for d, _ in pts]
        revs = [r for _, r in pts]
        trend = [
            sum(revs[i - 3:i + 4]) / 7 if 3 <= i <= len(revs) - 4 else None
            for i in range(len(revs))]
        det = [(d, r - t)
               for d, r, t in zip(days, revs, trend) if t is not None]
        by_dow: dict[int, list] = collections.defaultdict(list)
        for d, x in det:
            by_dow[(d - datetime.date(1970, 1, 1)).days % 7].append(x)
        seas = {k: sum(v) / len(v) for k, v in by_dow.items()}
        for d, r, t in zip(days, revs, trend):
            exp[(et, d.isoformat())] = (r, t, seas.get(
                (d - datetime.date(1970, 1, 1)).days % 7))

    assert len(rows) == len(exp)
    for row in rows:
        r, t, s = exp[(row["event_type"], row["day"])]
        assert abs(row["revenue"] - r) < 1e-6
        if t is None:
            assert row["trend"] is None and row["residual"] is None
        else:
            assert abs(row["trend"] - t) < 1e-6
            assert abs(row["seasonal"] - s) < 1e-6
            assert abs(row["residual"] - (r - t - s)) < 1e-6
        # decomposition identity where defined
        if row["trend"] is not None and row["seasonal"] is not None:
            assert abs(row["revenue"] - row["trend"] - row["seasonal"]
                       - row["residual"]) < 1e-9


def test_psi_matches_textbook_float_formula(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["feature"]: r for r in
           query_map()["psi_feature_drift"](spark, sf_dir).collect()}
    assert set(got) == {"event_type", "value_bin"}

    raw = duckdb.sql(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)),
                   event_type,
                   least(CAST(round(value * 100) AS BIGINT) // 5000, 19)
            FROM '{sf_dir}/events.parquet'""").fetchall()
    days = [d for d, _, _ in raw]
    mid = (min(days) + max(days)) // 2

    for feature, pick in (("event_type", lambda r: r[1]),
                          ("value_bin", lambda r: str(r[2]))):
        ref: collections.Counter = collections.Counter()
        act: collections.Counter = collections.Counter()
        for r in raw:
            (ref if r[0] <= mid else act)[pick(r)] += 1
        bins = set(ref) | set(act)
        k = len(bins)
        na, nr = sum(act.values()), sum(ref.values())
        psi = 0.0
        for b in bins:
            p = (act[b] + 1) / (na + k)
            q = (ref[b] + 1) / (nr + k)
            psi += (p - q) * math.log(p / q)
        g = got[feature]
        assert g["n_bins"] == k and g["n_ref"] == nr and g["n_act"] == na
        # 1e-9 per-bin snapping, k bins + final 6dp rounding
        assert abs(g["psi"] - psi) < 1e-6 + k * 1e-9

    # identical distributions ⇒ PSI == 0 by construction (sanity of
    # the smoothing algebra): a synthetic equal-split check
    p = q = 1 / 4
    assert (p - q) * math.log(p / q) == 0.0


def test_rolling_slope_matches_numpy(spark, sf_dir):
    import numpy as np

    from ecommerce_analytics_spark.operators.decompose import ROLL_N
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {(r["event_type"], r["day"]): r["slope_dollars_per_day"]
           for r in query_map()["rolling_28d_revenue_slope"](
               spark, sf_dir).collect()}

    daily = duckdb.sql(f"""
        SELECT event_type, CAST(ts AS DATE) AS day,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
               sum(round(value * 100)) AS y
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2, 3 ORDER BY 1, 3""").fetchall()
    series = collections.defaultdict(list)
    for et, day, d, y in daily:
        series[et].append((day, d, y))

    n_checked = 0
    for et, pts in series.items():
        for i in range(ROLL_N - 1, len(pts)):
            win = pts[i - ROLL_N + 1:i + 1]
            x = np.array([p[1] for p in win], dtype=float)
            y = np.array([p[2] for p in win], dtype=float)
            slope = np.polyfit(x, y, 1)[0] / 100
            key = (et, pts[i][0].isoformat())
            assert key in got
            assert abs(got[key] - slope) < 1e-6, key
            n_checked += 1
    assert n_checked == len(got) > 0


def test_residual_autocorr_matches_plain_float(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["event_type"]: r for r in
           query_map()["residual_autocorrelation"](spark,
                                                   sf_dir).collect()}

    daily = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS day,
                   sum(round(value * 100)) / 100.0 AS rev
            FROM '{sf_dir}/events.parquet'
            GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    series = collections.defaultdict(list)
    for et, day, rev in series_rows(daily):
        series[et].append((day, rev))

    for et, pts in series.items():
        days = [d for d, _ in pts]
        revs = [r for _, r in pts]
        trend = [
            sum(revs[i - 3:i + 4]) / 7 if 3 <= i <= len(revs) - 4 else None
            for i in range(len(revs))]
        det = [(d, r - t)
               for d, r, t in zip(days, revs, trend) if t is not None]
        by_dow = collections.defaultdict(list)
        for d, x in det:
            by_dow[(d - datetime.date(1970, 1, 1)).days % 7].append(x)
        seas = {k: sum(v) / len(v) for k, v in by_dow.items()}
        resid = [x - seas[(d - datetime.date(1970, 1, 1)).days % 7]
                 for d, x in det]

        ee = sum(e * e for e in resid)
        dd = sum((a - b) * (a - b) for a, b in zip(resid[1:], resid))
        ce = sum(a * b for a, b in zip(resid[1:], resid))
        g = got[et]
        assert g["n_resid"] == len(resid)
        assert abs(g["durbin_watson"] - dd / ee) < 1e-4, et
        assert abs(g["lag1_autocorr"] - ce / ee) < 1e-4, et
        # DW range and the DW ~ 2(1 - r1) identity (edge-term slack)
        assert 0.0 <= g["durbin_watson"] <= 4.0
        edge = (resid[0] ** 2 + resid[-1] ** 2) / ee
        assert abs(g["durbin_watson"]
                   - (2 * (1 - g["lag1_autocorr"]) - edge)) < 1e-3


def series_rows(daily):
    for et, day, rev in daily:
        yield et, day, rev


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
