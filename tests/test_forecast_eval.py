"""Right-answer referee for holt_forecast_backtest: a plain-Python
Holt recurrence + backtest recompute must match, and the scoring
identities (paired day counts, skill = 1 - MAE ratio) must hold."""

from __future__ import annotations

import collections

import duckdb

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


def test_backtest_matches_plain_recompute(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["event_type"]: r for r in
           query_map()["holt_forecast_backtest"](spark, sf_dir).collect()}

    daily = duckdb.sql(f"""
        SELECT event_type, CAST(ts AS DATE) AS day,
               sum(round(value * 100)) / 100.0 AS rev
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2""").fetchall()
    series = collections.defaultdict(list)
    for et, _, rev in daily:
        series[et].append(rev)

    for et, revs in series.items():
        lvl = trend = None
        fcs = []  # forecast for NEXT day, per day
        for x in revs:
            if lvl is None:
                lvl, trend = x, 0.0
            else:
                prev = lvl
                lvl = 0.5 * x + 0.5 * (lvl + trend)
                trend = 0.5 * (lvl - prev) + 0.5 * trend
            fcs.append(lvl + trend)

        m_errs, n_errs, apes = [], [], []
        for t in range(len(revs)):
            if t < 7:  # need both lag-1 model fc and lag-7 naive
                continue
            model_fc = fcs[t - 1]
            naive_fc = revs[t - 7]
            m_errs.append(abs(revs[t] - model_fc))
            n_errs.append(abs(revs[t] - naive_fc))
            apes.append(abs(revs[t] - model_fc) / revs[t])

        g = got[et]
        assert g["n_days"] == len(m_errs) > 0
        mae_m = sum(m_errs) / len(m_errs)
        mae_n = sum(n_errs) / len(n_errs)
        assert abs(g["mae_model"] - mae_m) < 1e-4, et
        assert abs(g["mae_naive"] - mae_n) < 1e-4, et
        assert abs(g["mape_model"] - sum(apes) / len(apes)) < 1e-6, et
        assert abs(g["skill_vs_naive"] - (1 - mae_m / mae_n)) < 1e-4, et
