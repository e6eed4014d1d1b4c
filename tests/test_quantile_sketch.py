"""Histogram-quantile sketch: estimate accuracy vs exact discrete
percentiles (the pytest half of the contract; the merge + estimate
pipeline itself is oracle-checked by the driver gate)."""

from __future__ import annotations

import math

from ecommerce_analytics_spark.operators.quantiles import (
    BIN_W, QS, q_daily_value_quantile_sketch,
)


def _exact_disc(values, qpct):
    """Smallest value whose rank reaches qpct% — the discrete
    percentile the sketch's CDF cut mirrors."""
    s = sorted(values)
    return s[max(0, math.ceil(qpct * len(s) / 100) - 1)]


def test_estimates_within_bin_width(spark, sf_dir):
    rows = q_daily_value_quantile_sketch(spark, sf_dir).collect()
    events = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .selectExpr("date_format(ts, 'yyyy-MM-dd') AS day", "value") \
        .collect()
    by_day: dict[str | None, list[float]] = {}
    for r in events:
        by_day.setdefault(r["day"], []).append(r["value"])
        by_day.setdefault(None, []).append(r["value"])

    assert len(rows) == len(by_day)  # every day + the global row
    for r in rows:
        vals = by_day[r["day"]]
        assert r["n_events"] == len(vals)
        for q in QS:
            est, exact = r[f"p{q}_est"], _exact_disc(vals, q)
            # est is the upper edge of the bin containing the discrete
            # percentile → bounded one-sided error (cents snap slack)
            assert -0.011 <= est - exact <= BIN_W + 0.011, (
                r["day"], q, est, exact)
