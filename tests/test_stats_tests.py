"""Statistical test queries vs independent numpy referees."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _purchases(spark, sf_dir):
    from ecommerce_analytics_spark.io import load_table
    return (load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "purchase"))


def test_ks_matches_numpy_ecdf(spark, sf_dir):
    from ecommerce_analytics_spark.operators.stats_tests import (
        q_ks_weekend_vs_weekday,
    )
    rows = (_purchases(spark, sf_dir)
            .select(F.round(F.col("value") * 100).cast("long")
                    .alias("cents"),
                    (F.weekday("ts") >= 5).alias("wk")).collect())
    a = np.sort([r["cents"] for r in rows if r["wk"]])
    b = np.sort([r["cents"] for r in rows if not r["wk"]])
    support = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, support, side="right")
    cb = np.searchsorted(b, support, side="right")
    d_num = np.abs(len(b) * ca.astype(object)
                   - len(a) * cb.astype(object))
    want_d = int(max(d_num))

    out = q_ks_weekend_vs_weekday(spark, sf_dir).collect()[0]
    assert out["n_weekend"] == len(a) and out["n_weekday"] == len(b)
    assert out["d_num"] == want_d
    assert abs(out["ks_d"] - want_d / (len(a) * len(b))) < 1e-8
    at = int(support[np.argmax(d_num == want_d)])
    assert out["at_cents"] == at


def test_cusum_matches_numpy_argmax(spark, sf_dir):
    from ecommerce_analytics_spark.operators.stats_tests import (
        q_revenue_changepoint_cusum,
    )
    daily = (_purchases(spark, sf_dir)
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("x"))
             .orderBy("day").collect())
    x = np.array([r["x"] for r in daily], dtype=object)
    n = len(x)
    s = np.cumsum(x)
    t = np.arange(1, n + 1, dtype=object)
    d = np.abs(n * s - t * s[-1])
    k = int(np.argmax(d == max(d)))

    out = q_revenue_changepoint_cusum(spark, sf_dir).collect()[0]
    assert out["n_days"] == n
    assert out["changepoint_day"] == daily[k]["day"].isoformat()
    assert out["cusum_num"] == int(max(d))
    before = float(s[k]) / (k + 1) / 100.0
    after = float(s[-1] - s[k]) / (n - k - 1) / 100.0
    assert abs(out["mean_before"] - before) < 1e-5
    assert abs(out["mean_after"] - after) < 1e-5


def test_chi2_matches_numpy_contingency(spark, sf_dir):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.stats_tests import (
        q_chi2_event_type_weekend,
    )
    cells = (load_table(spark, sf_dir, "events")
             .groupBy("event_type", (F.weekday("ts") >= 5).alias("wk"))
             .count().collect())
    types = sorted({r["event_type"] for r in cells})
    obs = np.zeros((len(types), 2))
    for r in cells:
        obs[types.index(r["event_type"]), int(r["wk"])] = r["count"]
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    chi2 = float(((obs - exp) ** 2 / exp).sum())

    out = q_chi2_event_type_weekend(spark, sf_dir).collect()[0]
    assert out["n_events"] == int(n)
    assert out["dof"] == (len(types) - 1) * (obs.shape[1] - 1)
    assert abs(out["chi2"] - chi2) < 1e-5


def test_entropy_matches_numpy(spark, sf_dir):
    from ecommerce_analytics_spark.operators.stats_tests import (
        q_column_entropy_profile,
    )
    from ecommerce_analytics_spark.io import load_table
    rows = {(r["tbl"], r["col"]): r
            for r in q_column_entropy_profile(spark, sf_dir).collect()}
    assert set(rows) == {("events", "event_type"),
                         ("documents", "lang"), ("documents", "source")}
    vals = [r["event_type"] for r in
            load_table(spark, sf_dir, "events")
            .select("event_type").collect()]
    _, counts = np.unique(vals, return_counts=True)
    p = counts / counts.sum()
    want = float(-(p * np.log2(p)).sum())
    got = rows[("events", "event_type")]
    assert got["n"] == len(vals) and got["n_distinct"] == len(counts)
    assert abs(got["entropy"] - want) < 1e-5
    assert abs(got["norm_entropy"] - want / np.log2(len(counts))) < 1e-5
    for r in rows.values():
        assert 0.0 <= r["norm_entropy"] <= 1.0 + 1e-9


def test_benford_matches_numpy(spark, sf_dir):
    from ecommerce_analytics_spark.operators.stats_tests import (
        q_benford_first_digit,
    )
    cents = np.array([r["cents"] for r in
                      _purchases(spark, sf_dir)
                      .select(F.round(F.col("value") * 100).cast("long")
                              .alias("cents")).collect()])
    cents = cents[cents > 0]
    first = np.array([int(str(c)[0]) for c in cents])
    out = {r["digit"]: r for r in
           q_benford_first_digit(spark, sf_dir).collect()}
    assert set(out) == set(range(1, 10))
    n = len(first)
    devs = []
    for d in range(1, 10):
        obs = int((first == d).sum())
        assert out[d]["n_obs"] == obs
        bp = np.log10(1 + 1 / d)
        assert abs(out[d]["benford_p"] - bp) < 1e-6
        devs.append(abs(obs / n - bp))
    mad = float(np.mean(devs))
    assert abs(out[1]["mad"] - mad) < 1e-5


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
