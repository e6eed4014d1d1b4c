"""Degenerate-but-nonempty ML inputs (round-7 review findings).

The empty-orders gate certified the zero-row case; these corpora sit
just past it, where the crashes live:

* CONSTANT features — every customer has exactly one order on the
  same date, so frequency AND recency are constant and stddev_samp is
  0: the bare z-score division is an ANSI DIVIDE_BY_ZERO. zscore()
  now maps a zero-variance dimension to 0 everywhere.
* n < k — fewer valid customers than K_SEGMENTS: KMeans cannot
  populate every segment; the quality row must come back with
  definite booleans (False, True), not a crash or NULLs.
* single customer — stddev_samp is NULL (n=1): same guard, via the
  n < K_SEGMENTS branch.
"""

from __future__ import annotations

import os

import pytest


def _orders_fixture(tmp_path, rows_sql: str) -> str:
    import duckdb

    out = tmp_path
    src = "/root/testdata/sf0.001"
    for name in os.listdir(src):
        if name.endswith(".parquet") and name != "orders.parquet":
            os.symlink(os.path.join(src, name), out / name)
    duckdb.sql(f"""
        COPY (SELECT * FROM (VALUES {rows_sql})
              t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority))
        TO '{out}/orders.parquet' (FORMAT PARQUET)
    """)
    return str(out)


def _row(k, cust, price, day):
    return (f"(CAST({k} AS BIGINT), CAST({cust} AS BIGINT), 'O', "
            f"CAST({price} AS DOUBLE), TIMESTAMP '2024-01-{day:02d}', "
            f"'1-URGENT')")


def test_constant_features_do_not_crash_quality(spark, tmp_path):
    """6 customers, one order each, SAME date: recency and frequency
    are constant (stddev 0) — the quality row must still come back
    with definite booleans under ANSI."""
    rows = ", ".join(_row(i, 100 + i, 100.0 * i, 5) for i in range(6))
    sf = _orders_fixture(tmp_path, rows)
    from ecommerce_analytics_spark.ml.segmentation import (
        q_rfm_kmeans_quality,
    )
    r = q_rfm_kmeans_quality(spark, sf).collect()[0]
    assert r.n_customers == 6
    assert r.inertia_ratio_ok is not None
    assert r.all_segments_populated is not None


def test_fewer_customers_than_segments(spark, tmp_path):
    rows = ", ".join(_row(i, 100 + i, 50.0, 3 + i) for i in range(2))
    sf = _orders_fixture(tmp_path, rows)
    from ecommerce_analytics_spark.ml.segmentation import (
        K_SEGMENTS, q_rfm_kmeans_quality,
    )
    r = q_rfm_kmeans_quality(spark, sf).collect()[0]
    assert r.n_customers == 2
    assert r.k == K_SEGMENTS
    assert r.all_segments_populated is False
    assert r.inertia_ratio_ok is True


def test_null_price_customer_survives_kmeans(spark, tmp_path):
    """One customer's only order has a NULL price: rfm monetary is
    NULL (oracle semantics) but the fit coalesces it to zero spend
    instead of crashing the VectorAssembler."""
    rows = ", ".join(
        [_row(i, 100 + i, 100.0 + i, 2 + i) for i in range(5)]
        + ["(CAST(99 AS BIGINT), CAST(999 AS BIGINT), 'O', "
           "CAST(NULL AS DOUBLE), TIMESTAMP '2024-01-09', '1-URGENT')"])
    sf = _orders_fixture(tmp_path, rows)
    from ecommerce_analytics_spark.ml.segmentation import (
        q_rfm_kmeans_quality, q_rfm_kmeans_segments,
    )
    segs = {r.customer_id: r for r in
            q_rfm_kmeans_segments(spark, sf).collect()}
    assert 999 in segs and segs[999].monetary == 0.0
    r = q_rfm_kmeans_quality(spark, sf).collect()[0]
    assert r.n_customers == 6


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
