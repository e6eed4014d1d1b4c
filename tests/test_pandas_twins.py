"""Cogrouped-pandas as-of twin == the certified native window query,
row for row."""

from __future__ import annotations


def test_cogroup_asof_matches_native(spark, sf_dir):
    from ecommerce_analytics_spark.operators.pandas_twins import (
        asof_prior_purchase_cogroup,
    )
    from ecommerce_analytics_spark.plans.registry import query_map

    def keyed(df):
        return {
            (r["customer_id"], r["invoice_no"], r["line_no"],
             r["stock_code"]):
            (r["quantity"], r["last_purchase_qty"],
             r["days_since_purchase"], r["return_kind"])
            for r in df.collect()}

    got = keyed(asof_prior_purchase_cogroup(spark, sf_dir))
    want = keyed(query_map()["asof_prior_purchase"](spark, sf_dir))
    assert len(got) == len(want) and len(want) > 0
    assert got == want


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
