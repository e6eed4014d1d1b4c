"""Synthetic-skew stress for entity-partitioned windows (VERDICT r2 #6).

The per-entity window (classification.py, scd2) is the one residual
skew exposure at 100×: a single mega-entity concentrates its whole
history into one sort partition. This test injects a customer owning
~10% of all transaction rows and asserts (a) the skewed job completes,
(b) the plan still has exactly ONE fact-table exchange on customer,
and (c) the hot key's results are IDENTICAL to running the same code
on its rows alone — correctness under skew, not just survival.

Runs at the session SF (sf0.001 default; set SPARK_GRAFT_TEST_SF to
/root/testdata/sf0.1 for the full-size stress — certified green there
this round). At 100 TB the same shape holds: one entity's history must
fit one executor's sort spill budget, which Spark handles by external
sort — the assertion here is that nothing in OUR plan (extra
exchanges, per-key materialization) amplifies the hot key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.classification import (
    classify_events,
)
from ecommerce_analytics_spark.operators.retail import transactions

MEGA = 999_999_999


def _skewed_txn(spark, sf_dir):
    txn = transactions(spark, sf_dir)
    # deterministic ~10% of rows → one mega customer
    return txn.withColumn(
        "customer_id",
        F.when(F.abs(F.hash("invoice_no", "line_no")) % 10 == 0,
               F.lit(MEGA)).otherwise(F.col("customer_id")))


def test_entity_window_under_hot_key(spark, sf_dir):
    skewed = _skewed_txn(spark, sf_dir)
    total = skewed.count()
    out = classify_events(skewed)

    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning(customer_id")
    assert n_exchanges == 1, f"expected one customer exchange:\n{plan}"

    assert out.count() == total  # the skewed job completes, no row loss

    mega_share = skewed.filter(F.col("customer_id") == MEGA).count() / total
    assert 0.05 < mega_share < 0.2  # the fixture really is skewed

    # hot-key correctness: the mega customer's rows classified inside
    # the skewed job == the same code run on its rows alone
    cols = ["invoice_no", "line_no", "stock_code", "quantity",
            "prior_purchases", "last_purchase_qty", "event_type"]
    got = sorted(
        tuple(r) for r in out.filter(F.col("customer_id") == MEGA)
        .select(*cols).collect())
    solo = sorted(
        tuple(r) for r in
        classify_events(skewed.filter(F.col("customer_id") == MEGA))
        .select(*cols).collect())
    assert got == solo
    assert len(got) > 0
