"""Hand-computed golden fixtures for the semantically tricky operators
(SURVEY §5.2.3 / FIXTURES.md §B): classification order/tie-breaks,
full-return reachability, LTV sign handling, risk-score boundaries."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


def _txn_fixture(spark):
    """Tiny retail stream for one customer + one anonymous-ish case.

    Columns mirror operators/retail.transactions output.
    """
    rows = [
        # (customer, invoice, line, stock, supp, date, qty, price, amount,
        #  is_return, is_credit_note)
        (1, 100, 1, 7, 1, dt.datetime(2024, 1, 1), 5.0, 10.0, 50.0, False, False),
        (1, 101, 1, 7, 1, dt.datetime(2024, 1, 2), 5.0, 10.0, 50.0, True, False),   # qty == last purchase → full_return
        (1, 102, 1, 7, 1, dt.datetime(2024, 1, 3), 3.0, 10.0, 30.0, True, False),   # != last purchase → partial_return
        (1, 103, 1, 7, 1, dt.datetime(2024, 1, 4), 50.0, 10.0, 500.0, False, False),  # prior purchases > 0, qty > 40 → bulk
        (1, 104, 1, 8, 1, dt.datetime(2024, 1, 5), 2.0, 9e5, 80000.0, False, False),  # amount > 75000 → high_value
        (1, 105, 1, 8, 1, dt.datetime(2024, 1, 6), 2.0, 10.0, 20.0, False, False),   # → repeat
        (1, 106, 1, 8, 1, dt.datetime(2024, 1, 7), 9.0, 10.0, 90.0, True, True),     # credit note wins over full/partial
        (2, 200, 1, 7, 1, dt.datetime(2024, 1, 1), 4.0, 10.0, 40.0, True, False),    # first event is a return
        (2, 201, 1, 7, 1, dt.datetime(2024, 1, 2), 4.0, 10.0, 40.0, False, False),   # still first_purchase (doc'd bug #2 kept)
    ]
    return spark.createDataFrame(
        rows, "customer_id long, invoice_no long, line_no int, "
              "stock_code long, supp_id long, invoice_date timestamp, "
              "quantity double, unit_price double, total_amount double, "
              "is_return boolean, is_credit_note boolean")


def test_classification_golden(spark):
    from ecommerce_analytics_spark.operators.classification import (
        classify_events)
    got = {(r["customer_id"], r["invoice_no"]): r["event_type"]
           for r in classify_events(_txn_fixture(spark)).collect()}
    assert got == {
        (1, 100): "first_purchase",
        (1, 101): "full_return",
        (1, 102): "partial_return",
        (1, 103): "bulk_purchase",
        (1, 104): "high_value_purchase",
        (1, 105): "repeat_purchase",
        (1, 106): "credit_note_return",
        (2, 200): "partial_return",      # no prior purchase of (2,7)
        (2, 201): "first_purchase",      # returns never count as purchases
    }


def test_classification_invariant_under_repartition(spark):
    from ecommerce_analytics_spark.operators.classification import (
        classify_events)
    base = _txn_fixture(spark)
    a = classify_events(base).collect()
    b = classify_events(base.repartition(7)).collect()
    key = lambda r: (r["customer_id"], r["invoice_no"], r["line_no"])
    assert sorted(map(tuple, a), key=str) == sorted(map(tuple, b), key=str)


def test_ltv_sign_golden(spark):
    """EnrichmentFunction.java:112-115 — returns subtract abs(amount)
    even when the amount arrives already negative."""
    from ecommerce_analytics_spark.operators.events_enrichment import (
        signed_amount)
    rows = [
        (1, 10, dt.datetime(2024, 1, 1, 0), "purchase", 100.0),
        (1, 11, dt.datetime(2024, 1, 1, 1), "view", 999.0),     # carries
        (1, 12, dt.datetime(2024, 1, 1, 2), "error", -30.0),    # -abs → -30
        (1, 13, dt.datetime(2024, 1, 1, 3), "error", 20.0),     # -abs → -20
        (1, 14, dt.datetime(2024, 1, 1, 4), "purchase", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string, value double")
    from pyspark.sql import Window
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    got = [r["ltv"] for r in df.select(
        F.sum(signed_amount()).over(w).alias("ltv")).orderBy("event_id").collect()]
    assert got == [100.0, 100.0, 70.0, 50.0, 60.0]


def test_risk_score_boundaries(spark):
    """Reference thresholds are strict '>' (EnrichmentFunction.java:
    151-160): value exactly at a boundary takes the lower branch."""
    from ecommerce_analytics_spark.operators.events_enrichment import (
        RISK_HIGH_AMOUNT, RISK_MID_AMOUNT)
    from ecommerce_analytics_spark.plans.registry import query_map
    import tempfile, os
    rows = [
        (1, 1, dt.datetime(2024, 1, 1), "purchase", RISK_MID_AMOUNT, "{}"),
        (2, 2, dt.datetime(2024, 1, 1), "purchase", RISK_MID_AMOUNT + 1, "{}"),
        (3, 3, dt.datetime(2024, 1, 1), "purchase", RISK_HIGH_AMOUNT, "{}"),
        (4, 4, dt.datetime(2024, 1, 1), "purchase", RISK_HIGH_AMOUNT + 1, "{}"),
        (5, 5, dt.datetime(2024, 1, 1), "signup", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double, props string")
    with tempfile.TemporaryDirectory() as d:
        # route through the registered query by staging a mini events table
        df.withColumn("ts", F.unix_micros("ts") * 1000) \
          .write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["event_id"]: r["risk_score"]
               for r in query_map()["segment_and_risk"](spark, d).collect()}
    assert out[1] == 0.0                  # == mid → no bump
    assert out[2] == pytest.approx(0.5)   # 0.3 (hv purchase) + 0.2 (mid)
    assert out[3] == pytest.approx(0.5)   # == high → still mid tier
    assert out[4] == pytest.approx(0.8)   # 0.3 + 0.5
    assert out[5] == pytest.approx(0.2)   # signup


def test_classification_hostile_golden(spark):
    """Hand-computed referee for the null semantics the hostile
    certification query (operators/hostile.py) exercises — independent
    of both engines' shared mutation SQL, so a bug in the hostile CTE
    cannot certify itself:

    * NULL customer_id rows form ONE window partition;
    * a purchase with NULL quantity is SKIPPED by the last-purchase
      lookup (a later full return matches the earlier non-null qty);
    * a NULL is_return row falls through every return branch AND does
      not count as a prior purchase;
    * NULL total_amount fails the high-value test (3VL).
    """
    import datetime as dt

    from ecommerce_analytics_spark.operators.classification import (
        classify_events)

    d = [dt.datetime(2024, 1, i) for i in range(1, 6)]
    rows = [
        # NULL-customer partition
        (None, 300, 1, 7, 1, d[0], 5.0, 10.0, 50.0, False, False),
        (None, 301, 1, 7, 1, d[1], 5.0, 10.0, 50.0, True, False),
        (None, 302, 1, 7, 1, d[2], 2.0, 10.0, 20.0, False, False),
        # NULL-quantity purchase must be skipped by the lookup
        (3, 310, 1, 7, 1, d[0], 5.0, 10.0, 50.0, False, False),
        (3, 311, 1, 7, 1, d[1], None, 10.0, 30.0, False, False),
        (3, 312, 1, 7, 1, d[2], 5.0, 10.0, 50.0, True, False),
        # NULL is_return: no return branch, no purchase count
        (4, 320, 1, 7, 1, d[0], 5.0, 10.0, 50.0, None, False),
        (4, 321, 1, 7, 1, d[1], 5.0, 10.0, 50.0, False, False),
        (4, 322, 1, 7, 1, d[2], 5.0, 10.0, None, False, False),
        (4, 323, 1, 7, 1, d[3], 5.0, 10.0, 50.0, True, False),
    ]
    txn = spark.createDataFrame(
        rows, "customer_id long, invoice_no long, line_no int, "
              "stock_code long, supp_id long, invoice_date timestamp, "
              "quantity double, unit_price double, total_amount double, "
              "is_return boolean, is_credit_note boolean")
    got = {r["invoice_no"]: r["event_type"]
           for r in classify_events(txn).collect()}
    assert got == {
        300: "first_purchase",
        301: "full_return",        # NULL-customer history is coherent
        302: "repeat_purchase",
        310: "first_purchase",
        311: "repeat_purchase",    # NULL qty: not bulk, prior = 1
        312: "full_return",        # matched vs 310's qty, 311 SKIPPED
        320: "first_purchase",     # NULL is_return falls through
        321: "first_purchase",     # 320 never counted as a purchase
        322: "repeat_purchase",    # NULL amount fails high-value (3VL)
        323: "full_return",        # 320 excluded from lookup too
    }
