"""The serialized event document parses back losslessly (P12 ingest
side of the S3/S4 edge): from_json(to_json(event)) == event fields."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.events_json import (
    q_retail_events_json)

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy

SF = "/root/testdata/sf0.001"

EVENT_SCHEMA = ("event_id string, event_type string, user_id string, "
                "timestamp string, metadata struct<invoice_no: bigint, "
                "stock_code: bigint, quantity: bigint, "
                "unit_price_cents: bigint, total_amount_cents: bigint, "
                "is_return: boolean, customer_type: string, "
                "season: string>")


def test_event_json_roundtrips_losslessly(spark):
    docs = q_retail_events_json(spark, SF)
    parsed = docs.select(
        "event_id", "event_json",
        F.from_json("event_json", EVENT_SCHEMA).alias("e"))
    bad = parsed.filter(
        F.col("e").isNull()
        | (F.col("e.event_id") != F.col("event_id"))
        | F.col("e.metadata.total_amount_cents").isNull()
        | ~F.col("e.event_type").isin(
            "credit_note_return", "full_return", "partial_return",
            "first_purchase", "bulk_purchase", "high_value_purchase",
            "repeat_purchase")
        | ~F.col("e.metadata.season").isin(
            "holiday", "spring", "summer", "fall")
        | (F.substring("e.user_id", 1, 9) != "customer_"))
    assert bad.count() == 0
    # re-serializing the parsed struct reproduces the document exactly
    # (compared in-row: event_id is NOT unique — same part can repeat
    # across an order's lines)
    reser = parsed.filter(F.to_json("e") != F.col("event_json"))
    assert reser.count() == 0
