"""Per-key arbitrary state: streaming running LTV (T2, A5 streaming twin).

The Flink EnrichmentFunction keeps one Double of ValueState per user
and read-modify-writes it per event (EnrichmentFunction.java:18-27,
70-130). Spark equivalent: ``applyInPandasWithState`` — grouped
Arrow batches + a GroupState holding the running total.

Semantics contract (parity-tested against the batch window
formulation in operators/events_enrichment.q_ltv_running):
- events within each micro-batch are processed in (ts, event_id)
  order per user;
- state carries across micro-batches;
- like the reference (processing-time job), cross-batch arrival
  order is trusted — the batch window formulation is the event-time
  ground truth (SURVEY §2.6 T5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LTV_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("signed_amount", T.DoubleType()),
    T.StructField("customer_ltv", T.DoubleType()),
])

LTV_STATE_SCHEMA = T.StructType([
    T.StructField("ltv", T.DoubleType()),
])


def make_ltv_state_func():
    """Build the state processor as a closure: cloudpickle serializes it
    by VALUE, so executors never need this package importable (a
    module-level function pickles by reference and breaks when the
    driver runs from outside the repo)."""

    def _signed(row_type: str, value: float) -> float:
        # EnrichmentFunction.java:70-130: purchases add, returns
        # subtract abs(amount), everything else carries the value.
        if row_type == "purchase":
            return float(value)
        if row_type == "error":  # return analog in the driver domain
            return -abs(float(value))
        return 0.0

    def ltv_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ltv = state.get[0] if state.exists else 0.0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            signed = [_signed(t, v)
                      for t, v in zip(pdf["event_type"], pdf["value"])]
            running = []
            for s in signed:
                ltv += s
                running.append(ltv)
            yield pd.DataFrame({
                "user_id": user_id,
                "event_id": pdf["event_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "event_type": pdf["event_type"].to_numpy(),
                "signed_amount": signed,
                "customer_ltv": running,
            })
        state.update((ltv,))

    return ltv_state_func


def streaming_ltv(events: DataFrame) -> DataFrame:
    """T1+T2: hash-partition by user (the keyBy at
    RealTimeAnalytics.java:86) + per-key state processor."""
    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_ltv_state_func(),
            outputStructType=LTV_OUTPUT_SCHEMA,
            stateStructType=LTV_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
