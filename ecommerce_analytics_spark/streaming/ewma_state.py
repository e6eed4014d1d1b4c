"""Streaming EWMA twin: day-close semantics with cross-batch state.

The batch formulation (operators/timeseries.q_ewma_daily_revenue)
pre-aggregates to exact integer-cent daily sums and then runs the
s_t = 0.5·x_t + 0.5·s_{t-1} recurrence. Streaming it needs one more
idea: a day's sum isn't final until a NEWER day arrives (the
time-ordered replay source guarantees per-batch time order, the same
arrival-order trust the LTV twin documents). State per event_type:

  - open day cent-sums (a day may span micro-batches);
  - the last finalized EWMA.

Each micro-batch folds its rows into the open-day sums, then
finalizes every open day strictly older than the batch's max day —
in day order — emitting (day, rev, ewma) rows. The still-open
youngest day stays in state, so the stream's cumulative output
equals the batch EWMA restricted to all-but-the-last day per type:
exactly what test_streaming_ewma.py asserts, value-identical because
both sides run the identical IEEE expression over identical exact
daily sums.

This is the aggregate-then-state shape: the recurrence state is
days × types, never fact-sized; the heavy lifting (per-day sums)
stays in Spark's own aggregation inside each batch group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("day", T.StringType()),
    T.StructField("rev", T.DoubleType()),
    T.StructField("ewma", T.DoubleType()),
])

# state: parallel arrays of open days + cent sums, last ewma, have_ewma,
# plus the ordered-replay watermark (highest finalized day) and a count
# of contract-violating late rows dropped at-or-below it (see
# cusum_state.py — replaying an older day out of order would corrupt
# the recurrence; dropping silently would leak state unobservably).
EWMA_STATE_SCHEMA = T.StructType([
    T.StructField("open_days", T.ArrayType(T.StringType())),
    T.StructField("open_cents", T.ArrayType(T.LongType())),
    T.StructField("last_ewma", T.DoubleType()),
    T.StructField("has_ewma", T.BooleanType()),
    T.StructField("last_final", T.StringType()),
    T.StructField("late_days", T.LongType()),
])


def make_ewma_state_func():
    """Closure (cloudpickle-by-value; see ltv_state.py rationale)."""

    def ewma_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                        state: GroupState) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            (open_days, open_cents, last_ewma, has_ewma,
             last_final, late_days) = state.get
            sums = dict(zip(open_days, open_cents))
        else:
            sums, last_ewma, has_ewma = {}, 0.0, False
            last_final, late_days = None, 0

        max_day = None
        for pdf in pdfs:
            # cents are computed JVM-side (numerics-identical rounding);
            # Python only sums exact integers
            for d, c in zip(pdf["day"], pdf["cents"]):
                sums[d] = sums.get(d, 0) + int(c)
            if len(pdf):
                mx = pdf["day"].max()
                if max_day is None or mx > max_day:
                    max_day = mx

        # Ordered-replay contract: drop + count days already finalized
        # (they would otherwise replay out of order through the EWMA).
        if last_final is not None:
            stale = [d for d in sums if d <= last_final]
            for d in stale:
                sums.pop(d)
            late_days += len(stale)

        out = []
        for d in sorted(sums):
            if max_day is None or d >= max_day:
                continue  # still open — a newer day must arrive first
            rev = float(sums.pop(d)) / 100.0
            last_ewma = rev if not has_ewma else 0.5 * rev + 0.5 * last_ewma
            has_ewma = True
            last_final = d
            out.append((event_type, d, rev, last_ewma))

        state.update((sorted(sums), [sums[d] for d in sorted(sums)],
                      last_ewma, has_ewma, last_final, late_days))
        yield pd.DataFrame(out, columns=["event_type", "day",
                                         "rev", "ewma"])

    return ewma_state_func


def streaming_ewma_daily_revenue(events: DataFrame) -> DataFrame:
    """Bind the day-close EWMA processor to an event stream."""
    from ecommerce_analytics_spark.numerics import cents

    prepped = events.select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        cents("value").alias("cents"))
    return (prepped.groupBy("event_type")
            .applyInPandasWithState(
                make_ewma_state_func(),
                outputStructType=EWMA_OUTPUT_SCHEMA,
                stateStructType=EWMA_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
