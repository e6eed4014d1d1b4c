"""Streaming growth accounting: per-user day-close new/returning marks.

The batch form (operators/aggregates.q_daily_new_vs_returning) splits
each day's active users into new (first-ever-seen that day) vs
returning. The streaming twin keys state BY USER — the only key under
which "have I seen this user before?" is locally answerable — and
follows the day-close protocol (ewma_state.py): a user's activity day
finalizes when a NEWER day for that user arrives, emitting one
(user_id, day, is_new) mark; the downstream per-day counts are a
stateless aggregation over the marks (done by the consumer/test — the
marks themselves are the reusable surface, the same rows a
personalization pipeline joins on).

State per user: first_day (fixed at the first day ever finalized or
open — the time-ordered replay source guarantees arrival order, the
LTV-twin trust assumption) plus the open-day set. Nothing is
fact-sized: state is O(open days) per user, output one mark per
(user, day).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GROWTH_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("day", T.StringType()),
    T.StructField("is_new", T.BooleanType()),
])

GROWTH_STATE_SCHEMA = T.StructType([
    T.StructField("first_day", T.StringType()),
    T.StructField("open_days", T.ArrayType(T.StringType())),
])


def make_growth_state_func():
    """Closure (cloudpickle-by-value; see ltv_state.py rationale)."""

    def growth_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            first_day, open_days = state.get
            open_set = set(open_days)
        else:
            first_day, open_set = None, set()

        max_day = None
        for pdf in pdfs:
            for d in pdf["day"]:
                open_set.add(d)
            if len(pdf):
                mx = pdf["day"].max()
                if max_day is None or mx > max_day:
                    max_day = mx

        if open_set and first_day is None:
            first_day = min(open_set)

        out = []
        for d in sorted(open_set):
            if max_day is None or d >= max_day:
                continue  # still open — a newer day must arrive first
            open_set.discard(d)
            out.append((user_id, d, d == first_day))

        state.update((first_day, sorted(open_set)))
        yield pd.DataFrame(out, columns=["user_id", "day", "is_new"])

    return growth_state_func


def streaming_new_vs_returning_marks(events: DataFrame) -> DataFrame:
    """Bind the day-close growth processor to an event stream."""
    prepped = events.select(
        "user_id",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
    return (prepped.groupBy("user_id")
            .applyInPandasWithState(
                make_growth_state_func(),
                outputStructType=GROWTH_OUTPUT_SCHEMA,
                stateStructType=GROWTH_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
