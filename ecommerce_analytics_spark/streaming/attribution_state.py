"""Streaming journey hops (operators/attribution.py twin).

Attribution's input is the (src, dst) journey-hop multiset; this
maintains it over the live event stream with per-USER keyed state —
the growth_state day-close protocol: forward hops (prev -> state,
START -> first, truncated at first purchase -> CONV) emit
IMMEDIATELY; the terminal "-> NULL" closure of a non-converted day
emits when a NEWER day arrives for that user (the only point the day
is provably over). The user's currently-open day therefore has its
forward hops already emitted but its NULL closure pending — exactly
the rows the parity test excludes, mirroring
tests/test_streaming_growth.py.

State per user: (open_day, last_state, converted) — O(1), never
fact-sized. Downstream, the emitted hops feed the SAME
``attribution_from_hops`` the batch query uses, so on any finalized
prefix the streaming attribution is bit-identical to batch
attribution over the same journeys (asserted in
tests/test_streaming_attribution.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HOP_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("day", T.StringType()),
    T.StructField("src", T.StringType()),
    T.StructField("dst", T.StringType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("open_day", T.StringType()),
    T.StructField("last_state", T.StringType()),
    T.StructField("converted", T.BooleanType()),
])

CONV_TYPE = "purchase"


def make_attribution_state_func():
    """Closure (cloudpickle-by-value; see ltv_state.py rationale)."""

    def hop_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            open_day, last, converted = state.get
        else:
            open_day, last, converted = None, None, False

        days: list[str] = []
        srcs: list[str] = []
        dsts: list[str] = []

        def emit(day: str, src: str, dst: str) -> None:
            days.append(day)
            srcs.append(src)
            dsts.append(dst)

        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for day, et in zip(pdf["day"], pdf["event_type"]):
                if open_day is not None and day > open_day:
                    if not converted:
                        emit(open_day, last, "NULL")
                    open_day, last, converted = None, None, False
                if open_day is None:
                    open_day, last, converted = day, "START", False
                if converted:
                    continue  # batch truncates after first purchase
                st = "CONV" if et == CONV_TYPE else et
                emit(open_day, last, st)
                last = st
                if st == "CONV":
                    converted = True

        state.update((open_day, last, converted))
        if srcs:
            yield pd.DataFrame({"user_id": user_id, "day": days,
                                "src": srcs, "dst": dsts})

    return hop_state_func


def streaming_journey_hops(events: DataFrame) -> DataFrame:
    """events = streaming frame with (user_id, ts, event_id,
    event_type); returns the live journey-hop stream."""
    from pyspark.sql import functions as F

    keyed = events.select(
        "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "ts", "event_id", "event_type")
    return (keyed.groupBy("user_id")
            .applyInPandasWithState(
                make_attribution_state_func(),
                outputStructType=HOP_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
