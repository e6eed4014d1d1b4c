"""Streaming first-order Markov transitions (markov.py twin).

Per-user keyed state holds only the LAST event type; each arriving
event emits one (prev_type, next_type) pair and updates the state —
the streaming side of operators/markov.q_event_transition_matrix. The
pair stream aggregates to the transition matrix with a plain groupBy,
so the counts are mergeable across micro-batches for the same reason
the CMS cells are: integer sums over a pure per-event pair emission.

Parity contract (test_streaming_transitions.py): the pair multiset
emitted across ANY micro-batch split equals the batch lag-window's —
state carries the boundary event across batches, which is exactly
what the window's lag does within one frame. Per-user in-batch order
is (ts, event_id), matching the batch window's ORDER BY.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAIR_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("prev_type", T.StringType()),
    T.StructField("next_type", T.StringType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("last_type", T.StringType()),
])


def make_transition_state_func():
    """Closure (pickled by value — see ltv_state.make_ltv_state_func)."""

    def transition_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                              state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last = state.get[0] if state.exists else None
        prevs: list[str] = []
        nexts: list[str] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for et in pdf["event_type"]:
                if last is not None:
                    prevs.append(last)
                    nexts.append(et)
                last = et
        state.update((last,))
        if prevs:
            yield pd.DataFrame({"user_id": user_id,
                                "prev_type": prevs,
                                "next_type": nexts})

    return transition_state_func


def streaming_transition_pairs(events: DataFrame) -> DataFrame:
    """(user_id, prev_type, next_type) pair stream; aggregate with a
    plain groupBy(prev_type, next_type).count() downstream."""
    return (events
            .select("user_id", "event_id", "ts", "event_type")
            .groupBy("user_id")
            .applyInPandasWithState(
                make_transition_state_func(),
                outputStructType=PAIR_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
