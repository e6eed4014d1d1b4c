"""Streaming PSI drift monitor (operators/psi_drift.py twin).

Production drift monitoring is a streaming problem: the reference
histogram is frozen (the training/launch period), the ACTUAL
histogram accumulates as events arrive, and the monitor re-scores PSI
at every micro-batch close. State is one counter per (feature, bin) —
O(bins), not O(events): keyed applyInPandasWithState over the SAME
``binned_features`` projection the batch query uses (shared code, so
stream and batch bin identically by construction).

Each batch, every updated key emits its cumulative count stamped with
a per-key epoch; the monitor's current actual histogram is the
latest-epoch row per key (the [[kmv_state]]/[[sample_state]]
append-sink convention), joined against the frozen reference counts
and pushed through the shared ``psi_from_counts`` — so at stream end
the emitted PSI is BIT-IDENTICAL to the batch query on the same
split. Asserted (including the cross-batch-split invariance) in
tests/test_streaming_psi.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNT_SCHEMA = T.StructType([
    T.StructField("feature", T.StringType()),
    T.StructField("bin", T.StringType()),
    T.StructField("cum_n", T.LongType()),
    T.StructField("epoch", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("cum_n", T.LongType()),
    T.StructField("epoch", T.LongType()),
])


def make_psi_state_func():
    """Closure (pickled by value — see ltv_state.make_ltv_state_func)."""

    def psi_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        feature, bin_ = key
        cum, epoch = state.get if state.exists else (0, 0)
        n = sum(len(pdf) for pdf in pdfs)
        cum += n
        epoch += 1
        state.update((cum, epoch))
        yield pd.DataFrame({"feature": [feature], "bin": [bin_],
                            "cum_n": [cum], "epoch": [epoch]})

    return psi_state_func


def streaming_actual_counts(binned: DataFrame) -> DataFrame:
    """binned = streaming (feature, bin, ...) rows from
    ``binned_features``; returns the per-key cumulative count stream."""
    return (binned
            .groupBy("feature", "bin")
            .applyInPandasWithState(
                make_psi_state_func(),
                outputStructType=COUNT_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
