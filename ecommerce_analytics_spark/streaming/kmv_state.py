"""Streaming maintained KMV sketch: cross-batch bottom-k state.

The batch sketch (operators/kmv.py) is mergeable by construction —
the k smallest distinct hashes of a union are computable from the k
smallest of the parts — which makes it streamable with O(K) keyed
state: hold the current minima array per group, set-union each
micro-batch's hashes into it, truncate to K. At every point in time
the state IS the KMV sketch of everything seen so far, so a live
distinct-count estimate per group costs kilobytes of state while the
stream pours in — the continuous twin of the stored-sketch rollup.

Determinism contract: the hash is computed JVM-side with the SAME
column expression as the batch query (kmv_hash), and the state merge
is a pure sorted-set truncation, so after the final micro-batch the
maintained minima equal the batch sketch EXACTLY — element for
element, asserted in tests/test_streaming_kmv.py. Emissions carry
(n_mins, kth_min) rather than the float estimate so the parity
contract stays integer-exact; the estimate is a pure function of
those two ints (operators/kmv.py:_est).

Each emission carries the state's batch counter (`epoch`) so an
append-mode sink consumer (and the parity test) can select the
latest sketch per group.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ecommerce_analytics_spark.operators.kmv import KMV_K, kmv_hash

KMV_OUTPUT_SCHEMA = T.StructType([
    T.StructField("ship_year", T.LongType()),
    T.StructField("n_mins", T.LongType()),
    T.StructField("kth_min", T.LongType()),
    T.StructField("epoch", T.IntegerType()),
])

KMV_STATE_SCHEMA = T.StructType([
    T.StructField("mins", T.ArrayType(T.LongType())),
    T.StructField("epoch", T.IntegerType()),
])


def make_kmv_state_func(k: int = KMV_K):
    """Closure (cloudpickle-by-value; see ltv_state.py rationale)."""

    def kmv_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
        (ship_year,) = key
        if state.exists:
            mins, epoch = state.get
            pool = set(mins)
        else:
            pool, epoch = set(), 0

        for pdf in pdfs:
            pool.update(int(h) for h in pdf["h"])
        mins = sorted(pool)[:k]
        epoch += 1

        state.update((mins, epoch))
        yield pd.DataFrame(
            [(int(ship_year), len(mins), int(mins[-1]), epoch)],
            columns=["ship_year", "n_mins", "kth_min", "epoch"])

    return kmv_state_func


def streaming_kmv_sketch(lineitem: DataFrame, k: int = KMV_K) -> DataFrame:
    """Bind the maintained-sketch processor to a lineitem stream:
    per ship year, a live bottom-k sketch of distinct order keys."""
    prepped = lineitem.select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        kmv_hash("l_orderkey").alias("h"))
    return (prepped.groupBy("ship_year")
            .applyInPandasWithState(
                make_kmv_state_func(k),
                outputStructType=KMV_OUTPUT_SCHEMA,
                stateStructType=KMV_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
