"""Streaming weighted sample: cross-batch maintained A-ES top-K.

The batch sampler (operators/weighted_sample.py) ranks every row by
the Efraimidis–Spirakis key ln(u)/w and keeps the top-K per group.
That key makes the sample STREAMABLE with O(K) state: the top-K of a
union is computable from the top-K of the parts, so a keyed state
holding the current K best (key, doc) pairs, merged with each
micro-batch's rows, maintains — at every point in time — exactly the
weighted sample-without-replacement of everything seen so far. This
is the streaming reservoir a training pipeline keeps per language
while documents pour in.

Determinism contract: the ranking key is computed JVM-side with the
SAME column expression as the batch query (content-hash uniform +
ln), so batch and stream see bit-identical doubles; the state merge
is a pure sort. After the final micro-batch the emitted sample is
row-identical to the batch formulation over the same rows —
asserted in tests/test_streaming_sample.py.

Each emission carries the state's batch counter (`epoch`) so
downstream consumers (and the parity test) can select the latest
sample per group from an append-mode sink.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ecommerce_analytics_spark.operators.weighted_sample import _KEY_SQL, K

SAMPLE_OUTPUT_SCHEMA = T.StructType([
    T.StructField("lang", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("rk", T.IntegerType()),
    T.StructField("epoch", T.IntegerType()),
])

SAMPLE_STATE_SCHEMA = T.StructType([
    T.StructField("keys", T.ArrayType(T.DoubleType())),
    T.StructField("doc_ids", T.ArrayType(T.LongType())),
    T.StructField("n_chars", T.ArrayType(T.LongType())),
    T.StructField("epoch", T.IntegerType()),
])


def make_sample_state_func(k: int = K):
    """Closure (cloudpickle-by-value; see ltv_state.py rationale)."""

    def sample_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
        (lang,) = key
        if state.exists:
            keys, doc_ids, chars, epoch = state.get
            pool = list(zip(keys, doc_ids, chars))
        else:
            pool, epoch = [], 0

        for pdf in pdfs:
            pool.extend(zip(pdf["key"], pdf["doc_id"], pdf["n_chars"]))
        # top-K by (key desc, doc_id asc) — the batch ordering exactly
        pool.sort(key=lambda t: (-t[0], t[1]))
        pool = pool[:k]
        epoch += 1

        state.update(([t[0] for t in pool], [int(t[1]) for t in pool],
                      [int(t[2]) for t in pool], epoch))
        yield pd.DataFrame(
            [(lang, int(d), int(c), i + 1, epoch)
             for i, (_, d, c) in enumerate(pool)],
            columns=["lang", "doc_id", "n_chars", "rk", "epoch"])

    return sample_state_func


def streaming_weighted_sample(docs: DataFrame, k: int = K) -> DataFrame:
    """Bind the maintained-sample processor to a documents stream."""
    prepped = docs.select(
        "lang", F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.expr(_KEY_SQL).alias("key"))
    return (prepped.groupBy("lang")
            .applyInPandasWithState(
                make_sample_state_func(k),
                outputStructType=SAMPLE_OUTPUT_SCHEMA,
                stateStructType=SAMPLE_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
