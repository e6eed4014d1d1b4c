"""Streaming near-dup ingestion gate (N1 streaming twin, T2 surface).

A 100 TB ingestion pipeline wants the dedup DECISION at ingest time:
the first document with a signature passes, every later arrival is
flagged with the canonical doc it duplicates. Spark's
``dropDuplicates`` can only keep-or-drop; this gate EMITS every row
with its verdict — ``applyInPandasWithState`` keyed by the signature,
one long of state (the canonical doc id) per signature ever seen,
carried across micro-batches.

The signature is pluggable (any deterministic column): the tests run
it with the exact content hash (md5 — the streaming twin of
``dedup_exact``) and with the per-row SimHash fold below, which is
provably identical to the batch explode+groupBy signature of
``dedup_simhash`` (integer ±1 sums are associative, so a per-row fold
over the token array and a distributed sum over exploded tokens
produce the same sums, hence the same sign bits — asserted doc-by-doc
in the test).

Scale shape: state is one (signature → long) entry per DISTINCT
signature, hash-partitioned by signature; the gate is one shuffle of
(doc_id, sig) pairs per micro-batch. Cites the reference's streaming
enrichment pattern (EnrichmentFunction.java:18-27) — same keyed
ValueState contract, different domain.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GATE_OUTPUT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sig", T.StringType()),
    T.StructField("is_first", T.BooleanType()),
    T.StructField("canonical_doc_id", T.LongType()),
])

GATE_STATE_SCHEMA = T.StructType([
    T.StructField("canonical", T.LongType()),
])

# Per-row 16-bit SimHash: fold the token array into 16 running ±1 sums
# (bit j of md5(token) votes), sign-pack to the same '0'/'1' string the
# batch dedup_simhash signature uses. Integer addition is associative,
# so this equals the exploded groupBy sums bit-for-bit.
SIMHASH_ROW_SQL = (
    "aggregate(split(text, ' '), "
    " array_repeat(0, 16), "
    " (acc, tok) -> zip_with(acc, transform(sequence(1, 16), "
    "   j -> CASE WHEN (instr('0123456789abcdef', substring(md5(tok), j, 1)) - 1) % 2 = 1 "
    "        THEN 1 ELSE -1 END), "
    "   (a, b) -> a + b), "
    " acc -> concat_ws('', transform(acc, s -> IF(s > 0, '1', '0'))))"
)


def simhash_row() -> Column:
    """16-bit SimHash of the ``text`` column as a per-row expression."""
    return F.expr(SIMHASH_ROW_SQL)


def make_gate_func():
    """Closure (cloudpickle by value — same reason as ltv_state)."""

    def gate(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (sig,) = key
        canonical = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            firsts, canons = [], []
            for d in pdf["doc_id"]:
                if canonical is None:
                    canonical = int(d)
                    firsts.append(True)
                else:
                    firsts.append(False)
                canons.append(canonical)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "sig": sig,
                "is_first": firsts,
                "canonical_doc_id": canons,
            })
        if canonical is not None:
            state.update((int(canonical),))

    return gate


def streaming_neardup_gate(docs: DataFrame, sig: Column) -> DataFrame:
    """Gate a document stream on any deterministic signature column."""
    return (
        docs.select("doc_id", sig.alias("sig"))
        .groupBy("sig")
        .applyInPandasWithState(
            make_gate_func(),
            outputStructType=GATE_OUTPUT_SCHEMA,
            stateStructType=GATE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
