"""Streaming Markov transitions == batch lag window, with state
carrying the boundary event across micro-batches."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_streaming_transitions_match_batch(spark, sf_dir,
                                           events_stream_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.streaming.transition_state import (
        streaming_transition_pairs,
    )
    from ecommerce_analytics_spark.streaming.windows import (
        streaming_events,
    )

    # one file per trigger: users whose events span both files only
    # produce the boundary pair if state carries their last type over
    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    pairs = streaming_transition_pairs(stream)
    q = (pairs.writeStream.format("memory")
         .queryName("transition_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = Counter(
        (r["prev_type"], r["next_type"])
        for r in spark.sql("SELECT * FROM transition_stream").collect())

    batch = query_map()["event_transition_matrix"](spark, sf_dir)
    want = {(r["prev_type"], r["next_type"]): r["n_transitions"]
            for r in batch.collect()}
    assert got == Counter(want)
    assert sum(want.values()) > 0

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
