"""Event replay with time compression (T3, event_simulator.py:129-249).

The reference replays a historical event file into Kafka with
inter-event gaps divided by a compression factor and a ``simulation``
struct stamped on each event (event_simulator.py:171-191). Here the
engine-relevant semantics — compressed timeline computation and the
simulation metadata (P11 nested struct) — are DataFrame expressions;
delivery is whatever sink the caller attaches (Kafka via
sources/kafka.py, file micro-batches in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ISO = "yyyy-MM-dd'T'HH:mm:ss"


def compress_timeline(events: DataFrame, compression_factor: int = 1000,
                      start_at: str | None = None) -> DataFrame:
    """Map event time onto a compressed replay timeline.

    replay_ts(i) = start + (ts(i) - ts(0)) / compression_factor, with
    the original ordering preserved (global time order — the simulator
    sorts before replay, event_simulator.py:147). Adds the
    ``simulation`` struct of the reference schema (§1.3).
    """
    base = F.coalesce(F.lit(start_at).cast("timestamp"),
                      F.min("ts").over(Window.partitionBy()))
    offset_us = (F.unix_micros("ts")
                 - F.unix_micros(F.min("ts").over(Window.partitionBy())))
    replay_ts = F.timestamp_micros(
        F.unix_micros(base)
        + (offset_us / F.lit(compression_factor)).cast("long"))
    return events.withColumn("replay_ts", replay_ts).withColumn(
        "simulation",
        F.struct(
            F.date_format("ts", ISO).alias("original_timestamp"),
            F.date_format(replay_ts, ISO).alias("simulated_timestamp"),
            F.lit(compression_factor).alias("compression_factor"),
        ))


def replay_stats(events: DataFrame, compression_factor: int = 1000) -> DataFrame:
    """The simulator's logged throughput facts (event_simulator.py:150-161)
    as a one-row aggregate: span, compressed duration, events/sec."""
    span_s = ((F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts")))
              / 1000.0)
    compressed_s = span_s / compression_factor
    return events.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(span_s, 3).alias("span_seconds"),
        F.round(compressed_s, 3).alias("compressed_seconds"),
        F.round(F.count(F.lit(1)) / compressed_s, 3)
        .alias("events_per_second"),
    )
