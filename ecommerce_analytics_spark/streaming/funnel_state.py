"""Keyed-state streaming twins of the funnel and cohort queries (T2).

The batch `conversion_funnel` / `weekly_cohort_retention`
(operators/funnels.py) are one-shot aggregates; the reference's
premise is continuously-maintained materialized views (init-db.js
pre-created collections fed by a long-running job). These twins
re-bind both as ``applyInPandasWithState`` processors so the SAME
semantics hold incrementally across micro-batches, mirroring the
LTV/quantile-sketch parity harness (ltv_state.py).

Semantics contract (identical to the LTV twin's):
- events within each micro-batch are processed in (ts, event_id)
  order per user;
- state carries across micro-batches;
- cross-batch arrival order is trusted (the reference is a
  processing-time job); the batch formulation is the event-time
  ground truth. Under time-ordered arrival the online updates below
  are EXACTLY the batch conditional-min / min-week semantics, which
  the parity test asserts row-for-row.

Why the funnel folds online: processing a user's events in time
order, "first view" is the min view time, and the first click seen
with ts strictly after the frozen t1 is precisely min(click_ts >
t1) — later clicks can only be larger. The same argument chains to
t3. State is three scalars per user (|users| rows cluster-wide, hash
partitioned — the Flink ValueState shape, EnrichmentFunction.java).

Why cohort emits are append-safe: in time order, a user's first-seen
week is frozen at their first event, so each newly seen (user, week)
pair can be emitted exactly once with its final cohort label; the
retention triangle is then a pure aggregation over the emitted pairs.
State is the cohort week + the weeks already emitted (bounded by the
calendar, not the event count).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("t1_us", T.LongType()),
    T.StructField("t2_us", T.LongType()),
    T.StructField("t3_us", T.LongType()),
    T.StructField("n_seen", T.LongType()),
])

FUNNEL_STATE_SCHEMA = T.StructType([
    T.StructField("t1_us", T.LongType()),
    T.StructField("t2_us", T.LongType()),
    T.StructField("t3_us", T.LongType()),
    T.StructField("n_seen", T.LongType()),
])

FUNNEL_STEPS = ("view", "click", "purchase")


def make_funnel_state_func(steps: tuple[str, str, str] = FUNNEL_STEPS):
    """Closure (pickled by value — see ltv_state.make_ltv_state_func)."""

    def funnel_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        t1, t2, t3, n_seen = (state.get if state.exists
                              else (None, None, None, 0))
        # concat the key's chunks BEFORE sorting: a chunk-local sort
        # would not be the batch-global (ts, event_id) order the
        # contract requires
        pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        for typ, ts in zip(pdf["event_type"], pdf["ts_us"]):
            ts = int(ts)
            if typ == steps[0]:
                if t1 is None:
                    t1 = ts
            elif typ == steps[1]:
                if t1 is not None and ts > t1 and t2 is None:
                    t2 = ts
            elif typ == steps[2]:
                if t2 is not None and ts > t2 and t3 is None:
                    t3 = ts
        n_seen += len(pdf)
        state.update((t1, t2, t3, n_seen))
        yield pd.DataFrame({"user_id": [user_id], "t1_us": [t1],
                            "t2_us": [t2], "t3_us": [t3],
                            "n_seen": [n_seen]})

    return funnel_state_func


def streaming_funnel(events: DataFrame) -> DataFrame:
    """Per-user funnel step times, maintained incrementally. Emits one
    row per user per micro-batch with the current (t1, t2, t3) in
    epoch-micros; the global funnel row is a trivial aggregate over
    the latest per-user states (the materialized-view read path)."""
    return (
        events.select("user_id", "event_id", "event_type",
                      F.unix_micros("ts").alias("ts_us"))
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_state_func(),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


COHORT_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("cohort_week", T.StringType()),
    T.StructField("active_week", T.StringType()),
])

COHORT_STATE_SCHEMA = T.StructType([
    T.StructField("cohort_week", T.StringType()),
    T.StructField("seen_weeks", T.ArrayType(T.StringType())),
])


def make_cohort_state_func():
    """Closure (pickled by value). Emits each (user, active_week) pair
    exactly once, labeled with the user's frozen cohort week."""

    def cohort_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                          state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cohort, seen = (state.get if state.exists else (None, []))
        seen = list(seen) if seen is not None else []
        pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
        new_weeks = []
        for wk in pdf["week"]:
            if cohort is None:
                cohort = wk
            if wk not in seen:
                seen.append(wk)
                new_weeks.append(wk)
        state.update((cohort, seen))
        if new_weeks:
            yield pd.DataFrame({
                "user_id": user_id,
                "cohort_week": cohort,
                "active_week": new_weeks,
            })

    return cohort_state_func


def streaming_cohort_pairs(events: DataFrame) -> DataFrame:
    """Distinct (user, cohort_week, active_week) pairs, maintained
    incrementally — the compact table the retention triangle
    aggregates over (same shape as funnels.q_weekly_cohort_retention's
    `pairs`). Week truncation happens Spark-side so the Python state
    processor only compares strings."""
    return (
        events.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"),
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd")
            .alias("week"))
        .groupBy("user_id")
        .applyInPandasWithState(
            make_cohort_state_func(),
            outputStructType=COHORT_OUTPUT_SCHEMA,
            stateStructType=COHORT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
