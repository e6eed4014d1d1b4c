"""Streaming Holt-Winters twin: day-close keyed state with gap fill.

The batch form (operators/timeseries.q_holt_winters_daily_revenue)
runs the additive seasonal recurrence over each type's dense
zero-filled calendar spine (per-type bounds). Streaming it adds two
ideas on top of the ewma_state day-close protocol:

* **gap zero-fill in state**: when a newer day arrives, every
  calendar day between the last finalized day and the batch's max
  day finalizes — including absent ones, which finalize with x = 0,
  exactly the zeros the batch spine injects. The walk is driven by
  a date cursor carried in state, so a day gap spanning micro-batch
  boundaries fills identically to one inside a batch.
* **phase change in state**: the first HW_PERIOD finalized days are
  the seed window (emitting nothing, like the batch); the seed and
  every later update run through the SAME closure pair
  (``make_hw_recurrence``) the batch query embeds, so parity is
  parity of plumbing, not of two recurrence copies. Closures ship
  by value to workers (see cusum_state.py — an external driver's
  workers cannot import this package).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import date, timedelta

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HW_PERIOD = 7  # weekly seasonality (single source for batch import)

HW_OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("day", T.StringType()),
    T.StructField("rev", T.DoubleType()),
    T.StructField("lvl", T.DoubleType()),
    T.StructField("trend", T.DoubleType()),
    T.StructField("season", T.DoubleType()),
    T.StructField("forecast_next", T.DoubleType()),
])

HW_STATE_SCHEMA = T.StructType([
    T.StructField("open_days", T.ArrayType(T.StringType())),
    T.StructField("open_cents", T.ArrayType(T.LongType())),
    T.StructField("cursor", T.StringType()),      # next day to finalize
    T.StructField("cal_cents", T.ArrayType(T.LongType())),
    T.StructField("lvl", T.DoubleType()),
    T.StructField("trend", T.DoubleType()),
    T.StructField("sarr", T.ArrayType(T.DoubleType())),
    T.StructField("seeded", T.BooleanType()),
    # Count of input rows that violated the time-ordered replay
    # contract (day < finalization cursor). Such rows can never be
    # folded into an already-finalized day; they are dropped HERE,
    # counted, and never linger in state — without this they would sit
    # in `sums` forever (the cursor walk never revisits finalized
    # days), silently inflating state while never reaching output.
    T.StructField("late_days", T.LongType()),
])


def make_hw_recurrence():
    """(seed, step) closures — the single source of truth for the
    additive Holt-Winters arithmetic (alpha=beta=gamma=0.5), shared
    by the batch applyInPandas query and the streaming state func."""
    period = HW_PERIOD

    def seed(cal_cents):
        # level = exact-integer-cents week-1 mean (one division),
        # trend = 0, season_i = x_i - level
        xs = [float(c) / 100.0 for c in cal_cents]
        lvl = float(sum(cal_cents)) / 100.0 / float(period)
        return lvl, 0.0, [x - lvl for x in xs]

    def step(lvl, trend, sarr, x):
        # returns (lvl', trend', sarr', season, forecast_next)
        s_old, l_prev, b_prev = sarr[0], lvl, trend
        lvl = 0.5 * (x - s_old) + 0.5 * (l_prev + b_prev)
        trend = 0.5 * (lvl - l_prev) + 0.5 * b_prev
        s_new = 0.5 * (x - l_prev - b_prev) + 0.5 * s_old
        sarr = sarr[1:] + [s_new]
        return lvl, trend, sarr, s_new, lvl + trend + sarr[0]

    return seed, step


def make_hw_state_func():
    """Closure (cloudpickle-by-value; see ltv_state.py rationale)."""
    seed, step = make_hw_recurrence()
    period = HW_PERIOD

    def hw_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            (open_days, open_cents, cursor, cal, lvl, trend, sarr,
             seeded, late_days) = state.get
            sums = dict(zip(open_days, open_cents))
            cal, sarr = list(cal), list(sarr)
        else:
            sums, cursor, cal = {}, None, []
            lvl, trend, sarr, seeded = 0.0, 0.0, [], False
            late_days = 0

        max_day = None
        for pdf in pdfs:
            for d, c in zip(pdf["day"], pdf["cents"]):
                sums[d] = sums.get(d, 0) + int(c)
            if len(pdf):
                mx = pdf["day"].max()
                if max_day is None or mx > max_day:
                    max_day = mx

        # Ordered-replay contract enforcement: a day strictly below the
        # finalization cursor was already finalized — drop it from the
        # open sums and count it, so the violation is observable in
        # state (late_days) instead of silently leaking entries.
        if cursor is not None:
            stale = [d for d in sums if d < cursor]
            for d in stale:
                sums.pop(d)
            late_days += len(stale)

        out = []
        if max_day is not None:
            if cursor is None and sums:
                cursor = min(sums)  # the type's own spine start
            while cursor is not None and cursor < max_day:
                x_cents = sums.pop(cursor, 0)  # absent day -> zero fill
                if not seeded:
                    cal.append(x_cents)
                    if len(cal) == period:
                        lvl, trend, sarr = seed(cal)
                        seeded = True
                else:
                    x = float(x_cents) / 100.0
                    lvl, trend, sarr, season, fc = step(
                        lvl, trend, sarr, x)
                    out.append((event_type, cursor, x, lvl, trend,
                                season, fc))
                d = date.fromisoformat(cursor) + timedelta(days=1)
                cursor = d.isoformat()

        state.update((sorted(sums), [sums[d] for d in sorted(sums)],
                      cursor, cal, lvl, trend, sarr, seeded, late_days))
        yield pd.DataFrame(out, columns=[
            "event_type", "day", "rev", "lvl", "trend", "season",
            "forecast_next"])

    return hw_state_func


def streaming_holt_winters_daily_revenue(events: DataFrame) -> DataFrame:
    """Bind the day-close Holt-Winters processor to an event stream."""
    from ecommerce_analytics_spark.numerics import cents

    prepped = events.select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        cents("value").alias("cents"))
    return (prepped.groupBy("event_type")
            .applyInPandasWithState(
                make_hw_state_func(),
                outputStructType=HW_OUTPUT_SCHEMA,
                stateStructType=HW_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
