"""Streaming online-CUSUM drift detector: keyed day-close state.

The batch form (operators/stats_tests.q_cusum_online_daily) is a
per-type recurrence over exact integer daily cents; this module runs
the IDENTICAL recurrence as cross-batch keyed state, using the
day-close protocol of ewma_state.py (a day finalizes only when a
strictly newer day arrives for that key; the youngest day stays open
in state). The shared ``cusum_calibrate`` / ``cusum_step`` helpers
are the single source of truth for the arithmetic, so stream==batch
parity is parity of plumbing, not of two recurrence copies.

State per event_type:
  - open-day cent sums (a day may span micro-batches);
  - calibration cents collected so far (first CUSUM_CAL finalized
    days — the self-calibration window);
  - after calibration: s7 (calibration total), h (threshold), and
    the running S+ / S- integers.

Nothing here ever divides: the recurrence is scaled by the window
length (D = CAL*x - s7), keeping every state value an exact integer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ecommerce_analytics_spark.operators.stats_tests import CUSUM_CAL

CUSUM_OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("day", T.StringType()),
    T.StructField("rev", T.DoubleType()),
    T.StructField("sp_scaled", T.LongType()),
    T.StructField("sm_scaled", T.LongType()),
    T.StructField("h_scaled", T.LongType()),
    T.StructField("alarm", T.BooleanType()),
])

CUSUM_STATE_SCHEMA = T.StructType([
    T.StructField("open_days", T.ArrayType(T.StringType())),
    T.StructField("open_cents", T.ArrayType(T.LongType())),
    T.StructField("cal_cents", T.ArrayType(T.LongType())),
    T.StructField("s7", T.LongType()),
    T.StructField("h", T.LongType()),
    T.StructField("sp", T.LongType()),
    T.StructField("sm", T.LongType()),
    # Highest day already finalized (the ordered-replay watermark) and
    # a count of contract-violating rows at-or-below it. Without the
    # watermark a late-arriving older day would re-enter the walk as a
    # fresh observation OUT OF ORDER, silently corrupting the
    # recurrence; with it, late rows are dropped, counted, and
    # observable in state instead of lingering or replaying.
    T.StructField("last_final", T.StringType()),
    T.StructField("late_days", T.LongType()),
])


def make_cusum_recurrence():
    """(calibrate, step) as CLOSURES — the single source of truth for
    the detector arithmetic, shared by the batch query and the
    streaming state function. Closures (not module-level functions)
    so cloudpickle ships them BY VALUE into Python workers: an
    external driver's workers don't have this package on their
    sys.path, so a worker-side ``import ecommerce_analytics_spark``
    would fail."""

    def calibrate(cal_cents):
        # (s7, h): target total and 2x the max scaled calibration
        # deviation over the first CUSUM_CAL finalized daily cent sums
        s7 = sum(cal_cents)
        h = 2 * max(abs(CUSUM_CAL * x - s7) for x in cal_cents)
        return s7, h

    def step(sp, sm, x, s7):
        # one exact-integer CUSUM update with D = CAL*x - s7
        d = CUSUM_CAL * x - s7
        return max(0, sp + d), max(0, sm - d)

    return calibrate, step


def make_cusum_state_func():
    """Closure (cloudpickle-by-value; see ltv_state.py rationale)."""

    cusum_calibrate, cusum_step = make_cusum_recurrence()

    def cusum_state_func(key: tuple, pdfs: Iterator[pd.DataFrame],
                         state: GroupState) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            (open_days, open_cents, cal_cents, s7, h, sp, sm,
             last_final, late_days) = state.get
            sums = dict(zip(open_days, open_cents))
            cal = list(cal_cents)
        else:
            sums, cal, s7, h, sp, sm = {}, [], 0, 0, 0, 0
            last_final, late_days = None, 0

        max_day = None
        for pdf in pdfs:
            for d, c in zip(pdf["day"], pdf["cents"]):
                sums[d] = sums.get(d, 0) + int(c)
            if len(pdf):
                mx = pdf["day"].max()
                if max_day is None or mx > max_day:
                    max_day = mx

        # Ordered-replay contract enforcement: a day at-or-below the
        # finalization watermark was already fed to the recurrence —
        # replaying it out of order would corrupt sp/sm. Drop + count.
        if last_final is not None:
            stale = [d for d in sums if d <= last_final]
            for d in stale:
                sums.pop(d)
            late_days += len(stale)

        out = []
        for d in sorted(sums):
            if max_day is None or d >= max_day:
                continue  # still open
            x = sums.pop(d)
            last_final = d
            if len(cal) < CUSUM_CAL:
                cal.append(x)
                if len(cal) == CUSUM_CAL:
                    s7, h = cusum_calibrate(cal)
                continue  # calibration days emit nothing (batch parity)
            sp, sm = cusum_step(sp, sm, x, s7)
            out.append((event_type, d, float(x) / 100.0, sp, sm, h,
                        sp > h or sm > h))

        state.update((sorted(sums), [sums[d] for d in sorted(sums)],
                      cal, s7, h, sp, sm, last_final, late_days))
        yield pd.DataFrame(out, columns=[
            "event_type", "day", "rev", "sp_scaled", "sm_scaled",
            "h_scaled", "alarm"])

    return cusum_state_func


def streaming_cusum_daily_revenue(events: DataFrame) -> DataFrame:
    """Bind the day-close CUSUM detector to an event stream."""
    from ecommerce_analytics_spark.numerics import cents

    prepped = events.select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        cents("value").alias("cents"))
    return (prepped.groupBy("event_type")
            .applyInPandasWithState(
                make_cusum_state_func(),
                outputStructType=CUSUM_OUTPUT_SCHEMA,
                stateStructType=CUSUM_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
