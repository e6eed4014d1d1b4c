"""Ordered-replay contract enforcement in the day-close state twins.

The ewma/cusum/hw streaming twins assume time-ordered replay (a day
finalizes when a strictly newer day arrives). ADVICE r5: if a
micro-batch ever violates that — a day older than the finalization
watermark arrives — the old behavior either leaked the entry in keyed
state forever (hw: the cursor walk never revisits it) or, worse,
replayed it through the recurrence OUT OF ORDER (ewma/cusum: the walk
re-finalizes any sums key < max_day). These tests drive the state
functions directly with a fake GroupState and assert late rows are
(a) dropped from output, (b) dropped from state (no leak), and
(c) counted in the state's late_days field (observable).
"""

from __future__ import annotations

import pandas as pd


class FakeGroupState:
    """Minimal applyInPandasWithState GroupState stand-in."""

    def __init__(self):
        self._tuple = None

    @property
    def exists(self):
        return self._tuple is not None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = tuple(t)


def _run(func, state, days_cents):
    pdf = pd.DataFrame(days_cents, columns=["day", "cents"])
    out = list(func(("purchase",), iter([pdf]), state))
    return pd.concat(out, ignore_index=True) if out else pd.DataFrame()


def test_ewma_late_day_dropped_counted():
    from ecommerce_analytics_spark.streaming.ewma_state import (
        make_ewma_state_func)

    func = make_ewma_state_func()
    st = FakeGroupState()
    # batch 1: days 01..03 -> 01, 02 finalize (03 stays open)
    out1 = _run(func, st, [("2024-01-01", 100), ("2024-01-02", 200),
                           ("2024-01-03", 300)])
    assert list(out1["day"]) == ["2024-01-01", "2024-01-02"]
    ewma_after_b1 = st.get[2]

    # batch 2: a LATE row for finalized day 01 + a new day 04
    out2 = _run(func, st, [("2024-01-01", 999), ("2024-01-04", 400)])
    # day 03 finalizes normally; the late day 01 must not re-emit
    assert list(out2["day"]) == ["2024-01-03"]
    open_days, open_cents, last_ewma, has_ewma, last_final, late = st.get
    assert late == 1                       # observable violation count
    assert "2024-01-01" not in open_days   # no state leak
    assert open_days == ["2024-01-04"]
    assert last_final == "2024-01-03"
    # the recurrence is exactly what an ordered replay would produce
    assert last_ewma == 0.5 * 3.0 + 0.5 * ewma_after_b1


def test_cusum_late_day_dropped_counted():
    from ecommerce_analytics_spark.operators.stats_tests import CUSUM_CAL
    from ecommerce_analytics_spark.streaming.cusum_state import (
        make_cusum_state_func)

    func = make_cusum_state_func()
    st = FakeGroupState()
    # finalize CUSUM_CAL calibration days + 2 live days
    days = [(f"2024-01-{d:02d}", 100 * d) for d in range(1, CUSUM_CAL + 4)]
    out1 = _run(func, st, days)
    assert len(out1) == 2  # the two post-calibration finalized days
    sp_b1, sm_b1 = st.get[5], st.get[6]

    # a late row for calibration day 01 plus a new open day
    out2 = _run(func, st, [("2024-01-01", 12345),
                           (f"2024-01-{CUSUM_CAL + 5:02d}", 500)])
    (open_days, _oc, _cal, _s7, _h, sp, sm, last_final, late) = st.get
    assert late == 1
    assert "2024-01-01" not in open_days
    # the previously-open youngest day finalized; sp/sm advanced only
    # by that in-order observation, never by the late replay
    assert list(out2["day"]) == [f"2024-01-{CUSUM_CAL + 3:02d}"]
    assert (sp, sm) != (sp_b1, sm_b1) or out2["sp_scaled"].iloc[-1] == sp


def test_hw_late_day_dropped_counted():
    from ecommerce_analytics_spark.streaming.hw_state import (
        HW_PERIOD, make_hw_state_func)

    func = make_hw_state_func()
    st = FakeGroupState()
    # finalize a seed window + 2 stepped days (cursor walks to day N)
    n = HW_PERIOD + 3
    days = [(f"2024-02-{d:02d}", 1000 + d) for d in range(1, n + 1)]
    out1 = _run(func, st, days)
    assert len(out1) == 2  # post-seed finalized days
    lvl_b1 = st.get[4]

    # late row below the cursor + one new day
    out2 = _run(func, st, [("2024-02-01", 777),
                           (f"2024-02-{n + 1:02d}", 900)])
    (open_days, _oc, cursor, _cal, lvl, _tr, _sa, _seeded, late) = st.get
    assert late == 1
    assert "2024-02-01" not in open_days   # no permanent state leak
    assert list(out2["day"]) == [f"2024-02-{n:02d}"]
    assert cursor == f"2024-02-{n + 1:02d}"  # cursor sits at the open day
    assert lvl != lvl_b1  # advanced by the in-order day only
