"""Mid-batch SIGKILL crash-recovery gate (VERDICT r9 #2).

test_replay_sinks certifies a CLEAN stop/restart; this gate kills a
stateful streaming query INSIDE the exactly-once window — after the
checkpoint's offsets log advances for epoch N but before the commit
log records N — with SIGKILL (no shutdown hooks, no sink cleanup),
then restarts and requires the final sink to hash-match an
uninterrupted run. The full 4-way wave (e2e topology × heap/RocksDB)
is tools/crashkill_wave.py → CRASHKILL_r10.json; this pytest runs the
fastest combination (ltv ValueState twin through the exactly-once
parquet file sink, heap store) every round.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_sigkill_between_offsets_and_commit_recovers(tmp_path):
    import crashkill_wave as cw

    from ecommerce_analytics_spark.testing import value_hash

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    n_files = 8

    base_dir = str(tmp_path / "base")
    p = cw._spawn("ltv", sf_dir, base_dir, n_files, rocksdb=False)
    assert p.wait() == 0, "baseline worker failed"
    base_vh = value_hash(cw._read_sink("ltv", base_dir))

    kill_info = None
    crash_dir = None
    for attempt in range(4):
        crash_dir = str(tmp_path / f"crash{attempt}")
        ck = os.path.join(crash_dir, "ck")
        p = cw._spawn("ltv", sf_dir, crash_dir, n_files, rocksdb=False)
        kill_info = cw._kill_in_window(p, ck, min_epoch=2, timeout_s=240)
        if kill_info and kill_info["in_window"]:
            break
    assert kill_info and kill_info["in_window"], \
        f"never caught the offsets→commit window: {kill_info}"
    # the kill landed mid-epoch: offsets frontier strictly ahead of
    # the commit log — state for that epoch was never committed
    assert kill_info["offsets_at_kill"] > kill_info["commits_at_kill"] >= 0

    p = cw._spawn("ltv", sf_dir, crash_dir, n_files, rocksdb=False)
    assert p.wait() == 0, "recovery worker failed"
    rec_pdf = cw._read_sink("ltv", crash_dir)
    assert len(rec_pdf) > 0
    # no duplicate epoch, no lost epoch: bit-identical to uninterrupted
    assert value_hash(rec_pdf) == base_vh


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
