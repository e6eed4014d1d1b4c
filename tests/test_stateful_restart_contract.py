"""Stateful-restart contract guards (VERDICT r10 #5).

Streaming state is keyed BY SHUFFLE PARTITION ID: state/<op>/<part>/.
If a restart re-planned the stateful exchange with a different
``spark.sql.shuffle.partitions``, every key would hash to a different
partition than its saved state — a silent wrong-keyed recovery. The
schema-evolution guard (test_state_schema_guard) covers widened state
rows; this file certifies the OTHER production restart hazards:

1. ``spark.sql.shuffle.partitions`` changed across a stateful restart
   — Spark must pin the ORIGINAL value from the checkpoint's
   OffsetSeqMetadata (its own guard), and the recovered output must
   hash-match an uninterrupted run. We assert the pin three ways:
   offset-log conf, on-disk state partition count, and value parity.
2. State-store PROVIDER changed across restart (heap checkpoint,
   RocksDB session conf) — also pinned from the checkpoint: recovery
   must keep reading the heap .delta files, not silently reinterpret
   them under RocksDB.
3. The same partition pin under the RocksDB backend end-to-end.

If a future Spark version stops pinning these, parity breaks loudly
here and the engine needs its own pre-flight guard — that is the
contract this file encodes. Reference semantics: Flink restores state
by operator-ID + key-group, the same restart hazard class
(EnrichmentFunction.java ValueState restore).
"""

from __future__ import annotations

import json
import os
import shutil

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy

ROCKSDB_CLASS = ("org.apache.spark.sql.execution.streaming.state."
                 "RocksDBStateStoreProvider")
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
PARTS_KEY = "spark.sql.shuffle.partitions"


def _offset_conf(ckpt: str, batch: int) -> dict:
    """The pinned SQL confs from the checkpoint's offset log entry."""
    with open(os.path.join(ckpt, "offsets", str(batch))) as f:
        lines = f.read().splitlines()
    # line 0: version marker; line 1: OffsetSeqMetadata JSON
    return json.loads(lines[1]).get("conf", {})


def _state_partition_dirs(ckpt: str) -> int:
    root = os.path.join(ckpt, "state", "0")
    return len([d for d in os.listdir(root)
                if d.isdigit() and
                os.path.isdir(os.path.join(root, d))])


def _state_file_kinds(ckpt: str) -> set[str]:
    kinds = set()
    for _root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        for f in files:
            ext = f.rsplit(".", 1)[-1]
            if ext in {"delta", "snapshot", "sst", "changelog", "zip"}:
                kinds.add(ext)
    return kinds


def _run_ltv(spark, src: str, sink: str, ckpt: str) -> None:
    """Drain everything currently in src through streaming_ltv into a
    parquet sink (memory sink cannot recover from a checkpoint)."""
    from ecommerce_analytics_spark.streaming.ltv_state import streaming_ltv
    from ecommerce_analytics_spark.streaming.windows import streaming_events
    q = (streaming_ltv(streaming_events(spark, src,
                                        max_files_per_trigger=1))
         .writeStream.format("parquet").outputMode("append")
         .option("path", sink).option("checkpointLocation", ckpt)
         .start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()


def _conf_sandbox(spark, pairs: dict):
    """Set confs, return the restore map."""
    old = {}
    for k, v in pairs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old: dict) -> None:
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _vh(spark, path: str) -> str:
    from ecommerce_analytics_spark.testing import value_hash
    return value_hash(spark.read.parquet(path).toPandas())


def _restart_scenario(spark, events_stream_dir, tmp_path,
                      start_conf: dict, restart_conf: dict):
    """Batch 0 under start_conf, stop, batch 1 under restart_conf;
    plus an uninterrupted both-batches run under start_conf. Returns
    (ckpt, interrupted_vh, uninterrupted_vh)."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    shutil.copy(f"{events_stream_dir}/batch_0.parquet",
                f"{src}/batch_0.parquet")
    ckpt, sink = str(tmp_path / "ck"), str(tmp_path / "out")

    old = _conf_sandbox(spark, start_conf)
    try:
        _run_ltv(spark, src, sink, ckpt)
        shutil.copy(f"{events_stream_dir}/batch_1.parquet",
                    f"{src}/batch_1.parquet")
        _conf_sandbox(spark, restart_conf)
        _run_ltv(spark, src, sink, ckpt)

        # uninterrupted baseline under the ORIGINAL conf
        _conf_sandbox(spark, start_conf)
        ckpt_b, sink_b = str(tmp_path / "ck_b"), str(tmp_path / "out_b")
        _run_ltv(spark, src, sink_b, ckpt_b)
    finally:
        _restore(spark, old)
    return ckpt, _vh(spark, sink), _vh(spark, sink_b)


def test_shuffle_partitions_pinned_across_restart(
        spark, events_stream_dir, tmp_path):
    ckpt, got, want = _restart_scenario(
        spark, events_stream_dir, tmp_path,
        start_conf={PARTS_KEY: "5"},
        restart_conf={PARTS_KEY: "13"})
    # Spark's guard: the checkpoint value wins over the session conf
    assert _offset_conf(ckpt, 0)[PARTS_KEY] == "5"
    assert _offset_conf(ckpt, 1)[PARTS_KEY] == "5", \
        "restart batch re-planned with the NEW width — wrong-keyed state"
    assert _state_partition_dirs(ckpt) == 5
    assert got == want, "recovered output drifted from uninterrupted run"


def test_provider_pinned_across_restart(spark, events_stream_dir,
                                        tmp_path):
    """Heap checkpoint restarted under a RocksDB session conf must keep
    reading heap state, not reinterpret .delta files as RocksDB."""
    ckpt, got, want = _restart_scenario(
        spark, events_stream_dir, tmp_path,
        start_conf={PARTS_KEY: "5"},
        restart_conf={PARTS_KEY: "5", PROVIDER_KEY: ROCKSDB_CLASS})
    pinned = _offset_conf(ckpt, 1).get(PROVIDER_KEY, "")
    assert "RocksDB" not in pinned, \
        "restart switched state-store provider mid-checkpoint"
    kinds = _state_file_kinds(ckpt)
    assert "delta" in kinds and not kinds & {"sst", "changelog"}
    assert got == want


def test_shuffle_partitions_pinned_under_rocksdb(
        spark, events_stream_dir, tmp_path):
    ckpt, got, want = _restart_scenario(
        spark, events_stream_dir, tmp_path,
        start_conf={PARTS_KEY: "5", PROVIDER_KEY: ROCKSDB_CLASS},
        restart_conf={PARTS_KEY: "13", PROVIDER_KEY: ROCKSDB_CLASS})
    assert _offset_conf(ckpt, 1)[PARTS_KEY] == "5"
    assert _state_partition_dirs(ckpt) == 5
    assert _state_file_kinds(ckpt) & {"sst", "changelog", "zip"}, \
        "RocksDB leg did not actually run RocksDB"
    assert got == want
