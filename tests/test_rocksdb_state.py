"""RocksDB state-store provider gate (VERDICT r9 #1).

The suite's streaming twins run on the default HDFS-backed heap state
store; production clusters run RocksDB
(``spark.sql.streaming.stateStore.providerClass``), which serializes
state through JNI (UnsafeRow bytes into SST files) instead of on-heap
maps, with its own snapshot/changelog upload and restore paths. A
state-schema or round-trip bug there is invisible to every heap-backed
test. This module is the per-round pytest gate behind the full wave
(tools/rocksdb_wave.py → ROCKSDB_r10.json, all 13 twins + e2e):

- the provider conf is read at QUERY start, so one session runs the
  same twin under heap and under RocksDB and compares outputs exactly;
- the RocksDB leg must PROVE it fired (rocksdb* custom metrics in the
  query progress + .sst files in the checkpoint) — a conf typo that
  silently falls back to heap cannot pass;
- one checkpoint-restart recovers per-key state from a RocksDB
  snapshot and must finish bit-identical to the uninterrupted heap run.

Reference semantics under test: the Flink ValueState enrichment
(EnrichmentFunction.java:18-27) ↔ streaming/ltv_state.py:88 — RocksDB
is Flink's production state backend too, the deployment shape the
reference's docker-compose mounts but never certifies.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

ROCKSDB_CLASS = ("org.apache.spark.sql.execution.streaming.state."
                 "RocksDBStateStoreProvider")
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb_conf(spark):
    """Flip the session to RocksDB for queries started inside the
    test; restore the prior value after (the conf is cloned into each
    query at start, so running queries are unaffected)."""
    prior = spark.conf.get(PROVIDER_KEY, None)
    spark.conf.set(PROVIDER_KEY, ROCKSDB_CLASS)
    yield
    if prior is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, prior)


def _sst_count(ckpt: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        n += sum(1 for f in files if f.endswith(".sst"))
    return n


def _run_ltv(spark, events_stream_dir, name, ckpt):
    from ecommerce_analytics_spark.streaming.ltv_state import streaming_ltv
    from ecommerce_analytics_spark.streaming.windows import streaming_events
    stream = streaming_events(spark, events_stream_dir,
                              max_files_per_trigger=1)
    q = (streaming_ltv(stream)
         .writeStream.format("memory").queryName(name)
         .outputMode("append").option("checkpointLocation", ckpt)
         .start())
    q.processAllAvailable()
    lp = q.lastProgress
    fired = bool(lp and lp.get("stateOperators") and any(
        k.startswith("rocksdb")
        for k in lp["stateOperators"][0].get("customMetrics", {})))
    q.stop()
    q.awaitTermination()
    rows = {r["event_id"]: (r["user_id"], r["customer_ltv"]) for r in
            spark.sql(f"SELECT * FROM {name}").collect()}
    return rows, fired


CHANGELOG_KEY = ("spark.sql.streaming.stateStore.rocksdb."
                 "changelogCheckpointing.enabled")


def _changelog_count(ckpt: str) -> int:
    n = 0
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        n += sum(1 for f in files if f.endswith(".changelog"))
    return n


def test_rocksdb_fires_and_matches_heap(spark, sf_dir, events_stream_dir,
                                        tmp_path, rocksdb_conf):
    """Same twin, same input, three backend configs in one session:
    identical per-event running LTV, with positive proof of WHICH
    commit path ran each time (SST snapshots vs changelog files vs
    neither) — the full wave is tools/rocksdb_wave.py."""
    rocks_ckpt = str(tmp_path / "ck_rocks")
    rocks, rocks_fired = _run_ltv(spark, events_stream_dir,
                                  "ltv_rocksdb_gate", rocks_ckpt)
    assert rocks_fired, "RocksDB provider did not fire"
    assert _sst_count(rocks_ckpt) > 0, "no SSTs in RocksDB checkpoint"

    # changelog-checkpointing leg (the production default): commits
    # write .changelog files, restores replay them over a snapshot
    spark.conf.set(CHANGELOG_KEY, "true")
    try:
        cl_ckpt = str(tmp_path / "ck_changelog")
        changelog, cl_fired = _run_ltv(spark, events_stream_dir,
                                       "ltv_changelog_gate", cl_ckpt)
        assert cl_fired, "changelog leg did not run on RocksDB"
        assert _changelog_count(cl_ckpt) > 0, \
            "no .changelog files — changelog checkpointing did not fire"
    finally:
        spark.conf.unset(CHANGELOG_KEY)

    spark.conf.unset(PROVIDER_KEY)  # heap leg of the SAME session
    heap_ckpt = str(tmp_path / "ck_heap")
    heap, heap_fired = _run_ltv(spark, events_stream_dir,
                                "ltv_heap_gate", heap_ckpt)
    assert not heap_fired and _sst_count(heap_ckpt) == 0

    assert len(rocks) == len(heap) > 0
    assert rocks == heap  # exact: state round-trip may not perturb floats
    assert changelog == heap


def test_rocksdb_checkpoint_restart_matches_batch(spark, sf_dir, tmp_path,
                                                  rocksdb_conf):
    """Kill after batch 1, restart from the RocksDB checkpoint with new
    input present: per-key state restored from SST snapshot must finish
    exactly at the batch formulation (the ewma heap-restart protocol,
    through the production backend)."""
    import shutil

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.streaming.ltv_state import streaming_ltv
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    events = load_table(spark, sf_dir, "events")
    median = events.approxQuantile("event_id", [0.5], 0.0)[0]
    staging = str(tmp_path / "staging")
    indir = str(tmp_path / "in")
    os.makedirs(indir)
    for i, part in enumerate((
            events.filter(F.col("event_id") <= median),
            events.filter(F.col("event_id") > median))):
        part.withColumn("ts", F.unix_micros("ts") * 1000).coalesce(1) \
            .write.mode("overwrite").parquet(f"{staging}/f{i}")
        srcs = [f for f in os.listdir(f"{staging}/f{i}")
                if f.endswith(".parquet")]
        shutil.copy(f"{staging}/f{i}/{srcs[0]}",
                    f"{staging}/part-{i}.parquet")

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = streaming_events(spark, indir)
        q = (streaming_ltv(stream)
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").start())
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    shutil.copy(f"{staging}/part-0.parquet", f"{indir}/part-0.parquet")
    run_once()                       # batch 1 only, then "crash"
    assert _sst_count(ckpt) > 0      # state really went through RocksDB
    shutil.copy(f"{staging}/part-1.parquet", f"{indir}/part-1.parquet")
    run_once()                       # restart: state restored from SSTs

    got = {r["event_id"]: r["customer_ltv"] for r in
           spark.read.schema(
               "user_id long, event_id long, ts timestamp, "
               "event_type string, signed_amount double, "
               "customer_ltv double").parquet(sink).collect()}

    from ecommerce_analytics_spark.plans.registry import query_map
    batch = query_map()["ltv_running"](spark, sf_dir).collect()
    assert len(got) == len(batch) > 0
    for row in batch:
        assert got[row["event_id"]] == pytest.approx(row["customer_ltv"]), \
            f"event {row['event_id']}"


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
