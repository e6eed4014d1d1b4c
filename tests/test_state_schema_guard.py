"""State-schema-evolution guard (round 10).

A production streaming job restarts against an EXISTING checkpoint
after every deploy. If the new code widens or reorders the per-key
state struct, silently reinterpreting old state bytes under the new
schema corrupts every carried value — the failure must be LOUD at
restart, not a wrong number downstream. Spark's state-schema
compatibility checker provides exactly that; this gate pins the
behavior so an engine upgrade (or a conf regression disabling the
check) cannot reintroduce silent reinterpretation.

Both state-store backends are covered: the schema check is
provider-independent (it reads the checkpoint's schema file before
the store opens), and the RocksDB leg proves the guard fires before
any SST is reinterpreted.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy

ROCKSDB_CLASS = ("org.apache.spark.sql.execution.streaming.state."
                 "RocksDBStateStoreProvider")
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"

_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("total", T.DoubleType()),
])


def _state_func(state_schema_v2: bool):
    """v1 keeps one DOUBLE of state; v2 'evolves' it to (DOUBLE, LONG)
    — the classic add-a-counter deploy."""

    def f(key, pdfs, state: GroupState):
        import pandas as pd
        if state_schema_v2:
            total, _n = state.get if state.exists else (0.0, 0)
        else:
            (total,) = state.get if state.exists else (0.0,)
        n = 0
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += len(pdf)
        state.update((total, n) if state_schema_v2 else (total,))
        yield pd.DataFrame({"user_id": [key[0]], "total": [total]})

    return f


def _run(spark, indir, ckpt, v2: bool, sink: str):
    """Run the keyed-state stream against the (possibly pre-existing)
    checkpoint through the recovery-capable parquet sink; return the
    failure (streaming exception or start-time raise), None if clean."""
    stream = (spark.readStream.schema("user_id long, value double")
              .option("maxFilesPerTrigger", 1).parquet(indir))
    state_schema = T.StructType(
        [T.StructField("total", T.DoubleType())]
        + ([T.StructField("n", T.LongType())] if v2 else []))
    out = (stream.groupBy("user_id").applyInPandasWithState(
        _state_func(v2), outputStructType=_OUT_SCHEMA,
        stateStructType=state_schema, outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))
    try:
        q = (out.writeStream.format("parquet")
             .option("path", sink)
             .outputMode("append").option("checkpointLocation", ckpt)
             .start())
    except Exception as exc:  # schema check can refuse at start
        return exc
    try:
        q.processAllAvailable()
        exc = q.exception()
    except Exception as raised:
        exc = raised
    finally:
        q.stop()
    return exc


@pytest.mark.parametrize("provider", ["heap", "rocksdb"])
def test_state_schema_change_fails_loud_on_restart(spark, tmp_path,
                                                   provider):
    prior = spark.conf.get(PROVIDER_KEY, None)
    if provider == "rocksdb":
        spark.conf.set(PROVIDER_KEY, ROCKSDB_CLASS)
    try:
        indir = str(tmp_path / "in")
        os.makedirs(indir)
        ckpt = str(tmp_path / "ck")
        spark.range(100).select(
            (F.col("id") % 10).alias("user_id"),
            F.col("id").cast("double").alias("value")) \
            .coalesce(1).write.parquet(f"{indir}/stage")
        import shutil
        for f in os.listdir(f"{indir}/stage"):
            if f.endswith(".parquet"):
                shutil.move(f"{indir}/stage/{f}", f"{indir}/part-0.parquet")
        shutil.rmtree(f"{indir}/stage")

        assert _run(spark, indir, ckpt, v2=False,
                    sink=str(tmp_path / "sink")) is None

        # deploy the schema-widened job against the same checkpoint:
        # must fail LOUDLY with the schema-incompatibility error, not
        # reinterpret the old single-column state bytes
        spark.range(100, 200).select(
            (F.col("id") % 10).alias("user_id"),
            F.col("id").cast("double").alias("value")) \
            .coalesce(1).write.parquet(f"{indir}/stage2")
        for f in os.listdir(f"{indir}/stage2"):
            if f.endswith(".parquet"):
                shutil.move(f"{indir}/stage2/{f}", f"{indir}/part-1.parquet")
        shutil.rmtree(f"{indir}/stage2")

        exc = _run(spark, indir, ckpt, v2=True,
                   sink=str(tmp_path / "sink"))
        assert exc is not None, \
            "schema-widened restart silently succeeded over old state"
        msg = str(exc)
        assert "chema" in msg, msg  # StateSchemaNotCompatible / schema
    finally:
        if prior is None:
            spark.conf.unset(PROVIDER_KEY)
        else:
            spark.conf.set(PROVIDER_KEY, prior)
