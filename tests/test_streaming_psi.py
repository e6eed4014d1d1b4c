"""Streaming PSI == batch PSI on the same reference/actual split.

The stream carries only the ACTUAL period (the batch query's
midpoint-split second half), delivered as two micro-batches whose cut
point differs from the PSI split — so cross-batch count carry-over is
actually exercised. At stream end, the latest cumulative count per
(feature, bin) joined with the frozen reference histogram and pushed
through the shared psi_from_counts must reproduce the batch
psi_feature_drift rows EXACTLY (same fixed-point math, same
numbers)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def test_streaming_psi_matches_batch(spark, sf_dir, tmp_path):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.psi_drift import (
        binned_features, psi_from_counts)
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.streaming.psi_state import (
        streaming_actual_counts)
    from ecommerce_analytics_spark.streaming.windows import streaming_events

    events = load_table(spark, sf_dir, "events")
    feats = binned_features(events)
    mid = feats.agg(((F.min("d") + F.max("d")) / 2).cast("bigint")
                    .alias("m")).collect()[0]["m"]

    # frozen reference histogram (first half)
    ref = (feats.filter(F.col("d") <= mid)
           .groupBy("feature", "bin")
           .agg(F.count(F.lit(1)).cast("bigint").alias("r")))

    # actual period as two time-ordered micro-batch files
    act_events = events.filter(
        F.datediff(F.to_date("ts"),
                   F.to_date(F.lit("1970-01-01"))) > mid)
    cut = act_events.approxQuantile("event_id", [0.5], 0.0)[0]
    out = str(tmp_path / "act_stream")
    os.makedirs(out)
    for i, part in enumerate((
            act_events.filter(F.col("event_id") <= cut),
            act_events.filter(F.col("event_id") > cut))):
        part.withColumn("ts", F.unix_micros("ts") * 1000) \
            .coalesce(1).write.mode("overwrite").parquet(f"{out}/f{i}")
        for f in os.listdir(f"{out}/f{i}"):
            if f.endswith(".parquet"):
                shutil.move(f"{out}/f{i}/{f}", f"{out}/batch_{i}.parquet")
        shutil.rmtree(f"{out}/f{i}")

    stream = streaming_events(spark, out, max_files_per_trigger=1)
    counts_stream = streaming_actual_counts(binned_features(stream))
    q = (counts_stream.writeStream.format("memory")
         .queryName("psi_stream").outputMode("append").start())
    q.processAllAvailable()
    q.stop()

    emitted = spark.sql("SELECT * FROM psi_stream")
    # multiple epochs per key prove cross-batch accumulation happened
    assert emitted.filter(F.col("epoch") >= 2).count() > 0

    latest = (emitted.groupBy("feature", "bin")
              .agg(F.max_by("cum_n", "epoch").alias("a")))
    counts = (ref.join(latest, ["feature", "bin"], "full")
              .select("feature", "bin",
                      F.coalesce("r", F.lit(0)).cast("bigint").alias("r"),
                      F.coalesce("a", F.lit(0)).cast("bigint").alias("a")))
    got = {r["feature"]: r for r in psi_from_counts(counts).collect()}

    batch = {r["feature"]: r for r in
             query_map()["psi_feature_drift"](spark, sf_dir).collect()}
    assert set(got) == set(batch)
    for feat, b in batch.items():
        g = got[feat]
        for col in ("n_bins", "n_ref", "n_act", "psi"):
            assert g[col] == b[col], (feat, col)  # exact, incl. psi


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
