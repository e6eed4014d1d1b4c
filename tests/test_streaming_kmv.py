"""Streaming maintained KMV sketch == batch sketch after the last
micro-batch, integer-exact. Two orderkey-split files (one per
trigger) force a cross-batch merge where batch 2's hashes must both
displace batch-1 minima and leave others in place."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F


def test_streaming_kmv_matches_batch(spark, sf_dir, tmp_path):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.kmv import kmv_hash, kmv_minima
    from ecommerce_analytics_spark.streaming.kmv_state import (
        streaming_kmv_sketch)

    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_orderkey", "l_shipdate")
    median = li.approxQuantile("l_orderkey", [0.5], 0.0)[0]
    out = str(tmp_path / "li_stream")
    li.filter(F.col("l_orderkey") <= median).coalesce(1) \
        .write.parquet(f"{out}/b0")
    li.filter(F.col("l_orderkey") > median).coalesce(1) \
        .write.parquet(f"{out}/b1")
    os.makedirs(f"{out}/in")
    for i in (0, 1):
        for f in os.listdir(f"{out}/b{i}"):
            if f.endswith(".parquet"):
                shutil.move(f"{out}/b{i}/{f}", f"{out}/in/part-{i}.parquet")

    stream = (spark.readStream
              .schema("l_orderkey long, l_shipdate timestamp")
              .option("maxFilesPerTrigger", 1).parquet(f"{out}/in"))
    q = (streaming_kmv_sketch(stream)
         .writeStream.format("memory").queryName("kmv_stream")
         .outputMode("update").start())
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM kmv_stream").collect()
    max_epoch: dict[int, int] = {}
    for r in rows:
        max_epoch[r.ship_year] = max(max_epoch.get(r.ship_year, 0), r.epoch)
    final = {r.ship_year: (r.n_mins, r.kth_min) for r in rows
             if r.epoch == max_epoch[r.ship_year]}

    hashed = li.select(F.year("l_shipdate").cast("long").alias("ship_year"),
                       kmv_hash("l_orderkey").alias("h"))
    batch = {r["ship_year"]: (len(r["mins"]), r["mins"][-1])
             for r in kmv_minima(hashed, ["ship_year"]).collect()}
    assert final == batch and len(batch) > 1
    # the state genuinely evolved: every year saw both micro-batches
    assert all(e == 2 for e in max_epoch.values())


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
