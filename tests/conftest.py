from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SMOKE_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ecommerce_analytics_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    spark = get_spark("ecommerce_analytics_spark_tests", cpus=cpus)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF


@pytest.fixture(scope="session")
def spark_h(spark):
    """Alias for hypothesis @given tests (session-scoped reuse)."""
    return spark


@pytest.fixture(scope="session")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """events split into two time-ordered parquet files → two
    micro-batches exercising cross-batch state carry-over. Shared by
    every streaming parity test (test_streaming.py,
    test_streaming_funnel.py)."""
    import shutil

    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("events_stream"))
    from ecommerce_analytics_spark.io import load_table
    events = load_table(spark, sf_dir, "events")
    median = events.approxQuantile("event_id", [0.5], 0.0)[0]
    early = events.filter(F.col("event_id") <= median)
    late = events.filter(F.col("event_id") > median)
    # restore raw long-ns ts so the stream reader sees the driver format
    for i, part in enumerate((early, late)):
        part.withColumn("ts", F.unix_micros("ts") * 1000) \
            .coalesce(1).write.mode("overwrite").parquet(f"{out}/f{i}")
        # flatten into one dir with ordered names
        for f in os.listdir(f"{out}/f{i}"):
            if f.endswith(".parquet"):
                shutil.move(f"{out}/f{i}/{f}", f"{out}/batch_{i}.parquet")
        shutil.rmtree(f"{out}/f{i}")
    return out
