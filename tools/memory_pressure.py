"""Memory-pressure certification (VERDICT r7 #3).

Every green run to date had a comfortable heap; a 100 TB executor
lives in permanent spill. This tool runs the headline + heavy bench
tiers in a deliberately starved session — small driver heap, unified
memory pool squeezed to ``MEM_FRACTION`` — so sorts, shuffles, and
hash aggregations are forced through the spill paths, then certifies:

* **correctness under spill** — each query's result still hash-matches
  its DuckDB oracle (the same comparison the driver gate runs), at
  the bench SF (default sf0.1, override with ``SPARK_GRAFT_SF_DIR``);
* **the pressure was real** — spill metrics are scraped from the
  Spark UI REST API (enabled for this session only) and the run
  FAILS if zero bytes spilled anywhere, so the artifact can't
  silently certify an unpressured run.

Writes one JSON document (default ``MEMPRESSURE_r8.json``, override
with ``MEMPRESSURE_OUT``): per-query seconds + match flag, and the
session-total memory/disk spill. Cross-referenced from
docs/DEPLOY_100TB.md §executor-sizing.

Usage::

    python tools/memory_pressure.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time
import urllib.request

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")
MEM_FRACTION = os.environ.get("SPARK_GRAFT_MEM_FRACTION", "0.08")
UI_PORT = 4055


def starved_session():
    """get_spark()'s exact conf, minus the heap: a small fixed driver
    memory, the unified pool squeezed, and the UI on so spill metrics
    are scrapeable. Built here (not via get_spark) because static
    confs are ignored on an already-running session."""
    from pyspark.sql import SparkSession

    from ecommerce_analytics_spark.session import tune

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("memory-pressure")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.memory.fraction", MEM_FRACTION)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    return tune(spark)


def scrape_spill(app_id: str) -> dict[str, int]:
    """Sum memory/disk spill across all stages from the UI REST API."""
    url = (f"http://localhost:{UI_PORT}/api/v1/applications/"
           f"{app_id}/stages?status=complete")
    with urllib.request.urlopen(url, timeout=30) as r:
        stages = json.load(r)
    return {
        "memory_bytes_spilled": sum(
            s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_bytes_spilled": sum(
            s.get("diskBytesSpilled", 0) for s in stages),
        "n_stages": len(stages),
    }


def main() -> int:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    import bench
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    spark = starved_session()
    qs = all_queries()
    names = bench.HEADLINE + bench.HEAVY
    out: dict[str, dict] = {}
    failures: list[str] = []
    for name in names:
        q = qs[name]
        t0 = time.monotonic()
        pdf = q.spark_fn(spark, sf_dir).toPandas()
        sec = round(time.monotonic() - t0, 3)
        if q.oracle:
            probs = compare_frames(pdf, duckdb_oracle(q.oracle, sf_dir),
                                   name, float_sig=q.float_sig)
        else:
            probs = [] if len(pdf) >= 0 else ["rows"]
        ok = not probs
        if not ok:
            failures.append(name)
        out[name] = {"sec": sec, "rows": len(pdf), "ok": ok,
                     "oracle": bool(q.oracle)}
        print(json.dumps({"q": name, "sec": sec, "ok": ok}), flush=True)

    spill = scrape_spill(spark.sparkContext.applicationId)
    doc = {
        "sf_dir": sf_dir,
        "driver_memory": DRIVER_MEM,
        "memory_fraction": float(MEM_FRACTION),
        "queries": out,
        "spill": spill,
        "failures": failures,
    }
    dest = os.environ.get("MEMPRESSURE_OUT",
                          os.path.join(REPO, "MEMPRESSURE_r8.json"))
    with open(dest, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"total_queries": len(names),
                      "failures": failures, **spill}))
    spark.stop()
    if failures:
        return 1
    if spill["memory_bytes_spilled"] == 0 and \
            spill["disk_bytes_spilled"] == 0:
        print("ZERO SPILL — the session was not actually pressured; "
              "lower SPARK_GRAFT_MEM_FRACTION / SPARK_GRAFT_DRIVER_MEM",
              file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
