#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full computation,
no collect/driver materialization). Session setup is excluded from
per-query numbers; "value" is the sum of query wall times.

Before timing, every query runs once at sf0.001: identical plans →
identical generated code, so the timed sf run measures warm (JIT'd)
execution rather than first-call bytecode compilation (profiled 3×
cold-vs-warm on the codegen-heavy minhash query).

Each query is then timed N_RUNS times at the target SF and the MIN is
reported — steady-state throughput. Two reasons: (a) this host's
single-core throughput varies ~1.5× run-to-run (measured on a pure
Python loop; host-level frequency/contention noise), and multi-stage
shuffles amplify that to 3-5× on identical plans; (b) AQE picks
different physical plans at sf0.001 vs the target SF (broadcast vs
shuffle), so the first target-SF run still JIT-compiles those stages.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of SURVEY §2: flagship window pipeline, scan-agg,
# multi-join star rollups, top-k, self-join recs, and the north-star
# text/dedup/similarity operators.
HEADLINE = [
    "event_classification",
    "pricing_summary",
    "shipping_priority",
    "sales_by_region_year",
    "hourly_revenue",
    "popular_products",
    "ltv_running",
    "product_recommendations",
    "token_frequencies",
    "text_quality_score",
    "dedup_minhash_lsh",
    "knn_bruteforce",
]


def main() -> None:
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.session import get_spark

    spark = get_spark("bench")
    queries = query_map()

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1)) if m else None

    # JIT/codegen warmup at the smallest SF (identical plans, tiny data)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            queries[name](spark, warm_dir) \
                .write.mode("overwrite").format("noop").save()

    # min-of-5: this host's run-to-run variance is ~1.5× on identical
    # plans (see module docstring); 3 runs let one noisy window inflate
    # a query's recorded min by 2-3× (observed on pricing_summary r3)
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 3)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": n_runs,
        "aggregation": "min",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
