"""Empirical scaling study runner (VERDICT r4 #4 → SCALING.md).

Times the heavy query families across scale points (driver sf0.01 and
sf0.1, plus gen_scale.py-generated ×2 / ×5 copies of sf0.1) in ONE
JVM, interleaved per round so JIT/warm-up noise spreads evenly across
points (the star.py A/B methodology), and prints one JSON line per
(query, sf, run).

Usage::

    python tools/gen_scale.py /root/testdata/sf0.1 /tmp/scale_x2 2
    python tools/gen_scale.py /root/testdata/sf0.1 /tmp/scale_x5 5
    python tools/run_scaling.py > scaling_raw.jsonl
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

FAMILIES = [
    "dedup_minhash_lsh",
    "semantic_dedup",
    "product_triangles",
    "product_pagerank",
    "event_classification",
    "pretrain_pipeline",
    # round-5 additions: the two new corpus-wide passes
    "bm25_self_retrieval_mrr",
    "embedding_pca_outliers",
]
if os.environ.get("SCALING_FAMILIES"):
    FAMILIES = os.environ["SCALING_FAMILIES"].split(",")

POINTS = [
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", "/root/testdata/sf0.1", 0.1),
    ("sf0.2", os.environ.get("SCALE_X2", "/tmp/scale_x2"), 0.2),
    ("sf0.5", os.environ.get("SCALE_X5", "/tmp/scale_x5"), 0.5),
    ("sf1.0", os.environ.get("SCALE_X10", "/tmp/scale_x10"), 1.0),
]

RUNS = int(os.environ.get("SCALING_RUNS", "2"))


def main() -> None:
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.session import get_spark

    spark = get_spark("scaling_study", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    qmap = query_map()
    results = []
    for run in range(RUNS):
        for name in FAMILIES:
            for label, path, sf in POINTS:
                if not os.path.isdir(path):
                    continue
                t0 = time.time()
                n = qmap[name](spark, path).count()
                sec = round(time.time() - t0, 3)
                rec = {"q": name, "sf": sf, "label": label,
                       "run": run, "rows": n, "sec": sec}
                results.append(rec)
                print(json.dumps(rec), flush=True)
    # per (q, sf) minimum — the steady-state number SCALING.md reports
    best: dict = {}
    for r in results:
        key = (r["q"], r["label"])
        if key not in best or r["sec"] < best[key]["sec"]:
            best[key] = r
    print(json.dumps({"best": [v for v in best.values()]}), flush=True)


if __name__ == "__main__":
    main()
