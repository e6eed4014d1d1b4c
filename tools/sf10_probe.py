"""sf10 probe of the adaptive-sizing contracts — round 9 (VERDICT r8 #5).

Round 8 proved that FIXED ANN/dedup parameters silently decay at 10x
corpus growth and replaced them with ratio/stride contracts
(adaptive_shortlist ~ n/40, SemDeDup cells ~ n/256, hash-stride train
sampling).  This probe takes those ratios one more decade — sf10:
5M documents / 200k vectors (tools/gen_scale.py, 100x of sf0.1,
documents+embeddings only via GEN_SCALE_TABLES) — and records, for
the ANN family, float recall@k against the exact brute-force baseline
(not just the registry's floor boolean), and for the dedup/SemDeDup
family, row counts and runtimes, at BOTH sf1.0 and sf10 so the decade
ratio is measured in one JVM.

Gate: every recall stays at or above its registered floor at sf10,
and every family completes (no quadratic blow-up / OOM cliff).

Usage::

    python tools/sf10_probe.py [sf1_dir] [sf10_dir]

Writes ``SF10_r9.json`` (override with ``SF10_OUT``).  Exit 1 on a
floor breach or failure.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.operators.ann_index import (
        KMEANS_RECALL_FLOOR, q_knn_ivf_persisted)
    from ecommerce_analytics_spark.operators.ivfpq import (
        IVFPQ_RECALL_FLOOR, q_knn_ivfpq_persisted)
    from ecommerce_analytics_spark.operators.pq import (
        PQ_RECALL_FLOOR, q_knn_pq)
    from ecommerce_analytics_spark.operators.similarity import (
        knn_exact_baseline)
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.session import get_spark

    argv = sys.argv[1:]
    sf1_dir = argv[0] if len(argv) > 0 else "/tmp/scale_sf1.0"
    sf10_dir = argv[1] if len(argv) > 1 else "/tmp/scale_sf10"
    out_path = os.environ.get("SF10_OUT", f"{REPO}/SF10_r9.json")

    spark = get_spark("sf10_probe", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    qmap = query_map()

    ANN = [
        ("knn_pq", q_knn_pq, PQ_RECALL_FLOOR),
        ("knn_ivfpq_persisted", q_knn_ivfpq_persisted, IVFPQ_RECALL_FLOOR),
        ("knn_ivf_persisted", q_knn_ivf_persisted, KMEANS_RECALL_FLOOR),
    ]
    # registry queries timed + counted (rows should scale ~linearly in
    # docs; a super-linear sec ratio >> 10 flags a hidden quadratic)
    FAMS = ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
            "semantic_dedup", "knn_ivf", "embedding_neardup_lsh"]

    def float_recall(sf_dir: str, fn) -> tuple[float, float]:
        t0 = time.time()
        exact = knn_exact_baseline(spark, sf_dir) \
            .select("query_id", "neighbor_id")
        approx = (fn(spark, sf_dir)
                  .select("query_id", "neighbor_id")
                  .withColumn("hit", F.lit(1)))
        rec = (exact.join(approx, ["query_id", "neighbor_id"], "left")
               .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                     / F.count(F.lit(1))).alias("r"))
               .first()["r"])
        return float(rec), round(time.time() - t0, 2)

    records: list[dict] = []
    breaches: list[str] = []
    for label, sf_dir in (("sf1.0", sf1_dir), ("sf10", sf10_dir)):
        for name, fn, floor in ANN:
            r, sec = float_recall(sf_dir, fn)
            ok = r >= floor
            rec = {"kind": "recall", "q": name, "sf": label,
                   "recall_at_k": round(r, 4), "floor": floor,
                   "floor_met": ok, "sec": sec}
            records.append(rec)
            print(json.dumps(rec), flush=True)
            if label == "sf10" and not ok:
                breaches.append(name)
        for name in FAMS:
            t0 = time.time()
            try:
                n = qmap[name](spark, sf_dir).count()
                rec = {"kind": "family", "q": name, "sf": label,
                       "rows": n, "sec": round(time.time() - t0, 2)}
            except Exception as e:  # a cliff IS the finding
                rec = {"kind": "family", "q": name, "sf": label,
                       "error": f"{type(e).__name__}: {e}"[:300],
                       "sec": round(time.time() - t0, 2)}
                if label == "sf10":
                    breaches.append(name)
            records.append(rec)
            print(json.dumps(rec), flush=True)

    # decade ratios for the families
    by = {(r["q"], r["sf"]): r for r in records if r["kind"] == "family"}
    ratios = {}
    for name in FAMS:
        a, b = by.get((name, "sf1.0")), by.get((name, "sf10"))
        if a and b and "rows" in a and "rows" in b and a["sec"] > 0:
            ratios[name] = {"sec_ratio": round(b["sec"] / a["sec"], 2),
                            "rows_ratio": round(b["rows"] / max(a["rows"], 1), 2)}
    doc = {"sf1_dir": sf1_dir, "sf10_dir": sf10_dir,
           "records": records, "decade_ratios": ratios,
           "floor_breaches_sf10": breaches}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"decade_ratios": ratios,
                      "floor_breaches_sf10": breaches}, indent=1))
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main())
