"""IVFADC recall sensitivity (VERDICT r6 #4).

Measures recall@TOP_K of the in-memory IVFADC composition against the
exact brute-force baseline while sweeping the two knobs that govern
the recall/cost trade-off — probe width (cells scanned per query) and
ADC shortlist size — plus coarse-quantizer seed perturbation at the
committed setting, at every test SF. Output: a markdown table pasted
into docs/ANN_SENSITIVITY.md (committed evidence for the
IVFPQ_RECALL_FLOOR margin).

Usage: python tools/ann_sensitivity.py
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]
PROBES = [2, 3, 4, 5]
SEEDS = [41, 42, 43, 137]


def _recall(spark, sf_dir) -> float:
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.operators import ivfpq
    from ecommerce_analytics_spark.operators.similarity import (
        q_knn_bruteforce,
    )
    exact = q_knn_bruteforce(spark, sf_dir) \
        .select("query_id", "neighbor_id")
    approx = (ivfpq.q_knn_ivfpq(spark, sf_dir)
              .select("query_id", "neighbor_id")
              .withColumn("hit", F.lit(1)))
    row = (exact.join(approx, ["query_id", "neighbor_id"], "left")
           .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                 / F.count(F.lit(1))).alias("r")).collect()[0])
    return float(row.r)


def main() -> int:
    from ecommerce_analytics_spark.operators import ivfpq
    from ecommerce_analytics_spark.session import get_spark

    spark = get_spark("ann_sensitivity")
    base_probe, base_seed = ivfpq.IVFPQ_N_PROBE, ivfpq.COARSE_SEED

    print("| knob | setting | " + " | ".join(
        s.rsplit("sf", 1)[-1] for s in SFS) + " |")
    print("|---|---|" + "---|" * len(SFS))
    try:
        for p in PROBES:
            ivfpq.IVFPQ_N_PROBE = p
            vals = [_recall(spark, sf) for sf in SFS]
            mark = " (committed)" if p == base_probe else ""
            print(f"| n_probe | {p}{mark} | "
                  + " | ".join(f"{v:.3f}" for v in vals) + " |")
        ivfpq.IVFPQ_N_PROBE = base_probe
        for seed in SEEDS:
            ivfpq.COARSE_SEED = seed
            vals = [_recall(spark, sf) for sf in SFS]
            mark = " (committed)" if seed == base_seed else ""
            print(f"| coarse seed | {seed}{mark} | "
                  + " | ".join(f"{v:.3f}" for v in vals) + " |")
    finally:
        ivfpq.IVFPQ_N_PROBE = base_probe
        ivfpq.COARSE_SEED = base_seed
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
