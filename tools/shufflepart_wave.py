"""Physical-width invariance wave — round 10.

The two width knobs every deployment sets differently, neither of
which may change a result:

* ``spark.sql.shuffle.partitions`` — changes every exchange's
  physical row grouping, where underdetermined window tie-breaks,
  accumulation-order float sums behind >= thresholds, and
  partition-sensitive picks hide. Perturbed to 7 (odd,
  sub-parallelism, heavy AQE coalescing) and 64 (over-partitioned:
  empty and 1-row partitions at sf0.01).
* ``spark.sql.files.maxPartitionBytes`` (+ openCostInBytes=0) — the
  SCAN-side twin: split geometry of every parquet read, and the axis
  that jitters MLlib k-means|| init layouts (the documented
  layout-sensitivity of the trained-KMeans ANN family rides on the
  coalesce(8) pin over scan partitions; the recall floors must
  absorb the jitter). Perturbed to 64 KB — row-group-level splits.
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` — pandas-UDF batch
  geometry: 64-row Arrow batches shred every mapInPandas /
  applyInPandas input into many tiny frames; an operator that
  computes across a batch boundary drifts here.
* ``spark.sql.codegen.wholeStage=false`` — the interpreted evaluator
  for every expression; compiled-vs-interpreted divergence is the bug
  class Spark regression-tests with this flag.

Gate, against the committed canonical-width sweep (SWEEP_JSON_BASE):
oracle-green at every width AND order-insensitive value_hash
IDENTICAL per query — a result that changes with physical width is
broken on every real cluster.

Usage::

    SWEEP_JSON_BASE=SWEEP_r10.json python tools/shufflepart_wave.py [sf_dir]

Writes ``SHUFFLEPART_r10.json`` (override with ``SHUFFLEPART_OUT``).
Exit 1 on any oracle failure or cross-width value-hash drift.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)


AXES = {
    "shuffle_7": "spark.sql.shuffle.partitions=7",
    "shuffle_64": "spark.sql.shuffle.partitions=64",
    "scan_64k": ("spark.sql.files.maxPartitionBytes=65536;"
                 "spark.sql.files.openCostInBytes=0"),
    # pandas-UDF batch geometry: 64-row Arrow batches split every
    # mapInPandas/applyInPandas input into many tiny frames — any
    # operator that accidentally computes across a batch boundary
    # (per-batch normalization, carry-over between frames) drifts here
    "arrow_64": "spark.sql.execution.arrow.maxRecordsPerBatch=64",
    # the execution-ENGINE axis: whole-stage codegen off forces the
    # interpreted expression evaluator for every operator — a codegen
    # divergence (the bug class Spark itself regression-tests with
    # this exact flag) shows up as drift
    "codegen_off": "spark.sql.codegen.wholeStage=false",
}


def run_sweep(sf_dir: str, artifact: str, conf: str) -> dict:
    env = dict(os.environ,
               SWEEP_JSON_OUT=artifact,
               SPARK_GRAFT_EXTRA_CONF=conf)
    env.pop("SWEEP_JSON_MERGE", None)
    subprocess.run([sys.executable, f"{REPO}/tools/sweep.py", sf_dir],
                   env=env, cwd=REPO)
    if not os.path.exists(artifact):
        print(f"sweep under {conf!r} wrote no artifact", file=sys.stderr)
        sys.exit(2)
    with open(artifact) as f:
        return {r["q"]: r for r in json.load(f)["records"]}


def main() -> int:
    import tempfile
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out_path = os.environ.get("SHUFFLEPART_OUT",
                              f"{REPO}/SHUFFLEPART_r10.json")
    base_path = os.environ.get("SWEEP_JSON_BASE",
                               f"{REPO}/SWEEP_r10.json")
    with open(base_path) as f:
        base = {r["q"]: r for r in json.load(f)["records"]}

    tmp = tempfile.mkdtemp(prefix="shufflepart_")
    runs = {tag: run_sweep(sf_dir, f"{tmp}/sweep_{tag}.json", conf)
            for tag, conf in AXES.items()}

    failures: dict[str, list[str]] = {
        tag: sorted(q for q, r in recs.items() if not r["ok"])
        for tag, recs in runs.items()}
    drift = sorted(
        q for q in base
        if any(q in recs and recs[q].get("vh")
               and base[q].get("vh") and recs[q]["vh"] != base[q]["vh"]
               for recs in runs.values()))

    doc = {
        "wave": "physical-width-invariance",
        "sf": sf_dir,
        "axes": AXES,
        "base_artifact": os.path.basename(base_path),
        "n_queries": len(base),
        "oracle_failures": failures,
        "vh_drift_vs_base": drift,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return 1 if (any(failures.values()) or drift) else 0


if __name__ == "__main__":
    sys.exit(main())
