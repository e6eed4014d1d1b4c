"""Shuffle-partition-count invariance wave — round 10.

``spark.sql.shuffle.partitions`` is the knob every deployment sets
differently (local[32] pins 32; a 1000-executor cluster runs
thousands, or leaves AQE to coalesce at runtime). No result may
depend on it: partition count changes every exchange's physical row
grouping, which is exactly where nondeterminism hides —
underdetermined window tie-breaks (row_number over a non-total
order), accumulation-order float sums surfaced through >= threshold
comparisons, first()/head-like picks, partition-sensitive sampling.
The committed sweeps all ran at 32; this wave re-runs the FULL
registry at a hostile pair of counts and requires:

1. oracle-green at both (the driver's own comparison), and
2. order-insensitive value_hash IDENTICAL per query across 7, 64,
   and the committed-32 artifact (SWEEP_JSON_BASE) — a result that
   changes with the shuffle width is broken on every real cluster.

7 is deliberately adversarial: odd, smaller than the 32-thread
parallelism, forces multi-key partitions and heavy AQE coalescing.
64 over-partitions (empty partitions, 1-row partitions at sf0.01).

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


def run_sweep(sf_dir: str, artifact: str, n_parts: int) -> dict:
    env = dict(os.environ,
               SWEEP_JSON_OUT=artifact,
               SPARK_GRAFT_EXTRA_CONF=(
                   f"spark.sql.shuffle.partitions={n_parts}"))
    env.pop("SWEEP_JSON_MERGE", None)
    subprocess.run([sys.executable, f"{REPO}/tools/sweep.py", sf_dir],
                   env=env, cwd=REPO)
    if not os.path.exists(artifact):
        print(f"sweep at shuffle.partitions={n_parts} wrote no artifact",
              file=sys.stderr)
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
    runs = {n: run_sweep(sf_dir, f"{tmp}/sweep_sp{n}.json", n)
            for n in (7, 64)}

    failures: dict[int, list[str]] = {
        n: sorted(q for q, r in recs.items() if not r["ok"])
        for n, recs in runs.items()}
    drift = sorted(
        q for q in base
        if any(q in recs and recs[q].get("vh")
               and base[q].get("vh") and recs[q]["vh"] != base[q]["vh"]
               for recs in runs.values()))

    doc = {
        "wave": "shuffle-partition-invariance",
        "sf": sf_dir,
        "widths": [7, 64],
        "base_artifact": os.path.basename(base_path),
        "n_queries": len(base),
        "oracle_failures": {str(n): f for n, f in failures.items()},
        "vh_drift_vs_base": drift,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    return 1 if (any(failures.values()) or drift) else 0


if __name__ == "__main__":
    sys.exit(main())
