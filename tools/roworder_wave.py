"""Input-layout (row-order) invariance wave — round 8.

A 1000-executor cluster reads splits in arbitrary order: the physical
row order and file layout of every table is an accident of the writer,
never a contract. The round-7 tie-pairing defects (flagship windows,
user_event_analytics, surrogate ids) were all THIS class — results
that silently depended on which of two bit-identical or tied rows a
scan delivered first. The spark-vs-oracle sweep cannot see the class
when both engines reread the same files and happen to agree; this
wave makes the layout hostile and diffs the RESULTS.

Method:

1. Build a permuted copy of the SF dir: every table's rows are
   shuffled by a seeded permutation and rewritten as a single parquet
   file (so the split geometry changes too, not just row order).
   Content is bit-identical; only layout differs.
2. Run the full registry sweep (spark vs DuckDB oracle) on the
   permuted dir — both engines must still agree on hostile layout.
3. Diff each query's order-insensitive ``value_hash`` against the
   baseline artifact from the canonical dir (which must carry ``vh``
   fields — re-run tools/sweep.py with SWEEP_JSON_OUT first if not).
   Content-identical input MUST give content-identical output; any
   ``vh`` drift is a layout-sensitivity defect unless adjudicated in
   ``LAYOUT_SENSITIVE`` below.

Usage::

    python tools/roworder_wave.py [sf_dir] [baseline_artifact]

Writes ``ROWORDER_r8.json`` (override with ``ROWORDER_OUT``).
Exit 1 on any unadjudicated failure.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pyarrow.parquet as pq

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

from ecommerce_analytics_spark.schemas import DRIVER_TABLES  # noqa: E402

SEED = 8_2026

# Queries whose outputs may legitimately differ across physical input
# layouts, each with the reason. Keep this SHORT — every entry is a
# documented concession, not a shrug.
LAYOUT_SENSITIVE: dict[str, str] = {}


def build_permuted(sf_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(SEED)
    for name in DRIVER_TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        if os.path.isdir(src):  # gen_scale output: glob the parts
            table = pq.ParquetDataset(src).read()
        else:
            table = pq.read_table(src)
        perm = rng.permutation(table.num_rows)
        pq.write_table(table.take(perm),
                       os.path.join(out_dir, f"{name}.parquet"))
        print(f"permuted {name}: {table.num_rows} rows", flush=True)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    baseline_path = argv[1] if len(argv) > 1 else f"{REPO}/SWEEP_r8.json"
    out_path = os.environ.get("ROWORDER_OUT", f"{REPO}/ROWORDER_r8.json")

    with open(baseline_path) as f:
        baseline = {r["q"]: r for r in json.load(f)["records"]}
    missing_vh = [q for q, r in baseline.items() if "vh" not in r]
    if missing_vh:
        print(f"baseline artifact lacks vh for {len(missing_vh)} queries "
              f"(e.g. {missing_vh[:3]}); re-run tools/sweep.py with "
              f"SWEEP_JSON_OUT={baseline_path} first", file=sys.stderr)
        return 2

    perm_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"roworder_{os.path.basename(sf_dir.rstrip('/'))}_{SEED}")
    build_permuted(sf_dir, perm_dir)

    perm_artifact = os.path.join(perm_dir, "sweep_permuted.json")
    env = dict(os.environ, SWEEP_JSON_OUT=perm_artifact)
    env.pop("SWEEP_JSON_MERGE", None)
    proc = subprocess.run(
        [sys.executable, f"{REPO}/tools/sweep.py", perm_dir],
        env=env, cwd=REPO)
    if not os.path.exists(perm_artifact):
        # sweep.py writes the artifact only at sweep END — a crash mid-run
        # leaves nothing; report the sweep failure, not a FileNotFoundError.
        print(f"sweep.py exited {proc.returncode} without writing "
              f"{perm_artifact}; see its output above", file=sys.stderr)
        return 2
    with open(perm_artifact) as f:
        permuted = {r["q"]: r for r in json.load(f)["records"]}

    oracle_failures = sorted(
        q for q, r in permuted.items() if not r["ok"])
    drifted = sorted(
        q for q, r in permuted.items()
        if r.get("vh") and baseline.get(q, {}).get("vh")
        and r["vh"] != baseline[q]["vh"] and q not in LAYOUT_SENSITIVE)
    adjudicated = sorted(
        q for q, r in permuted.items()
        if q in LAYOUT_SENSITIVE and r.get("vh")
        and baseline.get(q, {}).get("vh") and r["vh"] != baseline[q]["vh"])

    doc = {
        "seed": SEED,
        "sf": sf_dir,
        "n_queries": len(permuted),
        "oracle_failures_on_permuted": oracle_failures,
        "vh_drift": drifted,
        "vh_drift_adjudicated": {q: LAYOUT_SENSITIVE[q] for q in adjudicated},
        "sweep_exit": proc.returncode,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))
    return 1 if (oracle_failures or drifted) else 0


if __name__ == "__main__":
    sys.exit(main())
