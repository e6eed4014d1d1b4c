"""AQE skew-join-FIRED certification wave — round 9 (VERDICT r8 #1).

The round-7 tie-pairing defects were diagnosed as "skew-activated AQE
paths changing row pairing", but no prior gate ever made
``OptimizeSkewedJoin`` actually fire: driver data is uniform, and the
stock thresholds (256 MB / 5× median) are far above local test sizes.
This wave manufactures the trigger and certifies results through it:

1. Build a skewed-but-value-clean fixture (tools/skew_fixture.py):
   hot keys in orders (one mega-customer), lineitem (one mega-order),
   events (one mega-user). Both engines read the same parquet.
2. Sweep A — the full registry on the fixture with broadcasts off
   (every non-hinted join becomes a shuffle join AQE can split),
   skew thresholds lowered so the hot partitions REALLY split, and
   ``forceOptimizeSkewedJoin`` on (split even when it costs an extra
   shuffle — the maximal-perturbation setting). The post-execution
   formatted plan of every query is grepped for ``skew=true`` to
   PROVE the path fired; the wave fails if zero queries fired.
3. Sweep B — same fixture, AQE fully OFF (static sort-merge plans).
4. Gate: both sweeps oracle-green, and every query's
   order-insensitive value_hash identical between A and B — a result
   that depends on whether AQE split a skewed partition is broken on
   any real cluster.

Usage::

    python tools/aqeskew_wave.py [sf_dir]

Writes ``AQESKEW_r9.json`` (override with ``AQESKEW_OUT``).
Exit 1 on any oracle failure, vh drift, or zero-fired skew path.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from skew_fixture import build_skewed  # noqa: E402

SKEW_ON_CONF = (
    "spark.sql.autoBroadcastJoinThreshold=-1;"
    "spark.sql.adaptive.enabled=true;"
    "spark.sql.adaptive.skewJoin.enabled=true;"
    "spark.sql.adaptive.forceOptimizeSkewedJoin=true;"
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor=2;"
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes=16k;"
    "spark.sql.adaptive.advisoryPartitionSizeInBytes=8k;"
    "spark.sql.adaptive.coalescePartitions.minPartitionSize=4k"
)
AQE_OFF_CONF = (
    "spark.sql.autoBroadcastJoinThreshold=-1;"
    "spark.sql.adaptive.enabled=false;"
    "spark.sql.join.preferSortMergeJoin=true"
)


def run_sweep(sf_dir: str, artifact: str, extra_conf: str,
              plan_grep: str | None = None) -> dict:
    env = dict(os.environ,
               SWEEP_JSON_OUT=artifact,
               SPARK_GRAFT_EXTRA_CONF=extra_conf)
    env.pop("SWEEP_JSON_MERGE", None)
    if plan_grep:
        env["SWEEP_PLAN_GREP"] = plan_grep
    else:
        env.pop("SWEEP_PLAN_GREP", None)
    proc = subprocess.run(
        [sys.executable, f"{REPO}/tools/sweep.py", sf_dir],
        env=env, cwd=REPO)
    if not os.path.exists(artifact):
        print(f"sweep.py exited {proc.returncode} without writing "
              f"{artifact}", file=sys.stderr)
        sys.exit(2)
    with open(artifact) as f:
        return {r["q"]: r for r in json.load(f)["records"]}


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out_path = os.environ.get("AQESKEW_OUT", f"{REPO}/AQESKEW_r9.json")

    skew_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        f"aqeskew_{os.path.basename(sf_dir.rstrip('/'))}")
    build_skewed(sf_dir, skew_dir)
    print(f"skewed fixture at {skew_dir}", flush=True)

    art_a = os.path.join(skew_dir, "sweep_skew_on.json")
    art_b = os.path.join(skew_dir, "sweep_aqe_off.json")
    a = run_sweep(skew_dir, art_a, SKEW_ON_CONF, plan_grep="skew=true")
    b = run_sweep(skew_dir, art_b, AQE_OFF_CONF)

    fired = sorted(q for q, r in a.items()
                   if r.get("plan_hits", {}).get("skew=true", 0) > 0)
    fail_a = sorted(q for q, r in a.items() if not r["ok"])
    fail_b = sorted(q for q, r in b.items() if not r["ok"])
    drift = sorted(
        q for q in a
        if q in b and a[q].get("vh") and b[q].get("vh")
        and a[q]["vh"] != b[q]["vh"])

    doc = {
        "sf": sf_dir,
        "fixture": skew_dir,
        "skew_on_conf": SKEW_ON_CONF,
        "aqe_off_conf": AQE_OFF_CONF,
        "n_queries": len(a),
        "n_skew_fired": len(fired),
        "skew_fired": fired,
        "oracle_failures_skew_on": fail_a,
        "oracle_failures_aqe_off": fail_b,
        "vh_drift_skew_on_vs_aqe_off": drift,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v for k, v in doc.items()
                      if k != "skew_fired"}, indent=1))
    print(f"skew fired in {len(fired)} queries; e.g. {fired[:8]}")
    return 1 if (fail_a or fail_b or drift or not fired) else 0


if __name__ == "__main__":
    sys.exit(main())
