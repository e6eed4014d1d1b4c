"""Multi-JVM executor certification wave — round 11 (VERDICT r10 #1).

Every green result to date ran ``local[32]``: ONE JVM, where closures
are never serialized across a process boundary, broadcasts never cross
RPC, and shuffle blocks are read from the same heap that wrote them.
``local-cluster[n,cores,mem_mb]`` is Spark's built-in standalone-mode
harness that launches REAL separate executor JVMs on this host — real
task/closure serialization, broadcast over RPC, network shuffle fetch,
disk-backed block transfer, and per-executor Python worker daemons —
without needing a cluster manager. This is exactly where a
"works-on-local" engine dies on a real cluster (an unserializable
lambda capture, a pandas-UDF worker env divergence, a driver-path
dependency smuggled into an executor). Three legs:

1. **Topology probe** — positive proof the multi-JVM boundary exists:
   master string is ``local-cluster[...]``, the executor-memory map
   has driver + 2 executors, and a 16-partition Python job observes
   >= 2 DISTINCT pyspark-daemon parent PIDs (one daemon per executor
   JVM — a single-JVM run shows exactly one).
2. **Full-registry sweep** — all 241 ``queries()`` entries vs their
   DuckDB oracles at sf0.01 (tools/sweep.py, the driver's own
   comparison) under the local-cluster session. Gate: every query
   oracle-green AND order-insensitive ``value_hash`` IDENTICAL to the
   committed single-JVM artifact (``SWEEP_r10.json``) — the adjudicated
   exception list is EMPTY, matching the row-order and shuffle-width
   waves.
3. **Streaming stateful twins** — the rocksdb_wave worker (13
   ``applyInPandasWithState`` twins + both e2e pipeline topologies
   with a checkpoint-restart leg) re-run under local-cluster, once on
   the heap backend and once on RocksDB+changelog (the production
   config), each value-hash-compared to the committed single-JVM
   ``ROCKSDB_r10.json`` hashes. State stores live IN the executor
   JVMs here, so this also covers executor-side state lifecycle.

Executor JVMs do not inherit the driver's ``sys.path``; the wave sets
``spark.executorEnv.PYTHONPATH`` to the repo root so executor-side
Python workers can unpickle package functions — the same thing
``--py-files``/a wheel does on a real cluster (documented in
DEPLOY_100TB.md).

Usage::

    python tools/localcluster_wave.py [sf_dir] [sweep_baseline]

Writes ``LOCALCLUSTER_r11.json`` (override with ``LOCALCLUSTER_OUT``).
Exit 1 on any drift, oracle failure, or topology-proof failure.
Reference semantics under test: the whole registry (SURVEY §2) plus
SURVEY §3.2's process/node-boundary claim.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

MASTER = "local-cluster[2,8,8192]"
# 6g executor heaps inside the 8g worker allowance; PYTHONPATH so
# executor python workers can import the package when unpickling.
LC_CONF = (f"spark.executor.memory=6g;"
           f"spark.executorEnv.PYTHONPATH={REPO}")

# Queries whose value hash may legitimately differ between single-JVM
# and multi-JVM execution, each with a written reason. Empty — the
# registry is certified layout- and width-invariant (ROWORDER_r10,
# SHUFFLEPART_r10), and a process boundary must not change any answer.
CLUSTER_SENSITIVE: dict[str, str] = {}


def _lc_env(extra_conf: str = "") -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_MASTER"] = MASTER
    conf = LC_CONF + (";" + extra_conf if extra_conf else "")
    env["SPARK_GRAFT_EXTRA_CONF"] = conf
    env.pop("SWEEP_JSON_MERGE", None)
    return env


# ---------------------------------------------------------------- probe

def probe_worker() -> None:
    """Runs inside the local-cluster session; prints one JSON line."""
    import time

    from ecommerce_analytics_spark.session import get_spark

    spark = get_spark("localcluster_probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    deadline = time.time() + 60
    n_exec = 0
    while time.time() < deadline:
        n_exec = sc._jsc.sc().getExecutorMemoryStatus().size()
        if n_exec >= 3:  # driver + 2 executors registered
            break
        time.sleep(1)

    def daemon_ppid(_):
        import os as _os
        yield _os.getppid()

    ppids = set(sc.range(0, 16, numSlices=16)
                .mapPartitions(daemon_ppid).collect())
    # a real shuffle across the JVMs, with a value check
    total = (spark.range(0, 100000, 1, 16)
             .selectExpr("id % 97 as k", "id as v")
             .groupBy("k").sum("v").selectExpr("sum(`sum(v)`) as s")
             .collect()[0][0])
    print(json.dumps({
        "master": sc.master,
        "executor_mem_entries": n_exec,
        "distinct_daemon_ppids": sorted(ppids),
        "driver_pid": os.getpid(),
        "shuffle_sum_ok": total == sum(range(100000)),
    }), flush=True)
    spark.stop()


def run_probe() -> tuple[dict, list[str]]:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--probe"],
        env=_lc_env(), cwd=REPO, capture_output=True, text=True,
        timeout=600)
    rec, failures = {}, []
    for line in (proc.stdout or "").splitlines():
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
    if not rec:
        return ({"rc": proc.returncode,
                 "stderr": (proc.stderr or "")[-800:]}, ["probe produced "
                                                         "no record"])
    if not str(rec.get("master", "")).startswith("local-cluster"):
        failures.append(f"probe master is {rec.get('master')}")
    if rec.get("executor_mem_entries", 0) < 3:
        failures.append("fewer than driver+2 executors registered")
    ppids = rec.get("distinct_daemon_ppids", [])
    if len(ppids) < 2:
        failures.append(f"python daemons not split across JVMs: {ppids}")
    if rec.get("driver_pid") in ppids:
        failures.append("python workers parented by the DRIVER process "
                        "— not executor JVMs")
    if not rec.get("shuffle_sum_ok"):
        failures.append("cross-JVM shuffle produced a wrong sum")
    return rec, failures


# ----------------------------------------------------------------- gate

GATE_QUERIES = ("event_classification", "product_recommendations",
                "ltv_running", "dedup_minhash_lsh")


def gate_worker(sf_dir: str) -> None:
    """Small always-on pytest companion (tests/test_localcluster.py):
    topology probe + 4 representative queries under a 2-JVM
    local-cluster, printing name -> value_hash for the parent to
    compare against its own single-JVM session."""
    from ecommerce_analytics_spark.plans.registry import query_map
    from ecommerce_analytics_spark.session import get_spark
    from ecommerce_analytics_spark.testing import value_hash

    spark = get_spark("localcluster_gate")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def daemon_ppid(_):
        import os as _os
        yield _os.getppid()

    ppids = set(sc.range(0, 8, numSlices=8)
                .mapPartitions(daemon_ppid).collect())
    qmap = query_map()
    hashes = {name: value_hash(qmap[name](spark, sf_dir).toPandas())
              for name in GATE_QUERIES}
    print(json.dumps({"master": sc.master,
                      "distinct_daemon_ppids": sorted(ppids),
                      "hashes": hashes}), flush=True)
    spark.stop()


# ---------------------------------------------------------------- sweep

def run_sweep(sf_dir: str, baseline_path: str,
              tmp: str) -> tuple[dict, list[str]]:
    with open(baseline_path) as f:
        baseline = {r["q"]: r for r in json.load(f)["records"]}
    art = f"{tmp}/sweep_localcluster.json"
    env = _lc_env()
    env["SWEEP_JSON_OUT"] = art
    proc = subprocess.run(
        [sys.executable, f"{REPO}/tools/sweep.py", sf_dir],
        env=env, cwd=REPO)
    failures: list[str] = []
    if not os.path.exists(art):
        return ({"rc": proc.returncode}, ["sweep wrote no artifact"])
    with open(art) as f:
        doc = json.load(f)
    recs = {r["q"]: r for r in doc["records"]}
    if proc.returncode != 0:
        failures.append(
            f"sweep exit {proc.returncode}: "
            f"{[q for q, r in recs.items() if not r.get('ok')]}")
    missing = sorted(set(baseline) - set(recs))
    if missing:
        failures.append(f"queries missing from local-cluster run: "
                        f"{missing}")
    drift = []
    for q, r in recs.items():
        b = baseline.get(q)
        if b is None:
            continue  # new query since the baseline round — sweep ok
                      # gate still applies
        if "vh" in b and r.get("vh") != b["vh"] \
                and q not in CLUSTER_SENSITIVE:
            drift.append(q)
    if drift:
        failures.append(f"value-hash drift vs single-JVM baseline: "
                        f"{sorted(drift)}")
    summary = {
        "n_queries": doc["summary"]["n_queries"],
        "sweep_failures": doc["summary"]["failures"],
        "total_sec": doc["summary"].get("total_sec"),
        "baseline": os.path.basename(baseline_path),
        "vh_compared": sum(1 for q in recs if "vh" in baseline.get(q, {})),
        "vh_drift": sorted(drift),
        "artifact": art,
    }
    return summary, failures


# ------------------------------------------------------------- streaming

def run_streaming(sf_dir: str, tmp: str) -> tuple[dict, list[str]]:
    """rocksdb_wave worker under local-cluster, heap + RocksDB-changelog,
    hash-compared to the committed single-JVM ROCKSDB_r10.json."""
    from tools.rocksdb_wave import ROCKSDB_CHANGELOG_CONF
    committed_path = f"{REPO}/ROCKSDB_r10.json"
    with open(committed_path) as f:
        committed = json.load(f)["twins"]

    runs: dict[str, dict] = {}
    failures: list[str] = []
    for tag, extra in (("heap", ""),
                       ("rocksdb_changelog", ROCKSDB_CHANGELOG_CONF)):
        out = f"{tmp}/lc_twins_{tag}.json"
        proc = subprocess.run(
            [sys.executable, f"{REPO}/tools/rocksdb_wave.py",
             "--worker", out, sf_dir],
            env=_lc_env(extra), cwd=REPO, timeout=3600)
        if proc.returncode != 0 or not os.path.exists(out):
            failures.append(f"streaming worker ({tag}) failed "
                            f"rc={proc.returncode}")
            continue
        with open(out) as f:
            runs[tag] = json.load(f)["records"]

    comparison: dict[str, dict] = {}
    for name, base in committed.items():
        want = base.get("heap_vh")
        row = {"committed_single_jvm_vh": want}
        for tag, recs in runs.items():
            got = recs.get(name, {})
            row[f"{tag}_vh"] = got.get("vh")
            row[f"{tag}_rows"] = got.get("rows")
            if got.get("vh") != want or not got.get("rows"):
                failures.append(f"{name}: {tag} under local-cluster "
                                f"drifted from single-JVM hash")
        comparison[name] = row
    # restart invariance inside the multi-JVM runs
    for tag, recs in runs.items():
        a = recs.get("e2e_pipeline", {}).get("vh")
        b = recs.get("e2e_pipeline_restart", {}).get("vh")
        if a != b:
            failures.append(f"e2e restart drift under local-cluster "
                            f"({tag})")
    # changelog leg must prove its backend fired in the executor JVMs
    cl = runs.get("rocksdb_changelog", {})
    for name, rec in cl.items():
        if "rocksdb_fired" in rec and not rec["rocksdb_fired"] \
                and not name.startswith("e2e"):
            failures.append(f"{name}: rocksdb did not fire under "
                            f"local-cluster changelog leg")
        if rec.get("state_files", {}).get("changelog", 0) == 0:
            failures.append(f"{name}: no .changelog files under "
                            f"local-cluster changelog leg")
    return {"twins": comparison,
            "committed_baseline": os.path.basename(committed_path),
            "legs": sorted(runs)}, failures


# ----------------------------------------------------------------- main

def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    baseline = argv[1] if len(argv) > 1 else f"{REPO}/SWEEP_r10.json"
    out_path = os.environ.get("LOCALCLUSTER_OUT",
                              f"{REPO}/LOCALCLUSTER_r11.json")
    stream_sf = os.environ.get("LOCALCLUSTER_STREAM_SF",
                               "/root/testdata/sf0.001")
    tmp = tempfile.mkdtemp(prefix="localcluster_wave_")

    probe_rec, failures = run_probe()
    print(json.dumps({"leg": "probe", "record": probe_rec,
                      "failures": failures}), flush=True)

    sweep_rec, sweep_fail = ({}, ["skipped: probe failed"]) if failures \
        else run_sweep(sf_dir, baseline, tmp)
    failures += sweep_fail
    print(json.dumps({"leg": "sweep", "record": sweep_rec,
                      "failures": sweep_fail}), flush=True)

    stream_rec, stream_fail = ({}, ["skipped: probe failed"]) \
        if "probe produced no record" in " ".join(failures) \
        else run_streaming(stream_sf, tmp)
    failures += stream_fail

    artifact = {
        "wave": "local-cluster-multi-jvm",
        "master": MASTER,
        "conf": LC_CONF,
        "sf_dir": sf_dir,
        "probe": probe_rec,
        "sweep": sweep_rec,
        "streaming": stream_rec,
        "cluster_sensitive_adjudicated": CLUSTER_SENSITIVE,
        "failures": failures,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"failures": failures, "artifact": out_path}))
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        probe_worker()
    elif len(sys.argv) > 1 and sys.argv[1] == "--gate-worker":
        gate_worker(sys.argv[2])
    else:
        sys.exit(main())
