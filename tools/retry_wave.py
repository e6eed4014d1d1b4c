"""Task-retry / speculation invariance wave — round 9 (VERDICT r8 #2).

A 100 TB job re-executes thousands of tasks (lost executors, fetch
failures, speculation); nothing had certified that results are
replay-invariant. Two parts:

**Speculation probe** (recorded, not a gate): Spark's speculation
scheduler is CLUSTER-ONLY — ``TaskSchedulerImpl.start`` only starts
the speculation thread when the backend is not local (public Spark
source, core/src/main/scala/org/apache/spark/scheduler/
TaskSchedulerImpl.scala). The probe proves that empirically: a stage
with an 8 s straggler under maximally aggressive speculation confs
(interval 50ms, quantile 0.1, multiplier 1.0, minTaskRuntime 0) still
launches exactly n_partitions task attempts. Speculation therefore
cannot be exercised in this image; its correctness consequence — the
same partition computed twice, one attempt's output committed — is
exactly what the retry gate below exercises via failed-then-retried
attempts, which share the commit-protocol path speculation uses.

**Retry gate** (the wave): run the FULL registry twice on the same
sf dir —

* quiet: stock session, no injection;
* injected: ``SPARK_GRAFT_FAULT_INJECT=1`` makes every driver-table
  scan fail the FIRST attempt of every third task
  (io._maybe_fault_inject), with ``SPARK_GRAFT_TASK_RETRIES=4`` so
  the re-attempts run (plain local[N] would kill the job — the
  included canary asserts BOTH behaviors, proving the injection is
  live and not silently off)

— and assert per-query oracle-green on both sides plus value-hash
equality quiet-vs-injected. Any query whose result depends on attempt
identity is a real 100 TB bug.

Usage::

    python tools/retry_wave.py [sf_dir]

Writes ``RETRY_r9.json`` (override with ``RETRY_OUT``). Exit 1 on any
failure/drift; exit 2 on harness trouble.
"""

from __future__ import annotations

import glob
import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

_SPEC_PROBE = """
import os, sys, time, glob
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .appName("specprobe")
         .config("spark.speculation", "true")
         .config("spark.speculation.interval", "50ms")
         .config("spark.speculation.quantile", "0.1")
         .config("spark.speculation.multiplier", "1.0")
         .config("spark.speculation.minTaskRuntime", "0ms")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
outdir = {outdir!r}
def f(it):
    from pyspark import TaskContext
    ctx = TaskContext.get()
    open(os.path.join(outdir, "%d_%d_%d_%d" % (
        ctx.stageId(), ctx.partitionId(), ctx.attemptNumber(),
        ctx.taskAttemptId())), "w").close()
    if ctx.partitionId() == 0:
        time.sleep(8)
    yield from it
df = spark.range(0, 80, 1, 8).mapInPandas(f, "id long")
assert df.count() == 80
spark.stop()
"""

_CANARY = """
import sys
sys.path.insert(0, {repo!r})
from ecommerce_analytics_spark.session import get_spark
from ecommerce_analytics_spark.io import load_table
spark = get_spark("retry-canary")
print("CANARY-COUNT", load_table(spark, {sf!r}, "lineitem").count())
"""


def _run_sweep(sf_dir: str, artifact: str, inject: bool) -> dict:
    env = dict(os.environ, SWEEP_JSON_OUT=artifact)
    env.pop("SWEEP_JSON_MERGE", None)
    env.pop("SWEEP_PLAN_GREP", None)
    if inject:
        env["SPARK_GRAFT_FAULT_INJECT"] = "1"
        env["SPARK_GRAFT_TASK_RETRIES"] = "4"
    else:
        env.pop("SPARK_GRAFT_FAULT_INJECT", None)
        env.pop("SPARK_GRAFT_TASK_RETRIES", None)
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
    out_path = os.environ.get("RETRY_OUT", f"{REPO}/RETRY_r9.json")
    work = tempfile.mkdtemp(prefix="retry_wave_")

    # 1. Speculation probe: aggressive confs + straggler, count attempts.
    spec_dir = os.path.join(work, "spec_canary")
    os.makedirs(spec_dir)
    subprocess.run([sys.executable, "-c",
                    _SPEC_PROBE.format(repo=REPO, outdir=spec_dir)],
                   cwd=REPO, check=True)
    spec_attempts = len(glob.glob(f"{spec_dir}/*"))
    print(f"speculation probe: {spec_attempts} attempts for 8 "
          f"partitions (8 == scheduler never speculated)", flush=True)

    # 2. Canary: injection must KILL a plain local[N] job and SUCCEED
    #    under local[N,4] — proves the fault hook is live end-to-end.
    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith("SPARK_GRAFT_FAULT")
                and k != "SPARK_GRAFT_TASK_RETRIES"}
    code = _CANARY.format(repo=REPO, sf=sf_dir)
    no_retry = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True,
        text=True, env=dict(base_env, SPARK_GRAFT_FAULT_INJECT="1"))
    with_retry = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True,
        text=True, env=dict(base_env, SPARK_GRAFT_FAULT_INJECT="1",
                            SPARK_GRAFT_TASK_RETRIES="4"))
    canary = {
        "injection_kills_plain_local": "CANARY-COUNT" not in no_retry.stdout,
        "injection_survives_retries": "CANARY-COUNT" in with_retry.stdout,
    }
    print(f"canary: {canary}", flush=True)
    if not all(canary.values()):
        print("fault-injection canary failed — wave would be vacuous",
              file=sys.stderr)
        return 2

    # 3. The gate: full registry, quiet vs injected.
    quiet = _run_sweep(sf_dir, os.path.join(work, "sweep_quiet.json"),
                       inject=False)
    injected = _run_sweep(sf_dir, os.path.join(work, "sweep_injected.json"),
                          inject=True)

    fail_q = sorted(q for q, r in quiet.items() if not r["ok"])
    fail_i = sorted(q for q, r in injected.items() if not r["ok"])
    drift = sorted(q for q in quiet
                   if q in injected and quiet[q].get("vh")
                   and injected[q].get("vh")
                   and quiet[q]["vh"] != injected[q]["vh"])

    doc = {
        "sf": sf_dir,
        "speculation_probe": {
            "partitions": 8, "task_attempts": spec_attempts,
            "conclusion": "local-mode scheduler never speculates "
                          "(TaskSchedulerImpl starts the speculation "
                          "thread only on non-local backends); retry "
                          "gate carries the semantics",
        },
        "canary": canary,
        "n_queries": len(injected),
        "oracle_failures_quiet": fail_q,
        "oracle_failures_injected": fail_i,
        "vh_drift_quiet_vs_injected": drift,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))
    shutil.rmtree(work, ignore_errors=True)
    return 1 if (fail_q or fail_i or drift or spec_attempts != 8) else 0


if __name__ == "__main__":
    sys.exit(main())
