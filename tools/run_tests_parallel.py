"""Parallel pytest gate (VERDICT r5 #5).

pytest-xdist is not in the image, so this runs the suite as N
concurrent pytest PROCESSES, each with its own SparkSession
(local[32/N] threads) and its own warehouse root
(SPARK_GRAFT_WAREHOUSE → spark.sql.warehouse.dir, see session.py),
which isolates the saveAsTable/bucketed-table tests. Everything else
is already process-safe: the persisted-index tests build into pytest
tmp_path, and the registered index queries write per-run tmpdirs
(io.run_tmpdir, the ADVICE r4 fix), so no two workers ever touch the
same on-disk store.

Partitioning: test_oracle.py (the 236-query registry sweep — the bulk
of the serial 25 min) is SHARDED AT NODE LEVEL, one parametrized id
per registry query, spread round-robin; remaining files are placed
longest-processing-time-first using per-file wall times from
tools/test_durations.json (refreshed from full serial runs; unknown
files get a default).

Usage::

    python tools/run_tests_parallel.py [N]      # default 4 workers

Exit code = max of worker exit codes. Worker output lands in
/tmp/ptpar_<i>.log; a failing worker's tail is re-printed.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
DUR_FILE = REPO / "tools" / "test_durations.json"
DEFAULT_SEC = 30.0
ORACLE_FILE = "test_oracle.py"
ORACLE_SEC_PER_QUERY = 2.0


def build_groups(n: int) -> list[list[str]]:
    sys.path.insert(0, str(REPO))
    from ecommerce_analytics_spark.plans.registry import all_queries

    durations = (json.loads(DUR_FILE.read_text())
                 if DUR_FILE.exists() else {})
    files = sorted(p.name for p in (REPO / "tests").glob("test_*.py")
                   if p.name != ORACLE_FILE)

    groups: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    # oracle nodes round-robin (they dominate; spreading them evenly
    # beats LPT with a uniform per-node estimate)
    for i, name in enumerate(sorted(all_queries())):
        w = i % n
        groups[w].append(
            f"tests/{ORACLE_FILE}::test_query_matches_oracle[{name}]")
        loads[w] += ORACLE_SEC_PER_QUERY
    for f in sorted(files, key=lambda f: -durations.get(f, DEFAULT_SEC)):
        i = loads.index(min(loads))
        groups[i].append(f"tests/{f}")
        loads[i] += durations.get(f, DEFAULT_SEC)
    for i, (g, load) in enumerate(zip(groups, loads)):
        print(f"worker {i}: {len(g)} nodes, est {load:.0f}s", flush=True)
    return groups


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    groups = build_groups(n)
    cpus = max(4, 32 // len(groups))
    procs = []
    t0 = time.time()
    for i, group in enumerate(groups):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env["SPARK_GRAFT_WAREHOUSE"] = tempfile.mkdtemp(
            prefix=f"ptpar_wh_{i}_")
        log = open(f"/tmp/ptpar_{i}.log", "w")
        procs.append((i, subprocess.Popen(
            # -o addopts= : this runner IS the full gate — it must
            # override pytest.ini's default `-m "not heavy"` (the
            # driver-budget tier) and run every test, heavy included.
            [sys.executable, "-m", "pytest", "-q", "-o", "addopts=",
             "-p", "no:cacheprovider", *group],
            cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT),
            log))
    rc = 0
    for i, p, log in procs:
        code = p.wait()
        log.close()
        tail = pathlib.Path(f"/tmp/ptpar_{i}.log").read_text()[-2500:]
        summary = [ln for ln in tail.splitlines()
                   if "passed" in ln or "failed" in ln or "error" in ln]
        print(f"worker {i}: exit {code} — "
              f"{summary[-1] if summary else 'no summary'}", flush=True)
        if code:
            print(tail, flush=True)
        rc = max(rc, code)
    print(f"total wall: {time.time() - t0:.0f}s, exit {rc}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
