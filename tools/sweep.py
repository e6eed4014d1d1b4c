"""Full-registry driver-gate simulation.

Runs every ``queries()`` entry in ``__spark_entry__.py`` against its
``oracle_sql()`` twin at a chosen scale factor and prints one JSON
object per query: rows / schema / value-multiset match, exactly the
comparison the round driver records in ``CORRECTNESS_r{N}.json``
(including the pandas ``sort_values`` canonicalization that crashes on
list-typed columns — see ``testing.driver_canon``).

Usage::

    python tools/sweep.py [sf_dir] [name-substring ...]

Defaults to ``/root/testdata/sf0.01``. Exit code 1 on any mismatch.

Set ``SWEEP_JSON_OUT=/path/to/SWEEP_rN.json`` to also write the full
per-query record list as one JSON document (VERDICT r3 #3: the
committed artifact lets the judge diff the self-run sweep against the
driver's CORRECTNESS_rN row-for-row).
"""

from __future__ import annotations

import importlib.util
import json
import os
import pathlib
import sys
import time

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

from ecommerce_analytics_spark.session import get_spark  # noqa: E402
from ecommerce_analytics_spark.testing import (  # noqa: E402
    compare_frames, duckdb_oracle)


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", f"{REPO}/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[2:]
    entry = load_entry()
    queries = entry.queries()
    oracles = entry.oracle_sql()
    spark = get_spark()
    failures = 0
    records: list[dict] = []
    t_all = time.time()
    for name, fn in queries.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        rec: dict = {"q": name, "sf": sf_dir}
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spark_pdf)
            sql = oracles.get(name)
            if sql is None:
                rec["mode"] = "rows-only"
                # The driver still canonicalizes rows-only results.
                from ecommerce_analytics_spark.testing import driver_canon
                driver_canon(spark_pdf)
                rec["ok"] = True
            else:
                oracle_pdf = duckdb_oracle(sql, sf_dir)
                rec["oracle_rows"] = len(oracle_pdf)
                problems = compare_frames(spark_pdf, oracle_pdf, name)
                rec["ok"] = not problems
                if problems:
                    rec["problems"] = problems
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            rec["ok"] = False
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        rec["sec"] = round(time.time() - t0, 2)
        if not rec["ok"]:
            failures += 1
        records.append(rec)
        print(json.dumps(rec), flush=True)
    summary = {"total_sec": round(time.time() - t_all, 1),
               "n_queries": len(records), "failures": failures}
    print(json.dumps(summary), flush=True)
    out = os.environ.get("SWEEP_JSON_OUT")
    if out:
        doc = {"summary": summary, "records": records}
        if os.environ.get("SWEEP_JSON_MERGE") and os.path.exists(out):
            # Partial-sweep merge: replace/append the just-run records
            # in the committed artifact, keep every other row, and
            # re-derive the summary — so mid-round additions keep the
            # artifact registry-synced (test_docs_sync) without paying
            # a full re-sweep per commit. Round end still does a full
            # fresh sweep.
            with open(out) as f:
                prior = json.load(f)
            ran = {r["q"] for r in records}
            live = set(queries)
            merged = [r for r in prior["records"]
                      if r["q"] not in ran and r["q"] in live]
            merged.extend(records)
            doc = {"summary": {
                "total_sec": round(sum(r["sec"] for r in merged), 1),
                "n_queries": len(merged),
                "failures": sum(not r["ok"] for r in merged),
            }, "records": merged}
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
