"""OS-timezone hostility wave — round 11 (VERDICT r10 #4).

The session pins ``spark.sql.session.timeZone=UTC`` (session.py) and
every run to date ALSO had OS TZ = UTC, so the pin has never actually
been load-bearing: a to_timestamp/date_format/window-boundary leak
through the JVM default timezone, the Python process timezone, or the
DuckDB oracle's ICU timezone would have been invisible. This wave
exports ``TZ=America/New_York`` (a DST-observing zone 4-5h behind
UTC, so any leak shifts values) into fresh worker processes — JVM,
Python, and DuckDB all inherit it — and certifies:

1. **Full-registry sweep** — all 241 queries vs their DuckDB oracles
   at sf0.01 under the hostile OS zone. Gate: every query green AND
   ``value_hash`` IDENTICAL to the committed UTC-host artifact
   (``SWEEP_r10.json``) — zero drift proves the UTC pin severs OS-tz
   dependence in BOTH engines.
2. **DST-transition fixture** — micro-queries straddling the
   2024-03-10 US spring-forward (07:00 UTC): hour bucketing, window
   boundaries, date_format, and unix round-trips must produce the
   hardcoded UTC answers under the hostile zone (a session pinned to
   the OS zone would bucket 06:30Z and 07:30Z into the same or
   shifted local hours). Mirrored in tests/test_tz_hostile.py as the
   always-on pytest gate.

Usage::

    python tools/tz_wave.py [sf_dir] [sweep_baseline]

Writes ``TZWAVE_r11.json`` (override with ``TZWAVE_OUT``).
Exit 1 on any drift or fixture mismatch.
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

HOSTILE_TZ = "America/New_York"


def _tz_env() -> dict:
    env = dict(os.environ)
    env["TZ"] = HOSTILE_TZ
    env.pop("SWEEP_JSON_MERGE", None)
    return env


# ---------------------------------------------------------------- fixture

def dst_probe() -> None:
    """Runs with OS TZ hostile; prints one JSON line of observed values
    that must equal the UTC ground truth."""
    import time as _time
    _time.tzset()

    import duckdb

    from pyspark.sql import functions as F
    from ecommerce_analytics_spark.session import get_spark

    spark = get_spark("tz_dst_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # 2024-03-10: America/New_York springs forward at 07:00 UTC
    # (01:59:59 EST -> 03:00:00 EDT). Rows at 06:30Z and 07:30Z are
    # 1h apart in UTC but land at 01:30 EST and 03:30 EDT locally —
    # local-hour bucketing would put a 2h gap between them, and the
    # nonexistent local hour 02:xx is where naive conversions throw
    # or shift.
    rows = [("2024-03-10 06:30:00",), ("2024-03-10 07:30:00",)]
    df = (spark.createDataFrame(rows, "s string")
          .withColumn("ts", F.to_timestamp("s")))
    got = df.select(
        F.hour("ts").alias("h"),
        F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt"),
        F.window("ts", "1 hour").start.cast("string").alias("w"),
        F.unix_timestamp("ts").alias("ux"),
        F.from_unixtime(F.unix_timestamp("ts")).alias("rt"),
    ).orderBy("h").collect()
    spark_obs = [[r["h"], r["fmt"], r["w"], r["ux"], r["rt"]]
                 for r in got]
    con = duckdb.connect()
    con.execute(f"SET TimeZone='UTC'")
    duck_obs = con.execute(
        "select extract(hour from ts), strftime(ts, '%Y-%m-%d %H:%M'), "
        "cast(time_bucket(interval 1 hour, ts) as varchar), "
        "cast(epoch(ts) as bigint) "
        "from (select cast(s as timestamp) ts from (values "
        "('2024-03-10 06:30:00'), ('2024-03-10 07:30:00')) v(s)) "
        "order by 1").fetchall()
    print(json.dumps({"os_tz": os.environ.get("TZ"),
                      "spark": spark_obs,
                      "duckdb": [list(map(str, r)) for r in duck_obs]}),
          flush=True)
    spark.stop()


WANT_SPARK = [
    [6, "2024-03-10 06:30", "2024-03-10 06:00:00",
     1710052200, "2024-03-10 06:30:00"],
    [7, "2024-03-10 07:30", "2024-03-10 07:00:00",
     1710055800, "2024-03-10 07:30:00"],
]
WANT_DUCK = [
    ["6", "2024-03-10 06:30", "2024-03-10 06:00:00", "1710052200"],
    ["7", "2024-03-10 07:30", "2024-03-10 07:00:00", "1710055800"],
]


def run_dst_fixture() -> tuple[dict, list[str]]:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--dst-probe"],
        env=_tz_env(), cwd=REPO, capture_output=True, text=True,
        timeout=600)
    rec = {}
    for line in (proc.stdout or "").splitlines():
        if line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                pass
    failures = []
    if not rec:
        return ({"rc": proc.returncode,
                 "stderr": (proc.stderr or "")[-500:]},
                ["dst probe produced no record"])
    if rec.get("spark") != WANT_SPARK:
        failures.append(f"spark DST values shifted under OS "
                        f"TZ={HOSTILE_TZ}: {rec.get('spark')}")
    if rec.get("duckdb") != WANT_DUCK:
        failures.append(f"duckdb DST values shifted under OS "
                        f"TZ={HOSTILE_TZ}: {rec.get('duckdb')}")
    return rec, failures


# ------------------------------------------------------------------ main

def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    baseline_path = argv[1] if len(argv) > 1 else f"{REPO}/SWEEP_r10.json"
    out_path = os.environ.get("TZWAVE_OUT", f"{REPO}/TZWAVE_r11.json")
    tmp = tempfile.mkdtemp(prefix="tz_wave_")
    failures: list[str] = []

    fixture_rec, fx_fail = run_dst_fixture()
    failures += fx_fail
    print(json.dumps({"leg": "dst_fixture", "record": fixture_rec,
                      "failures": fx_fail}), flush=True)

    with open(baseline_path) as f:
        baseline = {r["q"]: r for r in json.load(f)["records"]}
    art = f"{tmp}/sweep_tz.json"
    env = _tz_env()
    env["SWEEP_JSON_OUT"] = art
    proc = subprocess.run([sys.executable, f"{REPO}/tools/sweep.py",
                           sf_dir], env=env, cwd=REPO)
    sweep_rec: dict = {}
    if not os.path.exists(art):
        failures.append("tz sweep wrote no artifact")
    else:
        with open(art) as f:
            doc = json.load(f)
        recs = {r["q"]: r for r in doc["records"]}
        if proc.returncode != 0:
            failures.append(
                f"tz sweep exit {proc.returncode}: "
                f"{[q for q, r in recs.items() if not r.get('ok')]}")
        drift = sorted(
            q for q, r in recs.items()
            if q in baseline and "vh" in baseline[q]
            and r.get("vh") != baseline[q]["vh"])
        if drift:
            failures.append(f"value-hash drift under OS "
                            f"TZ={HOSTILE_TZ}: {drift}")
        sweep_rec = {
            "n_queries": doc["summary"]["n_queries"],
            "sweep_failures": doc["summary"]["failures"],
            "total_sec": doc["summary"].get("total_sec"),
            "baseline": os.path.basename(baseline_path),
            "vh_drift": drift,
        }

    artifact = {
        "wave": "os-timezone-hostility",
        "hostile_tz": HOSTILE_TZ,
        "sf_dir": sf_dir,
        "dst_fixture": fixture_rec,
        "sweep": sweep_rec,
        "failures": failures,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"failures": failures, "artifact": out_path}))
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--dst-probe":
        dst_probe()
    else:
        sys.exit(main())
