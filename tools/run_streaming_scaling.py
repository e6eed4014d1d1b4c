"""Streaming keyed-state scaling study (VERDICT r5 #3 → SCALING.md).

Drives the keyed-state twins over synthetic file streams at ×1/×2/×5
scale and records, from Structured Streaming's own progress metrics,
the state-store size (stateOperators.numRowsTotal / memoryUsedBytes)
and per-batch latency (durationMs.triggerExecution). Two scaling axes,
chosen per twin to expose its state-growth law:

* **key cardinality** (ltv, growth, hw): state rows must track the
  number of DISTINCT KEYS (users / event types) — O(keys) — and be
  independent of how many events each key receives.
* **stream volume at fixed keys** (kmv, psi): state must stay FLAT as
  the number of distinct values / rows fed grows ×5 — O(K) per key for
  the bottom-k sketch, O(bins) for the PSI counters — the whole point
  of sketch/histogram state.

Usage::

    python tools/run_streaming_scaling.py > streaming_scaling_raw.jsonl

Each line is one (twin, scale) record; the aggregate summary (used for
SCALING.md's streaming section) is the final line.
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile

import pandas as pd

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

from ecommerce_analytics_spark.session import get_spark  # noqa: E402

BATCHES = 5
SCALES = [1, 2, 5]


def _write_batches(dirpath, frames):
    for i, pdf in enumerate(frames):
        pdf.to_parquet(f"{dirpath}/part-{i:03d}.parquet",
                       coerce_timestamps="us",
                       allow_truncated_timestamps=True)


def _events_frames(n_users: int, types=("purchase",)):
    """BATCHES frames, one event per (user, type) per batch, days
    strictly increasing across batches (ordered replay)."""
    frames = []
    eid = 0
    for b in range(BATCHES):
        rows = []
        for u in range(n_users):
            for t_i, t in enumerate(types):
                rows.append({
                    "event_id": eid, "user_id": u, "event_type": t,
                    "ts": pd.Timestamp(f"2024-02-{b + 1:02d} 12:00:00")
                    + pd.Timedelta(seconds=u),
                    "value": float(10 + (u + b) % 90), "props": "{}"})
                eid += 1
        frames.append(pd.DataFrame(rows))
    return frames


def _lineitem_frames(n_orders: int):
    frames = []
    for b in range(BATCHES):
        base = b * n_orders
        frames.append(pd.DataFrame({
            "l_orderkey": [base + i for i in range(n_orders)],
            "l_shipdate": [pd.Timestamp(f"199{5 + i % 5}-03-15").date()
                           for i in range(n_orders)],
        }))
    return frames


def _binned_frames(rows_per_batch: int):
    frames = []
    for b in range(BATCHES):
        frames.append(pd.DataFrame({
            "feature": [f"f{i % 5}" for i in range(rows_per_batch)],
            "bin": [f"b{(i // 5) % 10}" for i in range(rows_per_batch)],
        }))
    return frames


def _run_stream(spark, indir, schema, binder):
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(indir)))
    out = binder(stream)
    q = (out.writeStream.format("noop")
         .outputMode("update" if binder.__name__ == "streaming_kmv_sketch"
                     else "append")
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="sss_ckpt_"))
         .start())
    q.processAllAvailable()
    progress = [json.loads(p.json) for p in q.recentProgress]
    q.stop()
    batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    so = [p["stateOperators"][0] for p in batches
          if p.get("stateOperators")]
    durs = sorted(p["durationMs"]["triggerExecution"] for p in batches)
    return {
        "n_batches": len(batches),
        "input_rows": sum(p["numInputRows"] for p in batches),
        "state_rows_final": so[-1]["numRowsTotal"] if so else None,
        "state_bytes_final": so[-1].get("memoryUsedBytes") if so else None,
        "batch_ms_p50": durs[len(durs) // 2] if durs else None,
        "batch_ms_max": durs[-1] if durs else None,
    }


EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")
LINEITEM_SCHEMA = "l_orderkey long, l_shipdate date"
BINNED_SCHEMA = "feature string, bin string"


def main() -> None:
    from ecommerce_analytics_spark.streaming.growth_state import (
        streaming_new_vs_returning_marks)
    from ecommerce_analytics_spark.streaming.hw_state import (
        streaming_holt_winters_daily_revenue)
    from ecommerce_analytics_spark.streaming.kmv_state import (
        streaming_kmv_sketch)
    from ecommerce_analytics_spark.streaming.ltv_state import streaming_ltv
    from ecommerce_analytics_spark.streaming.psi_state import (
        streaming_actual_counts)

    spark = get_spark("streaming_scaling")
    spark.sparkContext.setLogLevel("ERROR")

    twins = [
        # (name, axis, schema, binder, frames_fn(scale))
        ("ltv", "keys", EVENTS_SCHEMA, streaming_ltv,
         lambda s: _events_frames(2000 * s)),
        ("growth", "keys", EVENTS_SCHEMA,
         streaming_new_vs_returning_marks,
         lambda s: _events_frames(2000 * s)),
        ("hw", "keys", EVENTS_SCHEMA,
         streaming_holt_winters_daily_revenue,
         lambda s: _events_frames(50, types=tuple(
             f"type{i}" for i in range(20 * s)))),
        ("kmv", "volume", LINEITEM_SCHEMA, streaming_kmv_sketch,
         lambda s: _lineitem_frames(20000 * s)),
        ("psi", "volume", BINNED_SCHEMA, streaming_actual_counts,
         lambda s: _binned_frames(20000 * s)),
    ]

    records = []
    for name, axis, schema, binder, frames_fn in twins:
        for scale in SCALES:
            indir = tempfile.mkdtemp(prefix=f"sss_{name}_x{scale}_")
            _write_batches(indir, frames_fn(scale))
            rec = {"twin": name, "axis": axis, "scale": scale}
            rec.update(_run_stream(spark, indir, schema, binder))
            shutil.rmtree(indir, ignore_errors=True)
            records.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": records}), flush=True)


if __name__ == "__main__":
    main()
