"""Per-query bench bands across rounds (VERDICT r5 #1 'done' clause:
any heavy query >2x its own best round is adjudicated in writing).

Reads every BENCH_r*.json / BENCH_HEAVY_r*.json in the repo root and
prints, per query, the min across rounds, the latest round's min, and
the ratio — flagging ratios above the threshold. Run before
committing a round's bench artifacts.

Usage::

    python tools/bench_bands.py [threshold]   # default 2.0
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def _round_key(p: pathlib.Path) -> tuple:
    """Sort artifacts by ROUND NUMBER, not lexically — 'r10' sorts
    before 'r6' as a string, which would pin 'latest' to round 9
    forever once double-digit rounds exist."""
    import re
    m = re.search(r"_r(\d+)", p.name)
    return (int(m.group(1)) if m else -1, p.name)


def _series(pattern: str) -> list[tuple[str, dict]]:
    out = []
    for p in sorted(REPO.glob(pattern), key=_round_key):
        try:
            doc = json.loads(p.read_text())
        except Exception:
            continue
        q = doc.get("queries")
        if not isinstance(q, dict) and isinstance(doc.get("tail"), str):
            # driver-wrapped artifact: the bench JSON line is embedded
            # in captured stdout
            tail = doc["tail"]
            i = tail.rfind('{"metric"')
            if i >= 0:
                try:
                    q = json.loads(
                        tail[i:].splitlines()[0]).get("queries")
                except Exception:
                    q = None
        if isinstance(q, dict):
            out.append((p.name, q))
    return out


def report(pattern: str, label: str, threshold: float) -> int:
    series = _series(pattern)
    if not series:
        return 0
    latest_name, latest = series[-1]
    flags = 0
    print(f"\n{label} (latest: {latest_name})")
    for q, cur in latest.items():
        past = [qs[q] for _, qs in series if q in qs]
        best = min(past)
        ratio = cur / best if best else float("inf")
        mark = "  <-- REGRESSION" if ratio > threshold else ""
        if mark:
            flags += 1
        print(f"  {q:34s} best {best:7.3f}  latest {cur:7.3f} "
              f"({ratio:4.2f}x){mark}")
    return flags


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    flags = report("BENCH_r[0-9]*.json", "headline", threshold)
    flags += report("BENCH_HEAVY_r[0-9]*.json", "heavy", threshold)
    if flags:
        print(f"\n{flags} quer{'y' if flags == 1 else 'ies'} above "
              f"{threshold}x of their best round — adjudicate in writing.")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
