"""Generated docs stay in sync with the registry (ADVICE r2: QUERIES.md
was regenerated before two queries were registered and silently went
stale)."""

from __future__ import annotations

import pathlib
import re

from ecommerce_analytics_spark.plans.registry import all_queries

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_queries_md_matches_registry():
    qs = all_queries()
    n_oracle = sum(1 for q in qs.values() if q.oracle is not None)
    text = (REPO / "QUERIES.md").read_text()
    rows = re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.MULTILINE)
    assert sorted(rows) == sorted(qs), (
        "QUERIES.md rows != registry — rerun tools/gen_queries_md.py")
    header = re.search(r"^(\d+) registered queries; (\d+) with", text,
                       re.MULTILINE)
    assert header and (int(header.group(1)), int(header.group(2))) == (
        len(qs), n_oracle), "QUERIES.md totals stale"


def test_every_registered_query_has_an_oracle():
    """Driver-sample invariance (VERDICT r4 #1): a rows-only registry
    entry surfaces as ``err: no_oracle`` whenever the driver samples
    it. Non-SQL-expressible surfaces live in pytest; everything the
    registry exposes must be oracle-certifiable."""
    missing = [n for n, q in all_queries().items() if q.oracle is None]
    assert not missing, (
        f"registered queries without oracles (move raw output to a "
        f"pytest surface + register the certified companion): {missing}")


def test_sweep_artifact_matches_registry():
    """Registry-vs-artifact drift guard (VERDICT r4 #2): the committed
    SWEEP_r{N}.json must cover exactly the current registry — a
    registry change without a fresh full sweep fails here. Regenerate
    with ``SWEEP_JSON_OUT=SWEEP_r<N>.json python tools/sweep.py`` as
    the last gate before round end."""
    import json

    sweeps = sorted(REPO.glob("SWEEP_r*.json"),
                    key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)))
    assert sweeps, "no committed SWEEP_r*.json artifact"
    data = json.loads(sweeps[-1].read_text())
    swept = {r["q"] for r in data["records"]}
    qs = set(all_queries())
    assert swept == qs, (
        f"{sweeps[-1].name} drifted from registry: "
        f"missing={sorted(qs - swept)} extra={sorted(swept - qs)}")
    bad = [r["q"] for r in data["records"] if not r["ok"]]
    assert not bad, f"committed sweep has failures: {bad}"
