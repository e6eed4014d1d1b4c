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
