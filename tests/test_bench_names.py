"""bench.py's query lists stay registry-valid (a rename in the
registry must fail here, not at driver bench time)."""

from __future__ import annotations

import importlib.util
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_headline_and_heavy_names_exist_in_registry():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from ecommerce_analytics_spark.plans.registry import all_queries
    regs = set(all_queries())
    missing = [n for n in bench.HEADLINE + bench.HEAVY if n not in regs]
    assert not missing, missing
    assert len(set(bench.HEADLINE) & set(bench.HEAVY)) == 0
