"""Concurrent multi-query session certification (VERDICT r7 #5).

A production cluster serves many queries per SparkSession; every green
result to date was produced serially. Two risks this pins:

* **Result stability under concurrency** — shared session state
  (conf, temp views, the in-memory catalog the bucketed lake table
  registers in) must not let simultaneous queries perturb each
  other's answers. Eight registered queries — the four cheapest
  headline plans plus the four surfaces that MUTATE session state
  (temp views in order_chain_recursive, catalog writes in
  product_recommendations_bucketed) — run on a thread pool against
  one session and must be value-multiset-identical to their serial
  runs.
* **Index-cache build races** — io.cached_index_dir's atomic-rename
  protocol is claimed benign under concurrent builders; here N
  threads race to build the same key and every one must serve the
  SAME directory with intact content, with no FileNotFound from the
  loser's discarded tree (the ADVICE r7 prune/utime hardening).

Spark's scheduler is explicitly thread-safe (one driver, many
concurrent job submissions — the FAIR-pool serving pattern); what is
NOT given is that OUR query surfaces are re-entrant. That's the
contract under test.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from ecommerce_analytics_spark.testing import _normalize

# Four cheap headline plans + the session-state mutators: temp-view
# registration (order_chain_recursive re-registers `_rec_orders` —
# re-entrancy of name-keyed views is exactly what concurrency breaks
# first), catalog table writes (bucketed lake twin), and a
# window-heavy flagship slice.
CONCURRENT_QUERIES = [
    "pricing_summary",
    "hourly_revenue",
    "ltv_running",
    "text_quality_score",
    "popular_products",
    "event_classification",
    "order_chain_recursive",
    "product_recommendations_bucketed",
]


def _multiset(pdf):
    cols, rows = _normalize(pdf, None)
    return cols, rows


def test_concurrent_queries_match_serial(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map

    qmap = query_map()
    serial = {}
    for name in CONCURRENT_QUERIES:
        serial[name] = _multiset(qmap[name](spark, sf_dir).toPandas())

    def run(name):
        return name, _multiset(qmap[name](spark, sf_dir).toPandas())

    # two full rounds of all 8 in flight at once: round 2 hits the
    # warm caches (bucketed table exists, views re-registered) — the
    # state the FIRST concurrent round created
    for _ in range(2):
        with ThreadPoolExecutor(max_workers=len(CONCURRENT_QUERIES)) as ex:
            results = dict(ex.map(run, CONCURRENT_QUERIES))
        for name in CONCURRENT_QUERIES:
            assert results[name] == serial[name], (
                f"{name}: concurrent result diverged from serial")


def test_concurrent_same_query_is_stable(spark, sf_dir):
    """Eight simultaneous submissions of the SAME plan (the dashboard
    stampede): every copy must return the identical multiset."""
    from ecommerce_analytics_spark.plans.registry import query_map

    fn = query_map()["event_classification"]
    base = _multiset(fn(spark, sf_dir).toPandas())

    with ThreadPoolExecutor(max_workers=8) as ex:
        outs = list(ex.map(
            lambda _: _multiset(fn(spark, sf_dir).toPandas()), range(8)))
    assert all(o == base for o in outs)


def test_concurrent_index_cache_build_race(tmp_path, monkeypatch):
    """N threads race cached_index_dir on one cold key: exactly the
    winner's rename lands, every caller gets the same dir, content is
    intact, and no loser crashes. Builders write real content so a
    half-pruned/clobbered tree would be detectable."""
    import tempfile

    from ecommerce_analytics_spark import io as eio

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "embeddings.parquet").write_bytes(b"corpus-bytes")

    built = []

    def builder(p):
        os.makedirs(p)
        # multi-file content: a rename-vs-rmtree race would lose files
        for i in range(5):
            with open(os.path.join(p, f"part-{i}"), "w") as f:
                f.write(f"payload-{i}")
        built.append(p)

    def resolve(_):
        return eio.cached_index_dir(str(sf), "race_fam", "tok", builder)

    with ThreadPoolExecutor(max_workers=8) as ex:
        dests = list(ex.map(resolve, range(8)))

    assert len(set(dests)) == 1 and dests[0] is not None
    dest = dests[0]
    assert sorted(os.listdir(dest)) == [f"part-{i}" for i in range(5)]
    for i in range(5):
        with open(os.path.join(dest, f"part-{i}")) as f:
            assert f.read() == f"payload-{i}"
    # losers' tmp trees were discarded, not left to be served later
    fam = os.path.dirname(dest)
    assert [n for n in os.listdir(fam) if ".tmp" in n] == []
    # subsequent warm hit: no rebuild
    n_before = len(built)
    assert eio.cached_index_dir(str(sf), "race_fam", "tok",
                                builder) == dest
    assert len(built) == n_before


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
