"""Referees for textrank_keywords: (1) a plain-Python integer
recomputation must be BIT-IDENTICAL (the fixed-point math is engine-
free); (2) the fixed-point ranks must track a plain float weighted
PageRank to the accumulated truncation bound, certifying the integer
discipline computes the algorithm it claims."""

from __future__ import annotations

import collections

import duckdb


def _graph(sf_dir: str):
    docs = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    w: collections.Counter = collections.Counter()
    for (text,) in docs:
        t = text.split(" ")
        for a, b in zip(t, t[1:]):
            if a != b:
                w[(min(a, b), max(a, b))] += 1
    edges: dict[str, list] = collections.defaultdict(list)
    for (lo, hi), c in w.items():
        edges[lo].append((hi, c))
        edges[hi].append((lo, c))
    strength = {n: sum(c for _, c in nb) for n, nb in edges.items()}
    return edges, strength


def test_textrank_bit_identical_to_python_ints(spark, sf_dir):
    from ecommerce_analytics_spark.operators.textrank import (
        TR_D_DEN, TR_D_NUM, TR_FIX, TR_ITERS, TR_TOP_K)
    from ecommerce_analytics_spark.plans.registry import query_map

    got = query_map()["textrank_keywords"](spark, sf_dir).collect()

    edges, strength = _graph(sf_dir)
    n = len(strength)
    base = TR_FIX * (TR_D_DEN - TR_D_NUM) // (TR_D_DEN * n)
    rank = {u: TR_FIX // n for u in strength}
    for _ in range(TR_ITERS):
        incoming: collections.Counter = collections.Counter()
        for v, nb in edges.items():
            rv, sv = rank[v], strength[v]
            for u, c in nb:
                incoming[u] += (rv * c) // sv
        rank = {u: base + (TR_D_NUM * incoming[u]) // TR_D_DEN
                for u in strength}

    top = sorted(strength, key=lambda u: (-rank[u], u))[:TR_TOP_K]
    assert [r["word"] for r in got] == sorted(
        top, key=lambda u: (-rank[u], u))
    for r in got:
        assert r["textrank_fix"] == rank[r["word"]], r["word"]
        assert r["strength"] == strength[r["word"]]


def test_textrank_tracks_float_weighted_pagerank(spark, sf_dir):
    from ecommerce_analytics_spark.operators.textrank import (
        TR_FIX, TR_ITERS)
    from ecommerce_analytics_spark.plans.registry import query_map

    got = query_map()["textrank_keywords"](spark, sf_dir).collect()

    edges, strength = _graph(sf_dir)
    n = len(strength)
    rank = {u: 1.0 / n for u in strength}
    for _ in range(TR_ITERS):
        incoming = collections.defaultdict(float)
        for v, nb in edges.items():
            rv, sv = rank[v], strength[v]
            for u, c in nb:
                incoming[u] += rv * c / sv
        rank = {u: 0.15 / n + 0.85 * incoming[u] for u in strength}

    # per-edge-round truncation <= 1 fix unit; generous envelope
    max_deg = max(len(nb) for nb in edges.values())
    tol = (TR_ITERS * (max_deg + 2) + 2) / TR_FIX
    for r in got:
        assert abs(r["textrank_fix"] / TR_FIX - rank[r["word"]]) < tol


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
