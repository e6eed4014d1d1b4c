"""Large-star/small-star CC: exactness vs label propagation, and the
O(log n) convergence law that is the algorithm's reason to exist."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _labels_of(df):
    return {r["doc_id"]: r["label"] for r in df.collect()}


def test_star_equals_label_propagation_on_random_graph(spark):
    from ecommerce_analytics_spark.operators.cc_star import (
        connected_components_star)
    from ecommerce_analytics_spark.operators.dedup_resolve import (
        connected_components)

    rng = random.Random(7)
    # several components of varied shapes: chains, stars, cliques
    edges = []
    base = 0
    for size, shape in [(12, "chain"), (8, "star"), (6, "clique"),
                        (15, "random"), (2, "chain")]:
        ids = list(range(base, base + size))
        if shape == "chain":
            edges += list(zip(ids, ids[1:]))
        elif shape == "star":
            edges += [(ids[0], v) for v in ids[1:]]
        elif shape == "clique":
            edges += [(a, b) for i, a in enumerate(ids)
                      for b in ids[i + 1:]]
        else:
            for _ in range(2 * size):
                a, b = rng.sample(ids, 2)
                edges.append((a, b))
        base += size + 100  # gap so components stay disjoint
    df = spark.createDataFrame(edges, "a: long, b: long")

    star_labels, rounds = connected_components_star(df)
    prop_labels = connected_components(df)
    assert _labels_of(star_labels) == _labels_of(prop_labels)
    assert rounds <= 8


def test_star_path_graph_converges_logarithmically(spark):
    """A 64-node path has diameter 63: min-label propagation needs 63
    rounds; the star alternation must finish in O(log n) — the whole
    point of shipping it for chain-shaped 100 TB dedup graphs."""
    from ecommerce_analytics_spark.operators.cc_star import (
        connected_components_star)

    n = 64
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a: long, b: long")
    labels, rounds = connected_components_star(path)
    got = _labels_of(labels)
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 8, rounds


def test_star_query_matches_label_prop_query(spark, sf_dir):
    """The registered star query must equal dedup_clusters row-for-row
    (same pairs, same exact-CC semantics) — the two algorithms
    cross-certify on top of the shared DuckDB oracle."""
    from ecommerce_analytics_spark.plans.registry import query_map

    a = query_map()["dedup_clusters"](spark, sf_dir)
    b = query_map()["dedup_clusters_star"](spark, sf_dir)
    cols = ["doc_id", "canonical_doc_id", "cluster_size", "is_canonical"]
    ra = sorted(tuple(r[c] for c in cols) for r in a.collect())
    rb = sorted(tuple(r[c] for c in cols) for r in b.collect())
    assert ra == rb and len(ra) > 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
