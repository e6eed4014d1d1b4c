"""Recall properties of the ANN / LSH operators (SURVEY §2.10 N2).

The oracle tests certify the plans compute exactly what they claim;
these tests certify the claims are USEFUL — the approximate indexes
actually retrieve true neighbors:

- multi-probe IVF recall@k (vs the exact brute-force baseline) must be
  >= probe-1 recall@k: probing more cells only grows the candidate set,
  and top-k over a superset of candidates never loses a true neighbor
  it previously had.
- hyperplane-LSH near-dup must find every injected scale-copy pair —
  a ×2 copy has the identical direction, hence the identical signature
  in every band, so missing one would be a plan bug, not LSH recall.
"""

from __future__ import annotations

from ecommerce_analytics_spark.operators import similarity as sim


def _topk_sets(rows):
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict[int, set[int]], exact: dict[int, set[int]]) -> float:
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    return hits / total


def test_multiprobe_recall_dominates_probe1(spark, sf_dir):
    exact = _topk_sets(sim.q_knn_bruteforce(spark, sf_dir).collect())
    probe1 = _topk_sets(sim.q_knn_ivf(spark, sf_dir).collect())
    probe2 = _topk_sets(sim.q_knn_ivf_multiprobe(spark, sf_dir).collect())

    r1, r2 = _recall(probe1, exact), _recall(probe2, exact)
    assert r2 >= r1, f"multi-probe recall {r2} < probe-1 recall {r1}"
    # probing the top-2 cells must examine at least as many candidates
    n1 = sum(len(v) for v in probe1.values())
    n2 = sum(len(v) for v in probe2.values())
    assert n2 >= n1


def test_kmeans_ivf_recall_beats_fixed_probe1(spark, sf_dir):
    """Trained centroids + multi-probe must retrieve better than the
    probe-1 index over arbitrary fixed centroids (the claim in
    knn_ivf_kmeans's doc). Deterministic: fixed seed, fixed data."""
    exact = _topk_sets(sim.q_knn_bruteforce(spark, sf_dir).collect())
    fixed1 = _topk_sets(sim.q_knn_ivf(spark, sf_dir).collect())
    trained = _topk_sets(sim.q_knn_ivf_kmeans(spark, sf_dir).collect())
    r_fixed1, r_trained = _recall(fixed1, exact), _recall(trained, exact)
    assert r_trained >= r_fixed1, \
        f"kmeans-ivf recall {r_trained} < fixed probe-1 {r_fixed1}"


def test_lsh_neardup_finds_all_injected_copies(spark, sf_dir):
    found = {(r["vec_a"], r["vec_b"])
             for r in sim.q_embedding_neardup_lsh(spark, sf_dir).collect()}
    vec_ids = [r["vec_id"] for r in
               spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select("vec_id").collect()]
    expected = {(v, v + 1000000) for v in vec_ids if v % 40 == 0}
    missing = expected - found
    assert not missing, f"LSH missed guaranteed scale-copy pairs: {missing}"


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
