"""IVFADC (IVF×PQ composition, VERDICT r4 #3): the persisted
build→store→serve path must equal the in-memory composition exactly,
the stored code scan must prune to the probed cell partitions, and
retrieval contracts (dense ranks, recall floor) must hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.ivfpq import (
    IVFPQ_N_PROBE, IVFPQ_RECALL_FLOOR, build_ivfpq_index, knn_ivfpq_stored,
    q_knn_ivfpq, q_knn_ivfpq_persisted_recall,
)
from ecommerce_analytics_spark.operators.similarity import (
    N_CENTROIDS, N_QUERIES, TOP_K,
)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_persisted_equals_in_memory(spark, sf_dir, tmp_path):
    """Same seeds, same fold arithmetic, doubles and int codes
    round-trip bit-exact through Parquet — retrieval through the
    cold-read store must equal the in-memory IVFADC EXACTLY."""
    path = build_ivfpq_index(spark, sf_dir, str(tmp_path / "index"))
    emb = load_table(spark, sf_dir, "embeddings")
    stored = knn_ivfpq_stored(
        spark, emb.filter(F.col("vec_id") < N_QUERIES), emb, path).collect()
    inline = q_knn_ivfpq(spark, sf_dir).collect()
    assert _canon(stored) == _canon(inline)
    assert len(stored) > 0


def test_cached_index_serve_equals_fresh_in_memory(spark, sf_dir):
    """The registered recall row serves from the content-keyed index
    cache (io.cached_index_dir, VERDICT r6 #3) — this re-derives the
    whole composition fresh in memory and asserts the cached serve is
    EXACTLY equal, re-certifying the cached artifacts every run."""
    from ecommerce_analytics_spark.operators.ivfpq import (
        q_knn_ivfpq_persisted,
    )
    cached = q_knn_ivfpq_persisted(spark, sf_dir).collect()
    fresh = q_knn_ivfpq(spark, sf_dir).collect()
    assert _canon(cached) == _canon(fresh)
    assert len(cached) > 0


def test_persisted_baseline_equals_from_scratch(spark, sf_dir):
    """knn_exact_baseline's stored copy must equal a from-scratch
    brute-force derivation exactly (VERDICT r6 #3's 'done' clause)."""
    from ecommerce_analytics_spark.operators.similarity import (
        knn_exact_baseline, q_knn_bruteforce,
    )
    cached = knn_exact_baseline(spark, sf_dir).collect()
    fresh = q_knn_bruteforce(spark, sf_dir).collect()
    assert _canon(cached) == _canon(fresh)
    assert len(cached) == len(fresh) > 0


def test_code_scan_prunes_to_probed_cells(spark, sf_dir, tmp_path):
    """The IVFADC contract: the code table is hive-partitioned by
    cell_id and a probe filter reaches the scan as a partition filter,
    so a query reads corpus/k × n_probe codes, not the corpus."""
    path = build_ivfpq_index(spark, sf_dir, str(tmp_path / "index"))
    codes = spark.read.parquet(f"{path}/codes")
    assert set(codes.columns) == {"vec_id", "codes", "cell_id"}
    one = codes.filter(F.col("cell_id") == 0)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell_id" in plan \
        or "cell_id#" in plan
    # every non-zero corpus vector is coded into exactly one cell
    n_corpus = load_table(spark, sf_dir, "embeddings").count()
    assert codes.count() == n_corpus  # no zero vectors in testdata
    assert codes.select("cell_id").distinct().count() <= N_CENTROIDS
    # 4-bit codes: PQ_M entries, each in [0, PQ_K)
    from ecommerce_analytics_spark.operators.pq import PQ_K, PQ_M
    bad = codes.filter(
        (F.size("codes") != PQ_M)
        | F.exists("codes", lambda c: (c < 0) | (c >= PQ_K))).count()
    assert bad == 0


def test_dense_ranks_and_recall_floor(spark, sf_dir):
    rows = q_knn_ivfpq(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_q) == N_QUERIES
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, min(TOP_K, len(ranks)) + 1))
    out = q_knn_ivfpq_persisted_recall(spark, sf_dir).collect()
    assert len(out) == 1 and out[0]["recall_floor_met"]


def test_probe_width(spark, sf_dir, tmp_path):
    """Each query probes exactly IVFPQ_N_PROBE distinct cells."""
    from ecommerce_analytics_spark.operators.ivfpq import _probes
    from ecommerce_analytics_spark.operators.pq import _normalized

    path = build_ivfpq_index(spark, sf_dir, str(tmp_path / "index"))
    cents = spark.read.parquet(f"{path}/centroids")
    nq = _normalized(load_table(spark, sf_dir, "embeddings")
                     .filter(F.col("vec_id") < N_QUERIES))
    per_q = (_probes(nq, cents).groupBy("query_id")
             .agg(F.countDistinct("cell_id").alias("n")).collect())
    assert len(per_q) == N_QUERIES
    assert all(r["n"] == IVFPQ_N_PROBE for r in per_q)


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
