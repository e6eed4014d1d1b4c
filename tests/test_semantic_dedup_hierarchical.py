"""Hierarchical (two-level) semantic_dedup regime invariants.

The two-level centroid assignment (training_prep.q_semantic_dedup,
n_cells > SEM_FLAT_MAX_CELLS) routes vec -> nearest super-centroid ->
nearest centroid WITHIN that super-cell. ADVICE r9: a super-cell that
received no centroids would silently DROP every vector routed to it
at the vec2super JOIN cent2super inner join. The fix pins each super
centroid to its own super-cell (structural non-emptiness, both
engines), so the invariant the flat path guarantees — output rows ==
corpus rows — holds in the hierarchical regime too.

The committed SFs all run the flat path (78 cells at sf1.0 <= 96), so
this test FORCES the hierarchical regime on the sf0.001 corpus by
shrinking the regime constants (they are read at call time), then
asserts the row-conservation invariant and the injected-positive
contract (the x2-scaled copy lands in its original's cell and is
dropped; the original kept) survive the regime switch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators import training_prep as tp

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


@pytest.fixture()
def hier_regime(monkeypatch):
    # sf0.001 embeddings: n rows -> n_cells = max(8, n // cap) must
    # exceed the flat max to take the two-level branch. cap=8 makes
    # n_cells ~ n/8 (>= ~25 at the smallest corpus), flat_max=16
    # forces hierarchical with n_super = ceil(sqrt(n_cells)).
    monkeypatch.setattr(tp, "SEM_CELL_CAP", 8)
    monkeypatch.setattr(tp, "SEM_FLAT_MAX_CELLS", 16)


def test_hierarchical_row_conservation(spark, sf_dir, hier_regime):
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    n_cells = max(tp.N_CENTROIDS, n_emb // tp.SEM_CELL_CAP)
    assert n_cells > tp.SEM_FLAT_MAX_CELLS, "regime not forced"

    out = tp.q_semantic_dedup(spark, sf_dir)
    rows = out.cache()
    try:
        n_corpus = n_emb + (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") % tp.SEM_COPY_MOD == 0).count())
        # THE invariant: no vector vanishes at the super-cell join.
        assert rows.count() == n_corpus
        # one assignment per vector (row_number rn=1 discipline held)
        assert rows.select("vec_id").distinct().count() == n_corpus
    finally:
        rows.unpersist()


def test_hierarchical_injected_positives(spark, sf_dir, hier_regime):
    out = tp.q_semantic_dedup(spark, sf_dir).cache()
    try:
        originals = (load_table(spark, sf_dir, "embeddings")
                     .filter(F.col("vec_id") % tp.SEM_COPY_MOD == 0)
                     .select("vec_id"))
        n_pos = originals.count()
        assert n_pos > 0
        # the x2 copy has the identical direction -> same super, same
        # cell, pair cos ~= 1, equal cent_cos -> tie to smaller vec_id:
        # original kept, copy dropped — regime-independent contract.
        copies = out.join(
            originals.select((F.col("vec_id") + 1000000).alias("vec_id")),
            "vec_id")
        assert copies.count() == n_pos
        assert copies.filter(F.col("kept")).count() == 0
        kept_orig = out.join(originals, "vec_id").filter(F.col("kept"))
        assert kept_orig.count() == n_pos
    finally:
        out.unpersist()
