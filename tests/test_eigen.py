"""Power-iteration eigen-solve vs numpy's full eigendecomposition.

The cross-engine oracle (sweep/driver gate) only certifies that Spark
and DuckDB agree on the iterate sequence; this test certifies they
agree on the RIGHT answer — the returned vector is numpy's top
principal component of the same embedding cloud, and the Rayleigh
eigenvalue matches numpy's top eigenvalue of the biased covariance.
"""

from __future__ import annotations

import numpy as np


def test_top_eigvec_matches_numpy(spark, sf_dir):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.eigen import (
        q_embedding_top_eigvec,
    )

    rows = q_embedding_top_eigvec(spark, sf_dir).collect()
    assert len(rows) == 64
    v = np.zeros(64)
    for r in rows:
        v[r["dim"] - 1] = r["v_unit"]
    eigval = rows[0]["eigval_cov"]
    assert all(r["eigval_cov"] == eigval for r in rows)
    # the unit-ization really is unit
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4

    X = np.array(load_table(spark, sf_dir, "embeddings")
                 .select("embedding").toPandas()["embedding"].tolist(),
                 dtype=np.float64)
    cov = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(cov)
    top_val, top_vec = w[-1], V[:, -1]

    # direction: cosine to numpy's top eigenvector ~ ±1 (sign is fixed
    # by the e_1 start on our side, arbitrary on numpy's)
    cos = abs(float(v @ top_vec))
    assert cos > 0.9999, cos

    # Rayleigh quotient on the fixed-point covariance NUMERATOR
    # (n²·FIX²-scaled) divided back out should be the top eigenvalue
    # of the biased covariance (up to 1e-6 quantization of inputs).
    assert abs(eigval - top_val) < 1e-5 * max(1.0, abs(top_val))


def test_iterate_is_linf_normalized(spark, sf_dir):
    """Every returned fixed-point iterate respects the L-inf = 1e6
    contract (max |v_fix| is exactly EIG_FIX) — the deterministic
    rescale that keeps the integer mat-vec in range round after
    round."""
    from ecommerce_analytics_spark.operators.eigen import (
        EIG_FIX, q_embedding_top_eigvec,
    )

    rows = q_embedding_top_eigvec(spark, sf_dir).collect()
    assert max(abs(r["v_fix"]) for r in rows) == EIG_FIX


def test_pca_outliers_match_numpy_projection(spark, sf_dir):
    """The returned centered scores equal numpy's mean-centered
    projection of the raw embeddings onto the engine's own iterate
    (same vector both sides — this tests the projection machinery,
    independent of power-iteration convergence)."""
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.eigen import (
        COV_FIX, PCA_TOP_OUTLIERS, q_embedding_pca_outliers,
        q_embedding_top_eigvec,
    )

    vrows = q_embedding_top_eigvec(spark, sf_dir).collect()
    vfix = np.zeros(64)
    for r in vrows:
        vfix[r["dim"] - 1] = r["v_fix"]

    rows = load_table(spark, sf_dir, "embeddings") \
        .select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.round(np.array([r["embedding"] for r in rows],
                          dtype=np.float64) * COV_FIX)
    proj = X @ vfix                       # integer-exact dot
    centered = proj - proj.mean()
    score = centered / (np.linalg.norm(vfix) * COV_FIX)

    out = q_embedding_pca_outliers(spark, sf_dir).collect()
    assert len(out) == PCA_TOP_OUTLIERS
    by_id = {int(i): s for i, s in zip(ids, score)}
    for r in out:
        assert abs(r["centered_score"] - by_id[r["vec_id"]]) < 1e-5
    # the returned set IS the numpy top-k by |centered|
    order = np.argsort(-np.abs(centered), kind="stable")
    want = set()
    for idx in order[:PCA_TOP_OUTLIERS]:
        want.add(int(ids[idx]))
    assert {r["vec_id"] for r in out} == want


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
