"""PCA sufficient-statistics closure: the exact covariance stats
reconstruct numpy's covariance and eigenvalues."""

from __future__ import annotations

def test_covariance_stats_close_the_pca_loop(spark, sf_dir):
    """Driver-side eigen-solve on the exact sufficient statistics
    reproduces numpy's PCA on the raw vectors (to fixed-point
    precision) — the 2080-row stats table really is the covariance
    matrix."""
    import numpy as np

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.profiling import (
        COV_FIX, q_embedding_covariance_stats,
    )

    stats = {(r["dim_i"], r["dim_j"]): r
             for r in q_embedding_covariance_stats(spark, sf_dir)
             .collect()}
    d = 64
    n = stats[(1, 1)]["n"]
    cov = np.zeros((d, d))
    for (i, j), r in stats.items():
        c = (r["sum_ij"] / n - (r["sum_i"] / n) * (r["sum_j"] / n))
        cov[i - 1, j - 1] = cov[j - 1, i - 1] = c / (COV_FIX ** 2)

    X = np.array(load_table(spark, sf_dir, "embeddings")
                 .orderBy("vec_id")
                 .select("embedding").toPandas()["embedding"].tolist(),
                 dtype=np.float64)
    ref = np.cov(X, rowvar=False, bias=True)
    assert np.allclose(cov, ref, atol=5e-6)
    ev_stats = np.sort(np.linalg.eigvalsh(cov))
    ev_ref = np.sort(np.linalg.eigvalsh(ref))
    assert np.allclose(ev_stats, ev_ref, atol=5e-5)
