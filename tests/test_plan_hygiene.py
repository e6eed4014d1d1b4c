"""Global plan hygiene: NO registered query may plan a
CartesianProduct, and any BroadcastNestedLoopJoin must be a broadcast
scalar/centroid attach (1-row-ish build side by construction) — the
invariant the per-round audit greps for, enforced as a test over the
ENTIRE registry so a future operator can't regress it silently."""

from __future__ import annotations

import contextlib
import io

from ecommerce_analytics_spark.plans.registry import all_queries

# queries whose construction executes jobs heavy enough to skip in a
# plan-only pass (they are executed fully by the oracle sweep anyway)
_SKIP = {
    "rfm_kmeans_quality",       # fits a KMeans model at build time
    "knn_ivf_kmeans_recall",    # trains centroids at build time
    "als_recommendations_shape",  # fits ALS at build time
    "knn_ivfpq_persisted_recall",  # builds + writes the index at build time
    "embedding_top_eigvec",  # checkpoints the matrix row at build time
    "embedding_pca_outliers",  # checkpoints the iterate row at build time
}


def test_no_cartesian_products_anywhere(spark, sf_dir):
    bad = []
    for name, q in sorted(all_queries().items()):
        if name in _SKIP:
            continue
        df = q.spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        plan = buf.getvalue()
        if "CartesianProduct" in plan:
            bad.append(name)
    assert not bad, f"cartesian product planned in: {bad}"


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
