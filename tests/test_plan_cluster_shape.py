"""Cluster-shape plan parity (VERDICT r6 #6).

All plan evidence in PLANS.md is captured on local[32] with
spark.sql.shuffle.partitions = cpus. A real 100x cluster runs
shuffle.partitions at ~2-3x total cores (hundreds), so this certifies
that the LOCAL tuning is not load-bearing for plan selection: the
physical-plan shape census (join strategies, exchange kinds, top-k
operators, cartesian count) of every headline + heavy query is
IDENTICAL at shuffle.partitions=200. Partition COUNT changes; plan
SHAPE must not — broadcast selection is size-threshold-based and
exchange insertion is distribution-requirement-based, neither reads
the partition knob.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from bench import HEADLINE, HEAVY

# Model-fitting queries execute jobs at plan-construction time (the
# same exclusion as tools/gen_plan_census.py) — their DataFrame plans
# downstream of the fitted model are covered by their own tests.
_FIT_AT_BUILD = {
    "knn_ivfpq_persisted_recall", "embedding_top_eigvec",
    "embedding_pca_outliers", "markov_attribution",
}

FEATURES = [
    ("bcast_join", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("shj", r"ShuffledHashJoin"),
    ("topk", r"TakeOrderedAndProject"),
    ("cartesian", r"CartesianProduct"),
    ("xch_hash", r"Exchange hashpartitioning"),
    ("xch_range", r"Exchange rangepartitioning"),
    ("xch_single", r"Exchange SinglePartition"),
]


def _census(df) -> dict[str, int]:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    return {k: len(re.findall(p, plan)) for k, p in FEATURES}


@pytest.mark.parametrize(
    "name", sorted(set(HEADLINE + HEAVY) - _FIT_AT_BUILD))
def test_plan_shape_invariant_at_cluster_partitioning(spark, sf_dir,
                                                      name):
    from ecommerce_analytics_spark.plans.registry import query_map

    fn = query_map()[name]
    local = spark.conf.get("spark.sql.shuffle.partitions")
    base = _census(fn(spark, sf_dir))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        cluster = _census(fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", local)
    assert cluster == base, (
        f"{name}: physical plan shape changed with "
        f"shuffle.partitions 200 vs {local}: {base} -> {cluster}")
    assert base["cartesian"] == 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
