"""Join-strategy / AQE invariance certification (round 8).

On a 100 TB cluster the physical join strategy is a runtime accident:
a dim that broadcasts at sf0.1 exceeds the threshold at sf100 and
flips to sort-merge; AQE re-plans mid-query from observed sizes; skew
handling splits partitions. Results must be BITWISE invariant to all
of it — a query whose answer depends on which join strategy Catalyst
picked is broken at scale in a way no fixed-conf test can see.

This wave re-runs the headline tier plus the most join-dense registry
queries under a deliberately flipped planner —

* ``spark.sql.autoBroadcastJoinThreshold = -1`` (no automatic
  broadcasts; explicit ``F.broadcast`` hints are design intent and
  stay, but every non-hinted join falls back to shuffle),
* ``spark.sql.adaptive.enabled = false`` (no runtime re-planning, no
  partition coalescing, no skew splitting),
* ``spark.sql.join.preferSortMergeJoin = true`` (shuffled-hash →
  sort-merge where Spark has the choice)

— and asserts each result's order-insensitive ``value_hash`` equals
the default-planner run's. The conf deltas are runtime-settable, so
one session serves both sides; conf is restored even on failure.
"""

from __future__ import annotations

import pytest

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy

FLIPPED = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.join.preferSortMergeJoin": "true",
}

# Headline tier + the registry's most join-dense plans (star rollups,
# as-of, attribution, ANN cell joins, LSH band joins, set ops).
QUERIES = [
    "event_classification",
    "pricing_summary",
    "shipping_priority",
    "sales_by_region_year",
    "hourly_revenue",
    "popular_products",
    "ltv_running",
    "product_recommendations",
    "token_frequencies",
    "text_quality_score",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "top_product_per_nation",
    "asof_prior_purchase",
    "post_purchase_attribution",
    "knn_ivf",
    "dedup_ngram_jaccard",
    "customer_order_distribution",
]


def _available():
    from ecommerce_analytics_spark.plans.registry import all_queries
    reg = all_queries()
    return [q for q in QUERIES if q in reg]


@pytest.mark.parametrize("name", _available())
def test_result_invariant_to_join_strategy(spark, sf_dir, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import value_hash

    q = all_queries()[name]
    default_vh = value_hash(q.spark_fn(spark, sf_dir).toPandas(),
                            float_sig=q.float_sig)

    saved = {k: spark.conf.get(k, None) for k in FLIPPED}
    try:
        for k, v in FLIPPED.items():
            spark.conf.set(k, v)
        flipped_vh = value_hash(q.spark_fn(spark, sf_dir).toPandas(),
                                float_sig=q.float_sig)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert flipped_vh == default_vh, (
        f"{name}: result depends on the physical join strategy "
        f"(default {default_vh} != flipped {flipped_vh})")
