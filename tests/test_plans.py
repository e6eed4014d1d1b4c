"""Physical-plan assertions (SURVEY §4.2): predicates reach the parquet
scan, dims broadcast, aggregations are partial (map-side combine).
These lock in the scale-shaped plans — a regression that turns a
broadcast join into a shuffle or loses pushdown fails here, not at
100 TB."""

from __future__ import annotations

import contextlib
import io

from ecommerce_analytics_spark.plans.registry import query_map


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_pricing_summary_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(query_map()["pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" \
        in plan
    # two HashAggregates = partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


def test_clean_transactions_filter_pushdown(spark, sf_dir):
    plan = _plan(query_map()["clean_transactions"](spark, sf_dir))
    assert "GreaterThan(l_quantity," in plan or \
        "GreaterThan(l_quantity" in plan
    assert "GreaterThan(l_extendedprice,0.0)" in plan.replace(" ", "")


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("enrich_events_with_customer", "popular_products",
                 "sales_by_region_year"):
        plan = _plan(query_map()[name](spark, sf_dir), "simple")
        assert "BroadcastHashJoin" in plan, name


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(query_map()["ltv_running"](spark, sf_dir))
    # props (the widest column) must not be read for the LTV window
    assert "props" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(query_map()["top_customers_by_spend"](spark, sf_dir),
                 "simple")
    assert "TakeOrderedAndProject" in plan


def test_corpus_quality_ops_are_map_only(spark, sf_dir):
    # doc_quality_gopher / doc_repetition_topngram / doc_chunks compute
    # per-row array features — their plans must contain NO exchange
    # (shuffle): they run at scan speed at any corpus size.
    for name in ("doc_quality_gopher", "doc_repetition_topngram",
                 "doc_chunks"):
        plan = _plan(query_map()[name](spark, sf_dir), "simple")
        assert "Exchange" not in plan, name


def test_minhash_no_duplicate_pipeline(spark, sf_dir):
    # the LSH candidate generation must not run the shingle explode
    # twice (a band self-join would): exactly one Generate of the
    # md5 shingle transform in the plan.
    plan = _plan(query_map()["dedup_minhash_lsh"](spark, sf_dir),
                 "simple")
    assert plan.count("md5(concat_ws") <= 2  # hot-list + min branches


def test_jaccard_cap_has_no_window_on_shingle(spark, sf_dir):
    # The DF_CAP must be a groupBy + anti-join of the hot list, never a
    # count().over(Window.partitionBy("sh")) — a sort-based window on
    # the hottest key is the skew the cap exists to remove.
    plan = _plan(query_map()["dedup_ngram_jaccard"](spark, sf_dir),
                 "simple")
    assert "Window" not in plan
    assert "LeftAnti" in plan
