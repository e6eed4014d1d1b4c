"""Hostile TPC-H relational certification (VERDICT r6 #1 — the last
input family without adversarial coverage).

Two fixtures from tests/hostile_retail_fixture.py:

* SALTED — all SEVEN relational tables mutated and extended (region/
  nation added in round 8, completing the set — VERDICT r7 #7): NULL
  order dates / custkeys / prices / quantities / ship dates / return
  flags, negative prices, duplicate o_orderkey and c_custkey ingest
  rows, a mega-customer with 10k orders, orphan lineitems; NULL
  r_name / n_name / n_regionkey, duplicate r_regionkey and
  n_nationkey rows with CONFLICTING attributes (fan-out through every
  dim join), an orphan nation, NULL-key dim rows. EVERY registered
  query whose oracle touches the tables (derived from the registry,
  not a hand-list) must hash-match its unchanged oracle on the salted
  dir. The round-8 region/nation wave ran green first try across all
  81 affected queries — no new defect class in the dim joins.
* EMPTY-ORDERS — orders replaced by a zero-row table (the empty-
  partition class). Same bar, minus four documented exclusions.

Real defects this wave found and fixed (round 7):

* rollup_restate_daily_revenue LOST updates for NULL-day rows: the
  incremental splice's semi/anti joins on `day` never match NULL, so
  the stale NULL-day rollup survived un-restated (revenue off by
  exactly n_null_day_updates x RESTATE_BUMP). Fixed with eqNullSafe —
  the textbook NULL-partition maintenance bug.
* order_chain_recursive SELF-LOOPED on duplicate o_orderkey (a
  dup key is a prev==self successor edge, re-appended every level to
  the 12-level cap) — +1,585 phantom rows.
* als_recommendations_shape / rfm_kmeans_quality CRASHED (MLlib
  hard-rejects NULL users/ratings; VectorAssembler rejects NULL
  features; both .fit() calls die on empty input).
* price_elasticity_by_brand's oracle CRASHED on ln(negative-price).
* sales_by_region_year double-counted revenue for duplicated
  o_orderkey/c_custkey rows while count(DISTINCT) half-deduped them;
  merge_apply_cdc double-inserted on dup-key snapshot fan-out;
  km_second_order_survival fabricated t=0 second orders from dup rows.
* Spark ASC sorts are NULLS FIRST, DuckDB's NULLS LAST: every windowed
  oracle ordering on now-nullable ORDER_KEYS diverged (fixed once in
  retail.ORDER_KEYS_SQL); NULL booleans round-trip as None vs NaN
  (fixed semantically: is_return/is_credit_note coalesce to FALSE —
  only an explicit 'R' is a return).
* surrogate_customer_ids handed out adjacent -n surrogates in
  opposite orders for rows tied on all ORDER_KEYS but differing in
  customer_id (dup order, one copy NULL-custkey) — customer_id now
  tie-breaks the numbering.

Part/supplier extension (same round, second pass): salting the two
remaining dims found three more —

* part_skyline returned ZERO rows: a NULL-price group sorts first
  under Spark's NULLS FIRST and its max size poisons the running-max
  frontier for everything after it, while the oracle's NOT EXISTS
  let NULL rows vacuously "survive" — dominance is now defined only
  over points with both coordinates (both sides).
* fuzzy_name_match CRASHED: the NULL name group hit the in-plan
  Gravano min-length guard — string similarity now excludes NULL
  names by contract on both sides.
* recommendations_nested silently changed its document schema per
  row: Spark's to_json OMITS null struct fields while the oracle
  emits "product_name":null — ignoreNullFields=false aligns them.

Exclusions (EMPTY-ORDERS only, all four documented engine-defined
degeneracies, still certified on the salted fixture):

* spend_rollup_region_nation / spend_cube_segment_priority — on empty
  input the SQL standard's ROLLUP/CUBE empty grouping set emits one
  super-aggregate row (DuckDB does); Spark emits zero rows. A known
  Spark-vs-standard divergence we won't distort plans to paper over.
* kmv_customer_yoy_algebra / cms_join_size_estimate — k-min/CM-sketch
  estimates over an EMPTY sketch are 0/0 forms whose NaN-vs-NULL
  resolution is engine-defined; the gate (n_orders = 0) is the
  documented signal to skip estimation.
"""

from __future__ import annotations

import re

import pytest

from hostile_retail_fixture import (
    MEGA_CUSTKEY, N_MEGA_ORDERS, N_ORPHAN_LINES, build_hostile_retail,
)

_TABLE_PAT = re.compile(
    r"\b(lineitem|orders|customer|part|supplier|region|nation)\b")

EMPTY_ORDERS_EXCLUDED = {
    "spend_rollup_region_nation",      # Spark omits the SQL-standard
    "spend_cube_segment_priority",     # empty grouping-set row
    "kmv_customer_yoy_algebra",        # 0/0 estimate forms on an
    "cms_join_size_estimate",          # empty sketch: engine-defined
}


def _affected():
    from ecommerce_analytics_spark.plans.registry import all_queries
    return sorted(n for n, q in all_queries().items()
                  if q.oracle and _TABLE_PAT.search(q.oracle))


@pytest.fixture(scope="module")
def salted_sf(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("hostile_retail")
    return build_hostile_retail(sf_dir, str(out))


@pytest.fixture(scope="module")
def empty_orders_sf(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_orders")
    return build_hostile_retail(sf_dir, str(out), empty_orders=True)


@pytest.mark.parametrize("name", _affected())
def test_query_matches_oracle_on_salted_retail(spark, salted_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, salted_sf).toPandas()
    problems = compare_frames(spark_pdf, duckdb_oracle(q.oracle, salted_sf),
                              name, float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


def _empty_affected():
    from ecommerce_analytics_spark.plans.registry import all_queries
    pat = re.compile(r"\borders\b")
    return sorted(n for n, q in all_queries().items()
                  if q.oracle and pat.search(q.oracle)
                  and n not in EMPTY_ORDERS_EXCLUDED)


@pytest.mark.parametrize("name", _empty_affected())
def test_query_matches_oracle_on_empty_orders(spark, empty_orders_sf,
                                              name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, empty_orders_sf).toPandas()
    problems = compare_frames(
        spark_pdf, duckdb_oracle(q.oracle, empty_orders_sf),
        name, float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


def test_gate_classifies_every_salt_class(spark, salted_sf):
    """retail_validation must see every violation class the fixture
    salts, including the mega-customer's orders and orphan lines."""
    from ecommerce_analytics_spark.plans.registry import query_map

    row = query_map()["retail_validation"](spark, salted_sf).collect()[0]
    assert row.n_null_orderdate > 0
    assert row.n_null_custkey > 0
    assert row.n_null_totalprice > 0
    assert row.n_neg_totalprice > 0
    assert row.n_dup_orderkey > 0
    assert row.n_null_qty > 0
    assert row.n_null_price > 0
    assert row.n_neg_price > 0
    assert row.n_null_shipdate > 0
    assert row.n_orphan_lines == N_ORPHAN_LINES
    assert row.n_dup_custkey > 0
    assert row.n_null_nationkey > 0
    assert row.n_dup_partkey > 0
    assert row.n_null_pname > 0
    assert row.n_neg_retailprice > 0
    assert row.n_dup_suppkey > 0
    assert row.n_null_s_nationkey > 0
    # the mega-customer really is in there
    from ecommerce_analytics_spark.io import load_table
    from pyspark.sql import functions as F
    n_mega = (load_table(spark, salted_sf, "orders")
              .filter(F.col("o_custkey") == MEGA_CUSTKEY).count())
    assert n_mega >= N_MEGA_ORDERS


# ---------------------------------------------------------------------------
# EMPTY-DIMS variant (round 8): region AND nation as zero-row tables —
# the empty-dim-partition class (failed dim load / filter matching
# nothing). Inner dim joins annihilate, left joins go all-NULL; every
# region/nation-consuming query must agree with its oracle on the
# result. ROLLUP/CUBE queries keep the documented empty-grouping-set
# exclusion (Spark omits the SQL-standard super-aggregate row that
# DuckDB emits once the join empties their input).

_DIM_PAT = re.compile(r"\b(region|nation)\b")

EMPTY_DIMS_EXCLUDED = {
    "spend_rollup_region_nation",  # empty grouping-set row again: the
                                   # inner dim join empties the ROLLUP
                                   # input even though orders is full
}


def _dim_affected():
    from ecommerce_analytics_spark.plans.registry import all_queries
    return sorted(n for n, q in all_queries().items()
                  if q.oracle and _DIM_PAT.search(q.oracle)
                  and n not in EMPTY_DIMS_EXCLUDED)


@pytest.fixture(scope="module")
def empty_dims_sf(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_dims")
    return build_hostile_retail(sf_dir, str(out), empty_dims=True)


@pytest.mark.parametrize("name", _dim_affected())
def test_query_matches_oracle_on_empty_dims(spark, empty_dims_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, empty_dims_sf).toPandas()
    problems = compare_frames(
        spark_pdf, duckdb_oracle(q.oracle, empty_dims_sf),
        name, float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
