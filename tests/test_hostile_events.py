"""Hostile-event certification (round-6 probe, companion of
test_short_docs / test_hostile_embeddings).

An events table salted with NULL user_id / event_type / ts / value
rows, a negative value, and malformed props JSON. Two findings the
fixture pins:

* polymorphic_props_extract's ORACLE crashed on malformed JSON
  (DuckDB json_extract_string is strict) while Spark's
  get_json_object returned NULL — the defensive behavior the operator
  certifies; the oracle now shares the null-on-corrupt semantics via
  a json_valid guard, and the flag boolean coalesces to FALSE.
* The aggregation / LTV / props / path families are null-tolerant and
  engine-exact as-is (certified below). The TIME/JOURNEY operators
  (sessionize, sliding windows, Markov attribution) are NOT run on
  this fixture by design: a NULL-timestamp event has no well-defined
  session or journey position and the engines legitimately diverge —
  their documented input contract is events_validation's
  n_time_valid predicate (non-NULL ts, user_id, event_type).
"""

from __future__ import annotations

import os

import pytest

HOSTILE_ROWS_SQL = """
  (CAST(910001 AS BIGINT), TIMESTAMP '2024-01-10 10:00:00',
   CAST(NULL AS BIGINT), 'click', 1.0, '{}'),
  (CAST(910002 AS BIGINT), TIMESTAMP '2024-01-10 10:00:01', 77,
   CAST(NULL AS VARCHAR), 2.0, '{}'),
  (CAST(910003 AS BIGINT), CAST(NULL AS TIMESTAMP), 77, 'view',
   3.0, '{}'),
  (CAST(910004 AS BIGINT), TIMESTAMP '2024-01-10 10:00:03', 77,
   'purchase', CAST(NULL AS DOUBLE), 'not json at all'),
  (CAST(910005 AS BIGINT), TIMESTAMP '2024-01-10 10:00:04', 77,
   'click', -5.0, '{"k": [1,2'),
  -- bare JSON literal 'null': VALID in both engines (DuckDB
  -- json_valid('null')=true; Spark get_json_object('null','$')
  -- returns the non-NULL string 'null' on 4.1.2 — verified r7)
  (CAST(910006 AS BIGINT), TIMESTAMP '2024-01-10 10:00:05', 78,
   'view', 1.0, 'null'),
  -- truncated keyword: INVALID in both engines
  (CAST(910007 AS BIGINT), TIMESTAMP '2024-01-10 10:00:06', 78,
   'click', 1.0, 'tru')
"""
# NOT in the fixture — the two DOCUMENTED divergence classes between
# Spark's get_json_object twin and DuckDB's json_valid (see the
# n_bad_props comment in cleaning.py): '{"a":1} trailing-garbage'
# (Spark's Jackson stops at the first complete value → valid; DuckDB
# strict → invalid) and '{"a":1,}' trailing comma (DuckDB's yyjson
# lenient → valid; Spark strict → invalid). Neither is expressible
# identically in both engines with built-ins; the ingest contract
# accepts the divergence and the fixture pins every AGREEING class.
N_HOSTILE = 7


@pytest.fixture(scope="module")
def hostile_sf(sf_dir, tmp_path_factory):
    import duckdb

    out = tmp_path_factory.mktemp("hostile_events")
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") and name != "events.parquet":
            os.symlink(os.path.join(sf_dir, name), out / name)
    duckdb.sql(f"""
        COPY (SELECT * FROM '{sf_dir}/events.parquet'
              UNION ALL SELECT * FROM (VALUES {HOSTILE_ROWS_SQL})
                t(event_id, ts, user_id, event_type, value, props))
        TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    return str(out)


@pytest.mark.parametrize("name", [
    "event_type_distribution",
    "hourly_revenue",
    "ltv_running",
    "props_variant_stats",
    "props_json_extract",
    "polymorphic_props_extract",
    "top_event_paths",
    "conditional_counts",
    "timestamp_span",
    "distinct_user_event_pairs",
    "events_validation",
])
def test_query_matches_oracle_on_hostile_events(spark, hostile_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, hostile_sf).toPandas()
    problems = compare_frames(
        spark_pdf, duckdb_oracle(q.oracle, hostile_sf), name,
        float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


def test_validation_classifies_every_hostile_row(spark, hostile_sf,
                                                 sf_dir):
    import duckdb

    from ecommerce_analytics_spark.plans.registry import query_map

    base_n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet'").fetchone()[0]
    row = query_map()["events_validation"](spark, hostile_sf).collect()[0]
    assert row.n_events == base_n + N_HOSTILE
    assert row.n_null_ts == 1
    assert row.n_null_user == 1
    assert row.n_null_type == 1
    assert row.n_null_value == 1
    # 'not json at all', '{"k": [1,2', 'tru' — bare 'null' is VALID
    assert row.n_bad_props == 3
    # 3 hostile rows violate the time contract (null ts/user/type)
    assert row.n_time_valid == base_n + 4


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
