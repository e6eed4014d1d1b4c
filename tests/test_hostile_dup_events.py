"""Duplicate-delivery (at-least-once) event certification (round 7).

Every streaming transport degrades to at-least-once under retry; the
batch tables it lands in then carry EXACT duplicate rows. This salts
events with ~1% double-delivered rows plus one row delivered 5x and
re-certifies every registered query whose oracle reads events.

Finding the probe caught: user_event_analytics runs THREE
differently-sorted windows over the same user partition — exact
duplicate rows are bit-identical ties whose positions the sorts pair
inconsistently across engines and runs (the same class as the retail
transactions tie-pairing defect). Per-event analytics now gate
deliveries with a full-row DISTINCT on both sides; aggregates /
sessionization / counts are duplicate-CONSISTENT as-is (both engines
see the same duplicated multiset), and events_validation counts the
violation class (n_dup_event_id) so production pipelines alert
instead of silently double-counting.
"""

from __future__ import annotations

import os
import re

import pytest


def _affected():
    from ecommerce_analytics_spark.plans.registry import all_queries
    return sorted(n for n, q in all_queries().items()
                  if q.oracle and re.search(r"\bevents\b", q.oracle))


@pytest.fixture(scope="module")
def dup_sf(sf_dir, tmp_path_factory):
    import duckdb

    out = tmp_path_factory.mktemp("dup_events")
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") and name != "events.parquet":
            os.symlink(os.path.join(sf_dir, name), out / name)
    src = f"{sf_dir}/events.parquet"
    first = duckdb.sql(
        f"SELECT min(event_id) FROM '{src}'").fetchone()[0]
    duckdb.sql(f"""
        COPY (
          SELECT * FROM '{src}'
          UNION ALL SELECT * FROM '{src}' WHERE event_id % 97 = 1
          UNION ALL SELECT e.* FROM '{src}' e, range(4) r
          WHERE e.event_id = {first}
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    return str(out)


@pytest.mark.parametrize("name", _affected())
def test_query_matches_oracle_on_duplicate_deliveries(spark, dup_sf,
                                                      name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, dup_sf).toPandas()
    problems = compare_frames(
        spark_pdf, duckdb_oracle(q.oracle, dup_sf), name,
        float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


def test_gate_counts_duplicate_deliveries(spark, dup_sf):
    from ecommerce_analytics_spark.plans.registry import query_map

    row = query_map()["events_validation"](spark, dup_sf).collect()[0]
    assert row.n_dup_event_id > 0
