"""Differential tests: every registered query vs its DuckDB oracle.

This is the same comparison the driver's correctness gate performs
(row count + column names + order-insensitive value multiset), run at
a small SF so the suite stays fast.
"""

from __future__ import annotations

import pytest

from ecommerce_analytics_spark.plans.registry import all_queries
from ecommerce_analytics_spark.testing import (
    compare_frames, driver_canon, duckdb_oracle,
)

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    sdf = q.spark_fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only check — but the driver still canonicalizes the frame,
        # so run the same canonicalization (crashes on list columns).
        driver_canon(spark_pdf)
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = duckdb_oracle(q.oracle, sf_dir)
    problems = compare_frames(spark_pdf, oracle_pdf, name,
                              float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
