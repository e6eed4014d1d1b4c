"""Cost-based-optimizer evidence: ANALYZE TABLE statistics land in
the catalog (table + column level, DESCRIBE-visible) and feed the
CBO's cardinality model with the EXACT analyzed row count instead of
a file-size guess — the estimate every broadcast/reorder decision
consumes at 100 TB, where scan-size heuristics over selective
filters wildly overestimate. The join assertion at the end is a
sanity check that the stats do not DEGRADE the obvious broadcast
plan (the 25-row dim broadcasts on size heuristics with or without
stats — strategy flipping is not what this test claims)."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_analyze_statistics_flow_into_catalog_and_plan(spark, sf_dir):
    name = f"dim_{uuid.uuid4().hex[:8]}"
    fact = f"fact_{uuid.uuid4().hex[:8]}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"DROP TABLE IF EXISTS {fact}")
    try:
        (spark.read.parquet(f"{sf_dir}/nation.parquet")
         .write.saveAsTable(name))
        (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .write.saveAsTable(fact))

        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS "
                  f"FOR ALL COLUMNS")
        spark.sql(f"ANALYZE TABLE {fact} COMPUTE STATISTICS")

        # stats visible in the catalog
        stats = spark.sql(
            f"DESCRIBE TABLE EXTENDED {name}").collect()
        stat_row = [r for r in stats if r.col_name == "Statistics"]
        assert stat_row, "ANALYZE produced no table statistics"
        assert "rows" in stat_row[0].data_type

        col_stats = spark.sql(
            f"DESCRIBE EXTENDED {name} n_nationkey").collect()
        kv = {r.info_name: r.info_value for r in col_stats}
        assert kv.get("distinct_count") not in (None, "NULL")

        # CBO path: with stats on, the optimizer's cardinality model
        # sees the EXACT analyzed row count (not a file-size guess) —
        # the estimate the broadcast/reorder decisions consume.
        spark.conf.set("spark.sql.cbo.enabled", "true")
        dim = spark.table(name)
        stats_obj = dim._jdf.queryExecution().optimizedPlan().stats()
        row_count = stats_obj.rowCount()
        assert row_count.isDefined(), "CBO sees no rowCount after ANALYZE"
        n_rows = dim.count()
        assert int(str(row_count.get())) == n_rows

        # sanity: stats in play do not degrade the obvious plan
        joined = (spark.table(fact)
                  .join(spark.table(name),
                        F.col("o_orderkey") % 25 == F.col("n_nationkey"))
                  .groupBy("n_name").count())
        assert "BroadcastHashJoin" in _plan(joined)
    finally:
        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(f"DROP TABLE IF EXISTS {fact}")
