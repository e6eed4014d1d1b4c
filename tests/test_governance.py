"""Governance operators: purge-cascade and snapshot-diff semantics
that the modulus-derived registry queries can't isolate — null-safe
column comparison, empty-tombstone identity, and the library
functions' behavior on hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.governance import (
    diff_tables, purge_cascade,
)


def test_diff_tables_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, s string, v double")
    new = spark.createDataFrame(
        [(1, "a", 1.0),          # unchanged
         (2, "b", None),         # unchanged — None==None must hold
         (3, "c", 3.5),          # changed
         (5, "e", 5.0)],         # added; key 4 removed
        "k long, s string, v double")
    got = {r["row_key"]: r["status"]
           for r in diff_tables(old, new, "k", ["s", "v"]).collect()}
    assert got == {1: "unchanged", 2: "unchanged", 3: "changed",
                   4: "removed", 5: "added"}


def test_diff_tables_null_vs_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, 2.0)], "k long, v double")
    [row] = diff_tables(old, new, "k", ["v"]).collect()
    assert row["status"] == "changed"


def test_purge_cascade_empty_tombstones(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    flagged_cond = F.lit(False)
    out = purge_cascade(
        spark.createDataFrame([], "k long"),
        {"t": (df, "k", flagged_cond, "k")}).collect()
    [row] = out
    assert row["rows_total"] == 10
    assert row["rows_purged"] == 0
    assert row["rows_kept"] == 10
    assert row["kept_checksum"] == sum(range(10))


def test_snapshot_diff_on_bucketed_versions_zero_exchange(
        spark, sf_dir, tmp_path):
    """The 100 TB reconcile story: both snapshot versions written
    bucketed on the key diff with NO exchange — each task zips bucket
    i vs bucket i. (diff_tables itself is layout-agnostic; bucketing
    is what removes the two shuffles.)"""
    import contextlib
    import io as _io

    from ecommerce_analytics_spark.io import (
        load_table, write_bucketed_table,
    )

    orders = load_table(spark, sf_dir, "orders")
    v_old = orders.filter(F.col("o_orderkey") % 7 != 0)
    v_new = orders.filter(F.col("o_orderkey") % 5 != 0)
    write_bucketed_table(v_old, "diff_v_old", ("o_orderkey",), 8,
                         ("o_orderkey",), str(tmp_path / "v_old"))
    write_bucketed_table(v_new, "diff_v_new", ("o_orderkey",), 8,
                         ("o_orderkey",), str(tmp_path / "v_new"))
    try:
        d = diff_tables(spark.table("diff_v_old"),
                        spark.table("diff_v_new"), "o_orderkey",
                        ["o_totalprice", "o_orderstatus"])
        agg = d.groupBy("status").count()
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            agg.explain("simple")
        plan = buf.getvalue()
        # the join itself is exchange-free; the only exchange allowed
        # is the final 3-row status rollup
        assert "Exchange hashpartitioning(_ok" not in plan, plan
        assert "Exchange hashpartitioning(_nk" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= 1, plan
        got = {r["status"]: r["count"] for r in agg.collect()}
        both = orders.filter((F.col("o_orderkey") % 7 != 0)
                             & (F.col("o_orderkey") % 5 != 0)).count()
        assert got.get("unchanged", 0) == both
        assert got.get("added", 0) == v_new.count() - both
        assert got.get("removed", 0) == v_old.count() - both
    finally:
        spark.sql("DROP TABLE IF EXISTS diff_v_old")
        spark.sql("DROP TABLE IF EXISTS diff_v_new")


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
