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
