"""File/row-group data-skipping certification (VERDICT r9 #4).

DEPLOY_100TB §2 prescribes date-partitioned facts with files SORTED on
the range key so parquet min/max row-group stats prune IO, not just
partitions. Partition pruning is already plan-asserted (test_io); this
gate certifies the FILE-level half with executed-scan evidence: the
same date-ranged aggregate over two physically different layouts of
the same rows must read a fraction of the bytes when the files are
range-clustered.

Measurement is executed evidence, not plan text, on two axes:

- **real IO bytes** — Hadoop's GlobalStorageStatistics for the
  ``file`` scheme, diffed around each collect (local mode = all
  executor threads in one JVM). Caveat discovered building this: the
  counter only sees the buffered-stream read path; some column
  encodings route through reads it misses (the sf0.1 lineitem scan
  registered footers only), so the fixture is a synthetic fact whose
  page reads measurably land on the counted path.
- **scan-node SQL metrics** — numFiles / numOutputRows of the
  executed FileSourceScanExec (walked through the AQE query-stage
  wrappers), the same numbers the Spark UI reports. numOutputRows is
  the canonical row-group-skipping witness: rows MATERIALIZED by the
  reader after min/max pruning, before the Filter node.

Measured (2M-row fact, 16 files per layout, 1-month predicate over
~7 years): clustered reads 98 KB / materializes 60k rows vs
unclustered 1.21 MB / 2.0M rows — 12.3x less IO, 33.3x fewer rows
(docs/DEPLOY_100TB.md §2 records these). A layout regression that
breaks clustering, or a reader regression that stops consulting
row-group stats, collapses both ratios and fails the gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy

N_FILES = 16


def _bytes_read(spark) -> int:
    st = spark._jvm.org.apache.hadoop.fs.GlobalStorageStatistics \
        .INSTANCE.get("file")
    assert st is not None, "no 'file' scheme storage statistics"
    return st.getLong("bytesRead")


def _scan_metrics(df) -> dict:
    """Executed-scan SQL metrics (numFiles / numOutputRows / filesSize)
    of the first FileSourceScanExec, walked through the AQE query-stage
    wrappers (QueryStageExec leaves report empty metrics; the real scan
    node lives inside the materialized stage plan). Requires the df to
    have been executed already."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()

    def walk(node):
        cls = node.getClass().getSimpleName()
        if "FileSourceScanExec" in cls:
            out = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = kv._2().value()
            return out
        if "QueryStageExec" in cls:
            return walk(node.plan())
        ch = node.children()
        for i in range(ch.size()):
            found = walk(ch.apply(i))
            if found is not None:
                return found
        return None

    m = walk(plan)
    assert m is not None, "no FileSourceScanExec in executed plan"
    return m


def _fact(spark):
    """Deterministic 2M-row lineitem-shaped fact spanning ~7 years.
    Size is fixed independent of the test SF: at sf0.001 the real
    lineitem is ~6k rows and every parquet file is footer-dominated,
    so layout-driven IO differences vanish below the noise — the gate
    needs data pages to dominate, which they do from ~10^6 rows."""
    return spark.range(2_000_000).select(
        F.col("id").alias("l_orderkey"),
        (F.col("id") % 200000).alias("l_partkey"),
        (F.col("id") % 50 + 1).cast("double").alias("l_quantity"),
        ((F.col("id") % 90000) / 100.0 + 900.0).alias("l_extendedprice"),
        F.date_add(F.lit("1992-01-01"),
                   (F.col("id") % 2525).cast("int")).alias("l_shipdate"))


@pytest.fixture(scope="module")
def lake_layouts(spark, tmp_path_factory):
    """The same fact rows in two physical layouts, N_FILES each:
    range-clustered on l_shipdate via the engine API (disjoint
    per-file date ranges → tight min/max footer stats) vs round-robin
    (every file spans the full date range → stats prune nothing)."""
    from ecommerce_analytics_spark.io import write_clustered_parquet
    root = str(tmp_path_factory.mktemp("skipping_lake"))
    li = _fact(spark)
    write_clustered_parquet(li, f"{root}/sorted", ("l_shipdate",),
                            n_files=N_FILES)
    li.repartition(N_FILES).write.parquet(f"{root}/unsorted")
    return root


def _month_revenue(spark, path):
    return (spark.read.parquet(path)
            .filter((F.col("l_shipdate") >= "1995-03-01")
                    & (F.col("l_shipdate") < "1995-04-01"))
            .agg(F.sum(F.col("l_extendedprice")
                       * F.col("l_quantity")).alias("rev"),
                 F.count(F.lit(1)).alias("n")))


def test_sorted_layout_skips_bytes(spark, lake_layouts):
    """The clustered layout must read a small fraction of the bytes the
    unclustered one reads for a narrow date range — the row-group
    min/max stats actually firing, not just present."""
    results = {}
    got = {}
    scans = {}
    for name in ("sorted", "unsorted"):
        df = _month_revenue(spark, f"{lake_layouts}/{name}")
        b0 = _bytes_read(spark)
        row = df.collect()[0]
        results[name] = _bytes_read(spark) - b0
        got[name] = (row["n"], row["rev"])
        scans[name] = _scan_metrics(df)
    # identical answers from both layouts (skipping loses nothing)
    assert got["sorted"][0] == got["unsorted"][0] > 0
    assert got["sorted"][1] == pytest.approx(got["unsorted"][1])
    # the SAME file set is planned for both (no partition pruning in
    # play) — the reduction below is read-time stats skipping alone
    assert scans["sorted"]["numFiles"] == scans["unsorted"]["numFiles"] \
        == N_FILES
    # row-group stats fired: the clustered scan materializes ~1 file's
    # rows, the unclustered scan materializes everything
    assert scans["sorted"]["numOutputRows"] \
        < 0.25 * scans["unsorted"]["numOutputRows"], scans
    # and materially less IO: a 1-month slice of ~7 years clustered
    # into 16 disjoint-range files should touch ~1 file's data pages.
    # 0.5 is a loose floor (footers are still read per file); measured
    # ratio is ~10x at this fixture size.
    assert results["sorted"] < 0.5 * results["unsorted"], results


def test_predicate_reaches_scan_in_both_layouts(spark, lake_layouts):
    """The mechanism: the shipdate range predicate must be pushed to
    the parquet scan (PushedFilters) — stats skipping rides on it."""
    import contextlib
    import io as _io
    for name in ("sorted", "unsorted"):
        df = _month_revenue(spark, f"{lake_layouts}/{name}")
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "PushedFilters" in plan and "l_shipdate" in plan.split(
            "PushedFilters", 1)[1][:300], name


def test_partitioned_and_sorted_compose(spark, tmp_path_factory):
    """The full DEPLOY_100TB §2 layout: directory partitioning on the
    date bucket (planning-time pruning: fewer files even reach tasks)
    COMPOSED with within-partition range clustering (row-group stats
    prune inside the surviving partition). Bytes must drop at BOTH
    steps."""
    from ecommerce_analytics_spark.io import write_clustered_parquet
    root = str(tmp_path_factory.mktemp("skipping_part"))
    li = _fact(spark).withColumn("ship_year", F.year("l_shipdate"))
    write_clustered_parquet(li, f"{root}/lake", ("l_shipdate",),
                            n_files=N_FILES,
                            partition_cols=("ship_year",))

    pruned = (spark.read.parquet(f"{root}/lake")
              .filter((F.col("ship_year") == 1995)
                      & (F.col("l_shipdate") >= "1995-03-01")
                      & (F.col("l_shipdate") < "1995-04-01"))
              .agg(F.sum("l_quantity").alias("q")))
    full = (spark.read.parquet(f"{root}/lake")
            .agg(F.sum("l_quantity").alias("q")))

    b0 = _bytes_read(spark)
    pruned_row = pruned.collect()[0]
    pruned_bytes = _bytes_read(spark) - b0
    b0 = _bytes_read(spark)
    full_row = full.collect()[0]
    full_bytes = _bytes_read(spark) - b0

    assert pruned_row["q"] > 0 and full_row["q"] > pruned_row["q"]
    assert pruned_bytes < 0.5 * full_bytes, (pruned_bytes, full_bytes)
    # planning-time pruning: only the 1995 partition's files are even
    # planned (vs all files for the full scan)
    assert _scan_metrics(pruned)["numFiles"] \
        < _scan_metrics(full)["numFiles"]
    # planning-time pruning is visible in the plan too
    import contextlib
    import io as _io
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
