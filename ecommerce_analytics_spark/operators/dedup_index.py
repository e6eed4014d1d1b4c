"""Persisted dedup index — the two-phase build→store→query shape.

``q_dedup_incremental`` (dedup.py) models nightly ingestion but
recomputes the corpus index inside the query. A deployment does not:
it materializes the index ONCE (the reference's whole platform premise
is materialized state — init-db.js pre-created collections), then each
batch reads the stored artifacts. This module certifies that actual
round-trip: ``build_dedup_index`` writes the three index artifacts to
Parquet, ``q_dedup_incremental_persisted`` reads them back cold and
admits the same incoming batch — same oracle as the in-query variant,
so a driver-green row certifies the store→load path end-to-end
(schema fidelity of the minhash array column included).

Layout and 100 TB story:

* ``fingerprints/`` — md5 strings, the exact-dup set. Compact (16
  bytes/doc); the admit side semi-joins on it.
* ``hot_shingles/`` — the stop-shingle list (two int columns, tiny).
  Stored, not recomputed: a deployed pipeline keeps the stop list
  static per index generation so admission is deterministic
  regardless of batch contents.
* ``bands/`` — (doc_id, band, sig, hv), hive-partitioned by ``band``.
  The admit join is an equi-join on (band, sig); partitioning by band
  prunes each probe to its band directory, and within a band the join
  shuffles on ``sig`` — the same compact-key shuffle as the in-query
  variant. At 100 TB, bucket this table by ``sig`` (io.write_bucketed)
  so nightly admission shuffles ONLY the incoming batch; band
  signatures also append cheaply (new docs add rows, never rewrite).

The index is rebuilt (overwrite) on each query call so the registered
query stays deterministic and self-contained for the driver; the
build cost is the same aggregation the in-query variant pays, plus
one Parquet write. A long-lived deployment calls ``build_dedup_index``
once and ``admit_against_stored`` per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table, run_tmpdir
from ecommerce_analytics_spark.operators.dedup import (
    _INCR_DOC, _INCR_ORACLE, admit_incoming, incremental_incoming,
    index_artifacts,
)
from ecommerce_analytics_spark.plans.registry import query

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def dedup_index_path(sf_dir: str) -> str:
    """Deterministic per-SF index location under the repo warehouse."""
    sf_name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_REPO, "spark-warehouse", f"dedup_index_{sf_name}")


def build_dedup_index(spark: SparkSession, sf_dir: str,
                      path: str | None = None) -> str:
    """Phase 1: compute and write the index artifacts to Parquet."""
    path = path or dedup_index_path(sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    existing = docs.select("doc_id", "text").repartition(n_part, "doc_id")
    x_fp, hot, bands = index_artifacts(spark, existing)
    x_fp.write.mode("overwrite").parquet(os.path.join(path, "fingerprints"))
    hot.write.mode("overwrite").parquet(os.path.join(path, "hot_shingles"))
    (bands.write.mode("overwrite").partitionBy("band")
     .parquet(os.path.join(path, "bands")))
    return path


def admit_against_stored(spark: SparkSession, incoming: DataFrame,
                         path: str) -> DataFrame:
    """Phase 2: admit a batch against the STORED index artifacts."""
    x_fp = spark.read.parquet(os.path.join(path, "fingerprints"))
    hot = spark.read.parquet(os.path.join(path, "hot_shingles"))
    bands = spark.read.parquet(os.path.join(path, "bands"))
    return admit_incoming(incoming, x_fp, hot, bands)


@query(
    "dedup_incremental_persisted",
    _INCR_ORACLE,
    doc="Persisted-index twin of dedup_incremental: the index "
        "artifacts (fingerprints, stop-shingles, band table "
        "hive-partitioned by band) are WRITTEN to Parquet and read "
        "back cold before admission — certifying the build→store→query "
        "round-trip a deployed nightly pipeline runs, including schema "
        "fidelity of the minhash vector column. Same incoming batch "
        "and same oracle as the in-query variant. " + _INCR_DOC,
    tags=("dedup", "join", "north-star", "incremental", "io"),
)
def q_dedup_incremental_persisted(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    # Unique per-run location: the stable dedup_index_path() is the
    # deployment API (nightly build, blue/green rolls); the registered
    # query rebuilds with mode("overwrite") on every invocation, and
    # two concurrent runs at the same SF (parallel sweep + bench) would
    # race on a shared path and read a half-written index.
    run_dir = run_tmpdir(prefix="dedup_index_run_")
    path = build_dedup_index(spark, sf_dir, os.path.join(run_dir, "index"))
    docs = load_table(spark, sf_dir, "documents")
    incoming = incremental_incoming(spark, docs)
    return admit_against_stored(spark, incoming, path)
