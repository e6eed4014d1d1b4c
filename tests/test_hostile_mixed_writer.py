"""Mixed-writer lake certification (round 8).

A 100 TB lake is written by many producers over years: column ORDER
differs per writer, extra provenance columns appear, codecs and page
versions vary per file, and compaction leaves 0-row parts. None of
that is allowed to change an answer — the reader contract is
BY NAME, never by position, codec, or file count.

The fixture rewrites every table of the smoke SF as a hostile
directory-of-parts:

* column order REVERSED vs the canonical writer,
* an extra ``_writer_meta`` string column injected mid-schema,
* part 0 zstd-compressed with dictionary encoding disabled and
  parquet data-page v2; part 1 gzip with defaults — two different
  "writers" inside one table,
* plus a 0-row part carrying only the schema (compaction residue /
  empty split class).

Every registered query must hash-match its DuckDB oracle on this
layout (both engines read the same hostile files — any asymmetry in
schema resolution, codec handling, or empty-split behavior surfaces
as a mismatch), and the per-query result hash must equal the
canonical layout's: content-identical lake ⇒ bit-identical answers.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _all_names():
    from ecommerce_analytics_spark.plans.registry import all_queries
    return sorted(all_queries())


@pytest.fixture(scope="module")
def hostile_sf(sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("mixed_writer")
    for name in os.listdir(sf_dir):
        if not name.endswith(".parquet"):
            continue
        src = os.path.join(sf_dir, name)
        table = pq.read_table(src)
        # reversed column order + provenance column spliced into the
        # middle — a by-position reader breaks on BOTH
        cols = list(reversed(table.column_names))
        table = table.select(cols)
        meta = pa.array(["writer-b"] * table.num_rows, type=pa.string())
        table = table.add_column(len(cols) // 2, "_writer_meta", meta)

        dest = out / name
        os.makedirs(dest)
        half = table.num_rows // 2
        pq.write_table(
            table.slice(0, half), dest / "part-0.parquet",
            compression="zstd", use_dictionary=False,
            data_page_version="2.0")
        pq.write_table(
            table.slice(half), dest / "part-1.parquet",
            compression="gzip")
        pq.write_table(table.slice(0, 0), dest / "part-2-empty.parquet")
    return str(out)


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle_on_mixed_writer_lake(
        spark, sf_dir, hostile_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle, value_hash)

    q = all_queries()[name]
    hostile_pdf = q.spark_fn(spark, hostile_sf).toPandas()
    if q.oracle:
        problems = compare_frames(
            hostile_pdf, duckdb_oracle(q.oracle, hostile_sf), name,
            float_sig=q.float_sig)
        assert not problems, "\n".join(problems)
    canon_vh = value_hash(q.spark_fn(spark, sf_dir).toPandas(),
                          float_sig=q.float_sig)
    assert value_hash(hostile_pdf, float_sig=q.float_sig) == canon_vh, (
        f"{name}: result differs between the canonical and the "
        f"mixed-writer layout of identical content")


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
