"""Hostile document-METADATA certification (round 7).

The r6 short-doc wave salted `text`; this salts the metadata columns
the corpus-mix/quota/statistics families group and weight by: NULL
`lang`, NULL `source`, NULL and NEGATIVE `n_chars`. One finding:

* lang_id_heuristic emitted a NULL `is_match` boolean for unlabeled
  docs — None from Spark, NaN from DuckDB's pandas round-trip, the
  same comparator-visible divergence class the r6 wave pinned for
  gate booleans. Semantically an unlabeled doc is NOT a match;
  coalesced to FALSE on both sides.

Every registered query whose oracle reads a documents metadata column
must hash-match its unchanged oracle on the salted corpus.
"""

from __future__ import annotations

import os
import re

import pytest

_META_PAT = re.compile(r"\b(lang|source|n_chars)\b")


def _affected():
    from ecommerce_analytics_spark.plans.registry import all_queries
    return sorted(
        n for n, q in all_queries().items()
        if q.oracle and "documents" in q.oracle and _META_PAT.search(q.oracle))


@pytest.fixture(scope="module")
def hostile_sf(sf_dir, tmp_path_factory):
    import duckdb

    out = tmp_path_factory.mktemp("hostile_doc_meta")
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") and name != "documents.parquet":
            os.symlink(os.path.join(sf_dir, name), out / name)
    duckdb.sql(f"""
        COPY (
          SELECT doc_id, text,
                 CASE WHEN doc_id % 41 = 1 THEN NULL ELSE lang END
                   AS lang,
                 CASE WHEN doc_id % 43 = 2 THEN NULL ELSE source END
                   AS source,
                 CASE WHEN doc_id % 47 = 3 THEN NULL
                      WHEN doc_id % 53 = 4 THEN -n_chars
                      ELSE n_chars END AS n_chars
          FROM '{sf_dir}/documents.parquet'
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    return str(out)


@pytest.mark.parametrize("name", _affected())
def test_query_matches_oracle_on_hostile_doc_metadata(
        spark, hostile_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, hostile_sf).toPandas()
    problems = compare_frames(
        spark_pdf, duckdb_oracle(q.oracle, hostile_sf), name,
        float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
