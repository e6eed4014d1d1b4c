"""Short-document robustness certification (round-6 hostile probe).

Spark's ``sequence(start, stop)`` goes DESCENDING when stop < start,
so the idiomatic n-gram position generator crashed with an ANSI
out-of-bounds on any document shorter than the gram width — while
every DuckDB oracle (empty generate_series) dropped such docs
gracefully. The driver corpus contains no short text, so 236 green
sweeps never saw it; any real corpus would crash on day one.

sqlkit.ngram_positions is the fix; this test certifies it END TO END:
a documents table salted with empty / single-space / one-token /
two-token / NULL / duplicated-short texts, and EVERY registered query
implemented by the patched modules must hash-match its own oracle on
that corpus.
"""

from __future__ import annotations

import os

import pytest

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy

PATCHED_MODULES = {
    "ecommerce_analytics_spark.operators.dedup",
    "ecommerce_analytics_spark.operators.fingerprint",
    "ecommerce_analytics_spark.operators.textrank",
    "ecommerce_analytics_spark.operators.text",
    "ecommerce_analytics_spark.operators.retrieval",
    "ecommerce_analytics_spark.operators.decontam",
    "ecommerce_analytics_spark.operators.ngram_spans",
    "ecommerce_analytics_spark.operators.bigram_lm",
    "ecommerce_analytics_spark.operators.corpus_quality",
}

SHORT_TEXTS = [
    (800001, ""),            # empty
    (800002, " "),           # single space -> ['', '']
    (800003, "one"),         # 1 token
    (800004, "two tokens"),  # 2 tokens (below SHINGLE_K)
    (800006, None),          # NULL text
    (800007, "dup short"),   # duplicated 2-token text ...
    (800008, "dup short"),   # ... (short-dup cluster)
    (800009, "one"),         # duplicate 1-token text
]


@pytest.fixture(scope="module")
def short_sf(sf_dir, tmp_path_factory):
    import duckdb

    out = tmp_path_factory.mktemp("short_sf")
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") and name != "documents.parquet":
            os.symlink(os.path.join(sf_dir, name), out / name)
    rows = ", ".join(
        "(CAST({} AS BIGINT), {}, 'en', 'short', CAST({} AS BIGINT))"
        .format(i, "NULL" if t is None else f"'{t}'",
                0 if t is None else len(t))
        for i, t in SHORT_TEXTS)
    duckdb.sql(f"""
        COPY (SELECT * FROM '{sf_dir}/documents.parquet'
              UNION ALL
              SELECT * FROM (VALUES {rows})
                t(doc_id, text, lang, source, n_chars))
        TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    return str(out)


def _affected():
    from ecommerce_analytics_spark.plans.registry import all_queries
    return sorted(n for n, q in all_queries().items()
                  if q.spark_fn.__module__ in PATCHED_MODULES)


@pytest.mark.parametrize("name", _affected())
def test_query_survives_short_docs(spark, short_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, driver_canon, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, short_sf).toPandas()
    if q.oracle is None:
        driver_canon(spark_pdf)
        return
    oracle_pdf = duckdb_oracle(q.oracle, short_sf)
    problems = compare_frames(spark_pdf, oracle_pdf, name,
                              float_sig=q.float_sig)
    assert not problems, "\n".join(problems)
