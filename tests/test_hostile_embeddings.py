"""Hostile-embedding certification (round-6 probe, companion of
test_short_docs; internal-NULL-element class added round 7 per
ADVICE r6).

An embeddings table salted with NULL / empty / zero-norm /
wrong-dimension / internal-NULL-element vectors. Findings the
fixture pins:

* knn_bruteforce CRASHED on a zero-norm vector (cosine 0/0 is a loud
  ANSI DIVIDE_BY_ZERO in Spark but NaN in DuckDB) and a ragged vector
  made the two engines' dot products diverge (Spark's zip_with
  null-poisons the fold; DuckDB's SUM skips the null products) — both
  now excluded by the shared emb_v validity predicate.
* embedding_neardup_lsh and embedding_normalize_quantize were already
  total and engine-exact on hostile input (sign-bit bands tolerate
  anything; the quantizer's nrm > 0 guard predates this).
* embedding_validation is the documented ingest gate: its counts must
  classify every hostile row, and its validity predicate is exactly
  knn's filter. Trained-model families (IVF/PQ/eigen) REQUIRE
  validated input by contract — KMeans rejects NULLs outright, and
  ragged vectors make "covariance" itself ill-defined, so the right
  behavior there is gating, not tolerance.
"""

from __future__ import annotations

import os

import pytest

HOSTILE = [
    (700001, None),                  # NULL embedding
    (700002, []),                    # empty array
    (700003, [0.0] * 64),            # zero norm, right dim
    (700004, [1.0, 2.0, 3.0]),       # wrong dimension
    (700005, [0.5] * 64),            # valid extra vector (control)
    # right dim, internal NULL element: Spark's zip_with/aggregate dot
    # null-poisons (row vanishes); DuckDB's SUM skips the null product
    # (row kept, different value) — the one silent cross-engine value
    # divergence; must be its own violation class (ADVICE r6)
    (700006, [1.0, None] + [0.5] * 62),
]


@pytest.fixture(scope="module")
def hostile_sf(sf_dir, tmp_path_factory):
    import duckdb

    out = tmp_path_factory.mktemp("hostile_emb")
    for name in os.listdir(sf_dir):
        if name.endswith(".parquet") and name != "embeddings.parquet":
            os.symlink(os.path.join(sf_dir, name), out / name)
    def _lit(v):
        if v is None:
            return "NULL"
        elems = ("NULL" if x is None else str(x) for x in v)
        return "[" + ", ".join(elems) + "]"

    rows = ", ".join(
        f"(CAST({i} AS BIGINT), CAST({_lit(v)} AS FLOAT[]), 1)"
        for i, v in HOSTILE)
    duckdb.sql(f"""
        COPY (SELECT * FROM '{sf_dir}/embeddings.parquet'
              UNION ALL SELECT * FROM (VALUES {rows})
                t(vec_id, embedding, label))
        TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    return str(out)


@pytest.mark.parametrize("name", [
    "knn_bruteforce",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "embedding_normalize_quantize",
    "embedding_validation",
])
def test_query_matches_oracle_on_hostile_embeddings(
        spark, hostile_sf, name):
    from ecommerce_analytics_spark.plans.registry import all_queries
    from ecommerce_analytics_spark.testing import (
        compare_frames, duckdb_oracle)

    q = all_queries()[name]
    spark_pdf = q.spark_fn(spark, hostile_sf).toPandas()
    problems = compare_frames(spark_pdf, duckdb_oracle(q.oracle,
                                                       hostile_sf),
                              name, float_sig=q.float_sig)
    assert not problems, "\n".join(problems)


def test_validation_classifies_every_hostile_row(spark, hostile_sf,
                                                 sf_dir):
    import duckdb

    from ecommerce_analytics_spark.plans.registry import query_map

    base_n = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    row = query_map()["embedding_validation"](
        spark, hostile_sf).collect()[0]
    assert row.n_vectors == base_n + len(HOSTILE)
    assert row.n_null == 1
    assert row.n_empty == 1
    assert row.n_wrong_dim == 1
    assert row.n_null_elem == 1
    assert row.n_zero_norm == 1
    assert row.n_valid == base_n + 1        # the control vector
    assert (row.n_null + row.n_empty + row.n_wrong_dim + row.n_null_elem
            + row.n_zero_norm + row.n_valid) == row.n_vectors


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
