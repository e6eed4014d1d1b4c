"""Golden edge cases for operators/ngram_spans (repeated n-gram
mining + span pruning). The registry queries carry the oracle
certification at the driver SFs; these pin the hand-computable edges:
docs shorter than N tokens, full-document coverage, and the 1-based
position/coverage arithmetic."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.ngram_spans import (
    NGRAM_N, q_repeated_ngram_docs, q_repeated_ngram_prune,
)

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


@pytest.fixture(scope="module")
def tiny_docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ngram_docs"))
    shared = " ".join(f"w{i}" for i in range(NGRAM_N))          # exactly N
    rows = [
        # docs 1+2 share one exact 8-gram inside distinct prefixes
        (1, "alpha beta " + shared + " tail1", "en", "src", 0),
        (2, "gamma " + shared + " tail2 tail3", "en", "src", 0),
        # doc 3: shorter than N tokens -> zero grams, nothing pruned
        (3, "too short for any gram", "en", "src", 0),
        # docs 4+5: identical N-token docs -> fully covered, empty prune
        (4, shared, "en", "src", 0),
        (5, shared, "en", "src", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    df.withColumn("n_chars", F.length("text")) \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_repeated_gram_inventory(spark, tiny_docs_dir):
    rows = {r["gram"]: r for r in
            q_repeated_ngram_docs(spark, tiny_docs_dir).collect()}
    shared = " ".join(f"w{i}" for i in range(NGRAM_N))
    assert set(rows) == {shared}
    r = rows[shared]
    assert r["n_docs"] == 4 and r["n_occurrences"] == 4
    assert r["gram_hash"] == hashlib.md5(shared.encode()).hexdigest()


def test_prune_edges(spark, tiny_docs_dir):
    got = {r["doc_id"]: r for r in
           q_repeated_ngram_prune(spark, tiny_docs_dir).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    # doc 3: no gram possible -> untouched
    assert got[3]["n_tokens_before"] == 5
    assert got[3]["n_tokens_after"] == 5
    assert got[3]["pruned_md5"] == hashlib.md5(
        b"too short for any gram").hexdigest()
    # docs 4/5: fully covered -> empty reconstruction
    for d in (4, 5):
        assert got[d]["n_tokens_after"] == 0
        assert got[d]["pruned_md5"] == hashlib.md5(b"").hexdigest()
    # doc 1: "alpha beta" + "tail1" survive (coverage is exactly the
    # shared gram's N positions)
    assert got[1]["n_tokens_before"] == NGRAM_N + 3
    assert got[1]["n_tokens_after"] == 3
    assert got[1]["pruned_md5"] == hashlib.md5(
        b"alpha beta tail1").hexdigest()
    # doc 2: "gamma" + "tail2 tail3" survive
    assert got[2]["n_tokens_after"] == 3
    assert got[2]["pruned_md5"] == hashlib.md5(
        b"gamma tail2 tail3").hexdigest()
