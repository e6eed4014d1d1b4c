"""Right-answer referee for the bigram LM score: the DuckDB oracle
certifies both engines agree; this certifies the agreed number IS
interpolated-bigram NLL — a plain-Python float recomputation with no
fixed-point tricks must match to the snapping tolerance."""

from __future__ import annotations

import collections
import math

import duckdb

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


def test_bigram_nll_matches_plain_float_recompute(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = {r["doc_id"]: r for r in
           query_map()["doc_bigram_logprob"](spark, sf_dir).collect()}

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    uni: collections.Counter = collections.Counter()
    c12: collections.Counter = collections.Counter()
    hist: collections.Counter = collections.Counter()
    toks = {}
    for doc_id, text in docs:
        t = text.split(" ")
        toks[doc_id] = t
        uni.update(t)
        for w1, w2 in zip(t, t[1:]):
            c12[(w1, w2)] += 1
            hist[w1] += 1
    n_total = sum(uni.values())
    v = len(uni)

    for doc_id, t in toks.items():
        bgs = list(zip(t, t[1:]))
        if not bgs:
            assert doc_id not in got
            continue
        nll = 0.0
        for w1, w2 in bgs:
            p = (0.75 * c12[(w1, w2)] / hist[w1]
                 + 0.25 * (uni[w2] + 1) / (n_total + v))
            nll -= math.log(p)
        g = got[doc_id]
        assert g["n_bigrams"] == len(bgs)
        # 1e-9 snapping per bigram, <100 bigrams per doc
        assert abs(g["bigram_nll"] - nll / len(bgs)) < 1e-5, doc_id
