"""BM25 self-retrieval MRR vs an independent pure-Python referee.

Recomputes the whole pipeline (shingling, df cap, BM25 scoring,
ranking, MRR) from the raw documents in plain Python — a third
implementation sharing no code with either engine — and asserts the
per-query self-ranks and the corpus MRR match exactly.
"""

from __future__ import annotations

import math
from collections import Counter

# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy


def _referee(texts):
    from ecommerce_analytics_spark.operators.retrieval import (
        BM25_B, BM25_K1, MRR_DF_CAP, MRR_FIX, MRR_MIN_TOKENS,
        MRR_QDOC_MOD, MRR_QDOC_RES, MRR_SH_POS, RR_FIX,
    )
    sh = {}
    for doc_id, text in texts.items():
        t = text.split(" ")
        sh[doc_id] = [" ".join(t[i:i + 3]) for i in range(len(t) - 2)]
    n_docs = len(texts)
    avg = sum(len(s) for s in sh.values()) / n_docs
    df = Counter()
    for s in sh.values():
        df.update(set(s))
    tfs = {d: Counter(s) for d, s in sh.items()}

    out = {}
    rr_fixes = []
    for qid, text in sorted(texts.items()):
        t = text.split(" ")
        if len(t) < MRR_MIN_TOKENS or qid % MRR_QDOC_MOD != MRR_QDOC_RES:
            continue
        terms = {sh[qid][p - 1] for p in MRR_SH_POS}
        terms = {x for x in terms if MRR_DF_CAP * df[x] <= n_docs}
        scores = {}
        for term in terms:
            ridf = (n_docs - df[term] + 0.5) / (df[term] + 0.5)
            for d, tf in tfs.items():
                if tf[term] == 0:
                    continue
                tfn = (tf[term] * (BM25_K1 + 1.0)) / (
                    tf[term] + BM25_K1 * ((1.0 - BM25_B)
                                          + BM25_B * (len(sh[d]) / avg)))
                fix = round(ridf * tfn * MRR_FIX)
                scores[d] = scores.get(d, 0) + fix
        ranked = sorted(scores, key=lambda d: (-scores[d], d))
        self_rank = ranked.index(qid) + 1 if qid in ranked else None
        rr_fix = round(RR_FIX / self_rank) if self_rank else 0
        rr_fixes.append(rr_fix)
        out[qid] = (len(ranked), self_rank)
    mrr = round(sum(rr_fixes) / len(rr_fixes) / RR_FIX, 6)
    return out, mrr


def test_mrr_matches_python_referee(spark, sf_dir):
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.operators.retrieval import (
        q_bm25_self_retrieval_mrr,
    )
    texts = {r["doc_id"]: r["text"]
             for r in load_table(spark, sf_dir, "documents")
             .select("doc_id", "text").collect()}
    want, want_mrr = _referee(texts)

    rows = q_bm25_self_retrieval_mrr(spark, sf_dir).collect()
    got = {r["qid"]: (r["n_candidates"], r["self_rank"]) for r in rows}
    assert got == want
    assert rows[0]["mrr"] == want_mrr
    # sanity: self-retrieval should be strong but imperfect (near-dups
    # in the corpus can outrank the source)
    assert 0.5 < rows[0]["mrr"] <= 1.0


def test_mrr_ndcg_relation(spark, sf_dir):
    """NDCG@10 with a single relevant doc is 1/log2(rank+1) — so a
    rank-1 query must have rr == ndcg10 == 1, and ndcg >= rr
    elsewhere within the cutoff."""
    from ecommerce_analytics_spark.operators.retrieval import (
        NDCG_K, q_bm25_self_retrieval_mrr,
    )
    for r in q_bm25_self_retrieval_mrr(spark, sf_dir).collect():
        if r["self_rank"] == 1:
            assert r["rr"] == 1.0 and r[f"ndcg{NDCG_K}"] == 1.0
        elif r["self_rank"] and r["self_rank"] <= NDCG_K:
            expect = round(1.0 / math.log2(r["self_rank"] + 1.0), 6)
            assert abs(r[f"ndcg{NDCG_K}"] - expect) < 2e-6
            assert r[f"ndcg{NDCG_K}"] >= r["rr"]
        else:
            assert r[f"ndcg{NDCG_K}"] == 0.0
