"""Right-answer referee for longest_shared_run: the DuckDB oracle
certifies both engines agree; this certifies the agreed number IS the
token-level longest-common-substring length — a quadratic DP
recomputation must match exactly. At sf0.001 no 8-gram exceeds the
64-occurrence cap (asserted), so the capped semantics equal the exact
semantics here."""

from __future__ import annotations

import collections
import itertools

import duckdb


def _lcs_tokens(a: list[str], b: list[str]) -> int:
    """Longest common contiguous run, O(len(a)*len(b)) DP."""
    best = 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            if x == y:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
        prev = cur
    return best


def test_longest_shared_run_is_exact_lcs(spark, sf_dir):
    from ecommerce_analytics_spark.operators.ngram_spans import (
        NGRAM_N, RUN_OCC_CAP)
    from ecommerce_analytics_spark.plans.registry import query_map

    got = {(r["doc_a"], r["doc_b"]): r for r in
           query_map()["longest_shared_run"](spark, sf_dir).collect()}

    docs = dict(duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall())
    toks = {d: t.split(" ") for d, t in docs.items()}

    # candidate pairs = docs sharing any 8-gram; also assert the cap
    # is inert at this SF so capped semantics == exact semantics
    index: dict[str, list] = collections.defaultdict(list)
    for d, t in toks.items():
        for i in range(len(t) - NGRAM_N + 1):
            index[" ".join(t[i:i + NGRAM_N])].append(d)
    cands = set()
    for ds in index.values():
        assert len(ds) <= RUN_OCC_CAP
        for a, b in itertools.combinations(sorted(set(ds)), 2):
            cands.add((a, b))

    # completeness: exactly the pairs with a shared 8-gram are emitted
    assert set(got) == cands

    for (a, b), row in got.items():
        lcs = _lcs_tokens(toks[a], toks[b])
        assert lcs >= NGRAM_N
        assert row["longest_run_tokens"] == lcs, (a, b)
