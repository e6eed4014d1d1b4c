"""Referees for bpe_train_merges: (1) a plain-Python reference BPE
trainer (the Sennrich/HF greedy loop over word counts) must produce
the IDENTICAL merge list; (2) the relational left-to-right rewrite is
pinned on crafted run cases ('aaaa', 'aaa') where greedy semantics
and naive all-matches semantics diverge — the island-parity rule must
match greedy exactly."""

from __future__ import annotations

import collections

import duckdb


def _python_bpe(word_counts: dict[str, int], rounds: int):
    """Reference trainer: greedy left-to-right merges, tie-break
    (count DESC, left, right)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(rounds):
        pairs: collections.Counter = collections.Counter()
        for w, syms in seqs.items():
            c = word_counts[w]
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += c
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_merges_match_reference_trainer(spark, sf_dir):
    from ecommerce_analytics_spark.operators.bpe_train import BPE_ROUNDS
    from ecommerce_analytics_spark.plans.registry import query_map

    got = sorted(query_map()["bpe_train_merges"](spark, sf_dir).collect(),
                 key=lambda r: r["round"])

    toks = duckdb.sql(
        f"""SELECT tok, count(*) FROM (SELECT unnest(string_split(text,
            ' ')) AS tok FROM '{sf_dir}/documents.parquet') GROUP BY tok"""
    ).fetchall()
    exp = _python_bpe(dict(toks), BPE_ROUNDS)

    assert len(got) == BPE_ROUNDS
    for row, (l, r, c) in zip(got, exp):
        assert (row["left_sym"], row["right_sym"]) == (l, r), row["round"]
        assert row["merged"] == l + r
        assert row["pair_count"] == c


def test_rewrite_round_greedy_run_parity(spark):
    """'aaaa' must become [aa, aa] and 'aaa' [aa, a] — the overlap
    cases where the island-parity rule IS the greedy semantics."""
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.operators.bpe_train import (
        _rewrite_round)

    rows = []
    for word in ("aaaa", "aaa", "baaab", "ab"):
        for i, ch in enumerate(word, 1):
            rows.append((word, 1, i, ch))
    s = spark.createDataFrame(rows, "word string, w long, pos int, "
                                    "sym string")
    best, nxt = _rewrite_round(s)
    b = best.collect()[0]
    assert (b["l"], b["r"]) == ("a", "a")  # (a,a) count 5 beats (a,b) 2

    seqs = collections.defaultdict(list)
    for r in nxt.orderBy("word", "pos").collect():
        seqs[r["word"]].append(r["sym"])
    assert seqs["aaaa"] == ["aa", "aa"]
    assert seqs["aaa"] == ["aa", "a"]
    assert seqs["baaab"] == ["b", "aa", "a", "b"]
    assert seqs["ab"] == ["a", "b"]


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
