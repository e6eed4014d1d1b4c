"""Referees for the Zipf fit and path mining: numpy/plain
recomputations on raw floats must match the exact-arithmetic
results."""

from __future__ import annotations

import collections
import math

import duckdb
import numpy as np


def test_zipf_matches_numpy_polyfit(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    row = query_map()["zipf_vocab_exponent"](spark, sf_dir).collect()[0]

    toks = duckdb.sql(f"""
        SELECT tok, count(*) AS c FROM (SELECT unnest(string_split(text,
        ' ')) AS tok FROM '{sf_dir}/documents.parquet')
        GROUP BY tok ORDER BY c DESC, tok""").fetchall()
    x = np.log(np.arange(1, len(toks) + 1, dtype=float))
    y = np.log(np.array([c for _, c in toks], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)

    assert row["n_words"] == len(toks)
    assert abs(row["zipf_slope"] - slope) < 1e-4
    assert abs(row["intercept_ln_freq"] - intercept) < 1e-3
    assert row["zipf_slope"] < 0  # frequency decreases with rank


def test_top_paths_match_plain_recount(spark, sf_dir):
    from ecommerce_analytics_spark.operators.zipf_paths import (
        PATH_LEN, PATH_TOP_K)
    from ecommerce_analytics_spark.plans.registry import query_map
    got = query_map()["top_event_paths"](spark, sf_dir).collect()

    rows = duckdb.sql(f"""
        SELECT user_id, CAST(ts AS DATE), event_type
        FROM '{sf_dir}/events.parquet'
        ORDER BY user_id, CAST(ts AS DATE), ts, event_id""").fetchall()
    journeys = collections.defaultdict(list)
    for u, d, et in rows:
        if len(journeys[(u, d)]) < PATH_LEN:
            journeys[(u, d)].append(et)
    counts: collections.Counter = collections.Counter(
        ">".join(p) for p in journeys.values())
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP_K]

    assert [(r["path"], r["n_journeys"]) for r in
            sorted(got, key=lambda r: (-r["n_journeys"], r["path"]))] == exp


def test_heaps_matches_numpy_polyfit(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    row = query_map()["heaps_vocab_growth"](spark, sf_dir).collect()[0]

    docs = duckdb.sql(f"""
        SELECT doc_id, text FROM '{sf_dir}/documents.parquet'
        ORDER BY doc_id""").fetchall()
    seen: set = set()
    cum_toks = cum_vocab = 0
    xs, ys = [], []
    for _, text in docs:
        toks = text.split(" ")
        cum_toks += len(toks)
        for t in toks:
            if t not in seen:
                seen.add(t)
                cum_vocab += 1
        xs.append(math.log(cum_toks))
        ys.append(math.log(cum_vocab))
    slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)

    assert row["n_docs"] == len(docs)
    assert abs(row["heaps_beta"] - slope) < 1e-4
    assert abs(row["intercept_ln_vocab"] - intercept) < 1e-3
    # sub-linear vocabulary growth
    assert 0.0 < row["heaps_beta"] < 1.0
