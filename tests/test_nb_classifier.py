"""Right-answer referee for the Naive Bayes source classifier.

The DuckDB oracle certifies both engines compute the SAME scores;
this certifies they are the RIGHT scores: an independent sklearn-free
numpy/pandas recomputation of multinomial NB with add-1 smoothing
(priors + per-class token log-likelihoods, no fixed-point tricks)
must produce the same argmax prediction for every held-out document,
and per-doc scores must agree with the fixed-point sums to the
snapping tolerance.
"""

from __future__ import annotations

import collections
import hashlib
import math

import duckdb
import pandas as pd

NB_TRAIN_FRAC = 0.8


def _u(doc_id: int) -> float:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
    return int(h, 16) / float(2 ** 32)


def test_nb_matches_plain_float_recompute(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    got = (query_map()["nb_source_classifier"](spark, sf_dir)
           .toPandas().set_index("doc_id").sort_index())

    docs = duckdb.sql(
        f"SELECT doc_id, text, source FROM "
        f"'{sf_dir}/documents.parquet'").df()
    docs["is_train"] = docs["doc_id"].map(lambda d: _u(d) < NB_TRAIN_FRAC)
    train = docs[docs["is_train"]]
    test = docs[~docs["is_train"]]

    counts: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter)
    for _, r in train.iterrows():
        counts[r["source"]].update(r["text"].split(" "))
    vocab = {t for c in counts.values() for t in c}
    v = len(vocab)
    n_train = len(train)
    priors = train.groupby("source").size().to_dict()
    classes = sorted(priors)

    rows = []
    for _, r in test.iterrows():
        toks = r["text"].split(" ")
        best = None
        for c in classes:
            tot = sum(counts[c].values())
            s = math.log(priors[c] / n_train)
            s -= len(toks) * math.log(tot + v)
            s += sum(math.log(counts[c][t] + 1)
                     for t in toks if counts[c][t] > 0)
            # strictly-greater keeps the first (smallest) class on ties,
            # matching the query's (score DESC, source ASC) row_number
            if best is None or s > best[1] + 1e-9:
                best = (c, s)
        rows.append((r["doc_id"], r["source"], best[0], best[1]))
    ref = (pd.DataFrame(rows, columns=[
        "doc_id", "true_source", "predicted_source", "score"])
        .set_index("doc_id").sort_index())

    assert list(got.index) == list(ref.index)
    assert (got["true_source"] == ref["true_source"]).all()
    assert (got["predicted_source"] == ref["predicted_source"]).all()
    # fixed-point snapping is 1e-9 per log term; docs are <100 tokens
    assert (got["score"] - ref["score"]).abs().max() < 1e-5
    acc = (ref["true_source"] == ref["predicted_source"]).mean()
    assert abs(got["accuracy"].iloc[0] - round(acc, 6)) < 1e-9
