"""Right-answer referees for the closed-form inference family.

The DuckDB oracles certify that both engines compute the SAME number;
these tests certify it is the RIGHT number (the eigen/numpy precedent,
tests/test_eigen.py): OLS against numpy's lstsq, moments/correlation
against numpy's reference formulas, Mann-Whitney against the O(n^2)
pairwise-comparison definition, and RRF against a pandas recomputation
from the two independently produced legs."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _daily_purchases(sf_dir: str) -> "pd.DataFrame":
    import duckdb
    return duckdb.sql(f"""
        SELECT CAST(ts AS DATE) AS day,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents,
               isodow(CAST(ts AS DATE)) AS dow
        FROM '{sf_dir}/events.parquet'
        WHERE event_type = 'purchase' GROUP BY 1, 3 ORDER BY 1
    """).df()


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    row = query_map()["ols_weekend_trend"](spark, sf_dir).collect()[0]

    daily = _daily_purchases(sf_dir)
    y = daily["cents"].to_numpy(dtype=float) / 100.0
    t = np.arange(1, len(daily) + 1, dtype=float)
    w = (daily["dow"] >= 6).to_numpy(dtype=float)
    X = np.column_stack([np.ones_like(t), t, w])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)

    assert row.n_days == len(daily)
    np.testing.assert_allclose(
        [row.intercept, row.slope_per_day, row.weekend_lift], beta,
        rtol=1e-6, atol=1e-4)
    resid = y - X @ beta
    r2 = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    np.testing.assert_allclose(row.r2, r2, atol=1e-5)


def test_anova_matches_numpy(spark, sf_dir):
    from ecommerce_analytics_spark.plans.registry import query_map
    row = query_map()["anova_dayofweek_revenue"](
        spark, sf_dir).collect()[0]

    daily = _daily_purchases(sf_dir)
    y = daily["cents"].to_numpy(dtype=float)
    groups = [y[(daily["dow"] == d).to_numpy()]
              for d in sorted(daily["dow"].unique())]
    k, n = len(groups), len(y)
    ssb = sum(len(g) * (g.mean() - y.mean()) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row.n_days, row.k_groups, row.df1, row.df2) == (
        n, k, k - 1, n - k)
    np.testing.assert_allclose(row.f_stat, f, rtol=1e-5)
    np.testing.assert_allclose(row.eta_sq, ssb / (ssb + ssw), atol=1e-5)


def test_mannwhitney_matches_pairwise_definition(spark, sf_dir):
    """U_A = #(a > b pairs) + 0.5 * #(ties) over the raw O(n^2)
    definition — only feasible at the smoke SF."""
    import duckdb
    from ecommerce_analytics_spark.plans.registry import query_map
    row = query_map()["mannwhitney_weekend_value"](
        spark, sf_dir).collect()[0]

    vals = duckdb.sql(f"""
        SELECT CAST(round(value * 100) AS BIGINT) AS cents,
               (isodow(ts) >= 6) AS wk
        FROM '{sf_dir}/events.parquet' WHERE event_type = 'purchase'
    """).df()
    a = np.sort(vals[vals.wk]["cents"].to_numpy())
    b = np.sort(vals[~vals.wk]["cents"].to_numpy())
    # 2U = 2*wins + ties, counted via searchsorted on the sorted b
    wins = np.searchsorted(b, a, side="left").sum()
    ties = (np.searchsorted(b, a, side="right")
            - np.searchsorted(b, a, side="left")).sum()
    assert row.n_weekend == len(a) and row.n_weekday == len(b)
    assert row.u2_weekend == 2 * wins + ties
    r_rb = 1.0 - (2 * wins + ties) / (len(a) * len(b))
    np.testing.assert_allclose(row.rank_biserial, r_rb, atol=1e-6)


def test_correlation_matches_numpy(spark, sf_dir):
    import duckdb
    from ecommerce_analytics_spark.plans.registry import query_map
    rows = {(r.var_x, r.var_y): r.corr
            for r in query_map()["lineitem_correlation_matrix"](
                spark, sf_dir).collect()}
    li = duckdb.sql(f"""
        SELECT l_quantity AS quantity, l_extendedprice AS extendedprice,
               l_discount AS discount
        FROM '{sf_dir}/lineitem.parquet'""").df()
    for (x, y), got in rows.items():
        want = np.corrcoef(li[x], li[y])[0, 1]
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_moments_match_numpy(spark, sf_dir):
    import duckdb
    from ecommerce_analytics_spark.plans.registry import query_map
    rows = {r.event_type: r for r in query_map()[
        "value_moments_profile"](spark, sf_dir).collect()}
    ev = duckdb.sql(f"""
        SELECT event_type, round(value * 100) AS cents
        FROM '{sf_dir}/events.parquet'""").df()
    for et, grp in ev.groupby("event_type"):
        x = grp["cents"].to_numpy(dtype=float)
        mu, m2 = x.mean(), ((x - x.mean()) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        r = rows[et]
        assert r.n == len(x)
        np.testing.assert_allclose(r.mean, mu / 100.0, atol=1e-4)
        np.testing.assert_allclose(r.std, np.sqrt(m2) / 100.0,
                                   atol=1e-4)
        np.testing.assert_allclose(r.skewness, m3 / m2 ** 1.5,
                                   atol=1e-5)
        np.testing.assert_allclose(r.kurtosis_excess,
                                   m4 / m2 ** 2 - 3.0, atol=1e-5)


def test_rrf_recomputes_from_legs(spark, sf_dir):
    """The fused top-K must equal an independent pandas RRF over the
    two legs produced by their own builders — catches fusion-join or
    fixed-point bugs that a cross-engine hash (same bug twice) could
    mask, and pins the missing-leg-contributes-zero rule."""
    from ecommerce_analytics_spark.operators.retrieval import (
        RRF_FIX, RRF_K, RRF_TOP_K, shingle_bm25_ranked)
    from ecommerce_analytics_spark.operators.similarity import (
        N_QUERIES, cosine)
    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.plans.registry import query_map
    from pyspark.sql import functions as F

    got = (query_map()["hybrid_retrieval_rrf"](spark, sf_dir)
           .toPandas())

    docs = load_table(spark, sf_dir, "documents")
    lex = (shingle_bm25_ranked(docs, F.col("doc_id") < N_QUERIES,
                               exclude_self=True)
           .select("qid", "doc_id", "rank").toPandas())
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"))
    vec = (qv.join(emb.select(F.col("vec_id").alias("doc_id"),
                              F.col("embedding").alias("ce")),
                   F.col("qid") != F.col("doc_id"))
           .select("qid", "doc_id",
                   cosine(F.col("qe"), F.col("ce")).alias("cos"))
           .toPandas())
    vec = vec.sort_values(["qid", "cos", "doc_id"],
                          ascending=[True, False, True])
    vec["rank"] = vec.groupby("qid").cumcount() + 1

    import collections
    fix = collections.Counter()
    for df in (lex, vec):
        for r in df.itertuples():
            fix[(r.qid, r.doc_id)] += round(RRF_FIX / (RRF_K + r.rank))
    want = pd.DataFrame(
        [(q, d, f) for (q, d), f in fix.items()],
        columns=["qid", "doc_id", "rrf_fix"])
    want = want.sort_values(["qid", "rrf_fix", "doc_id"],
                            ascending=[True, False, True])
    want["rank"] = want.groupby("qid").cumcount() + 1
    want = want[want["rank"] <= RRF_TOP_K]

    gk = got.sort_values(["qid", "rank"])[
        ["qid", "doc_id", "rank"]].to_numpy().tolist()
    wk = want.sort_values(["qid", "rank"])[
        ["qid", "doc_id", "rank"]].to_numpy().tolist()
    assert gk == wk
    # at least one fused row must carry BOTH leg ranks
    both = got.dropna(subset=["lex_rank", "vec_rank"])
    assert len(both) > 0


# Driver-budget tiering (see pytest.ini): this file is in the heavy
# tier — excluded from the default `pytest tests/` run, executed by
# the full gate (tools/run_tests_parallel.py / `-o addopts=`).
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.heavy
