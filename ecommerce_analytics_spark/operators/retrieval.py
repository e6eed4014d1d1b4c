"""BM25 ranked retrieval over the documents corpus (N3 extension).

The reference ships keyword-ish product search over its transaction
descriptions (analytics_queries.sql's LIKE filters); a corpus engine
needs the real thing: BM25 (Robertson/Sparck Jones, the Lucene
``k1``/``b`` variant) scoring every document against a query-term set
and returning the global top-K.

Cross-engine determinism strategy (same playbook as
``tfidf_top_terms``): IEEE +,-,*,/ on doubles are correctly rounded
and therefore bitwise-identical across Spark and DuckDB as long as the
expression TREE is identical — only transcendentals (``ln``) may
differ in the last ulp between libm implementations. So the ranking
key is the ln-free rational-idf score (idf_t = (N-df+0.5)/(df+0.5),
composed with the BM25 tf-normalizer using the exact same operation
order in both engines), while the classic ln-idf BM25 score is emitted
alongside rounded to 6. Per-doc scores add the per-term components in
a FIXED written order ((t1+t2)+t3) rather than through SUM(), whose
accumulation order neither engine guarantees.

Scale shape (the part that matters at 100 TB): per-term tf and doc
length are map-only column expressions over one pruned scan (no
explode, no per-term shuffle); N / avgdl / df_t collapse into ONE
single-row aggregate that is broadcast back; the top-K is
TakeOrderedAndProject (per-partition heap + K-row merge on the
driver), never a global sort. Total cost: one scan + one scalar
exchange + one K-row collect — the plan an inverted-index engine
approximates, obtained here directly from the columnar layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query
from ecommerce_analytics_spark.sqlkit import ngram_positions

QUERY_TERMS = ("vector", "hash", "stream")  # the fixed test query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 25

# DuckDB twin. Expression trees mirror the Spark builders token by
# token: tf via list_filter/len (no unnest), one stats row, fixed-order
# (+) folds, rational-idf ranking, round-6 emitted scores.
_BM25_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {", ".join(
             f"CAST(len(list_filter(string_split(text, ' '), "
             f"x -> x = '{t}')) AS BIGINT) AS tf_{t}"
             for t in QUERY_TERMS)}
  FROM documents
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_tokens,
         {", ".join(
             f"CAST(count(*) FILTER (WHERE tf_{t} > 0) AS BIGINT) AS df_{t}"
             for t in QUERY_TERMS)}
  FROM base
), scored AS (
  SELECT b.doc_id, b.dl,
         {", ".join(f"b.tf_{t}" for t in QUERY_TERMS)},
         {", ".join(f'''
         (CAST(b.tf_{t} AS DOUBLE) * ({BM25_K1} + 1.0))
           / (CAST(b.tf_{t} AS DOUBLE)
              + {BM25_K1} * ((1.0 - {BM25_B})
                 + {BM25_B} * (CAST(b.dl AS DOUBLE)
                    / (CAST(s.total_tokens AS DOUBLE)
                       / CAST(s.n_docs AS DOUBLE))))) AS tfn_{t},
         (CAST(s.n_docs AS DOUBLE) - CAST(s.df_{t} AS DOUBLE) + 0.5)
           / (CAST(s.df_{t} AS DOUBLE) + 0.5) AS ridf_{t}'''
             for t in QUERY_TERMS)}
  FROM base b, stats s
), folded AS (
  SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in QUERY_TERMS)},
         ((ridf_{QUERY_TERMS[0]} * tfn_{QUERY_TERMS[0]}
           + ridf_{QUERY_TERMS[1]} * tfn_{QUERY_TERMS[1]})
          + ridf_{QUERY_TERMS[2]} * tfn_{QUERY_TERMS[2]}) AS rank_score,
         ((ln(1.0 + ridf_{QUERY_TERMS[0]}) * tfn_{QUERY_TERMS[0]}
           + ln(1.0 + ridf_{QUERY_TERMS[1]}) * tfn_{QUERY_TERMS[1]})
          + ln(1.0 + ridf_{QUERY_TERMS[2]}) * tfn_{QUERY_TERMS[2]}) AS bm25
  FROM scored
), ranked AS (
  SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in QUERY_TERMS)},
         round(rank_score, 6) AS rank_score,
         round(bm25, 6) AS bm25,
         CAST(row_number() OVER (
             ORDER BY rank_score DESC, doc_id) AS INTEGER) AS rank
  FROM folded
)
SELECT * FROM ranked WHERE rank <= {BM25_TOP_K}
"""


def bm25_scores(docs: DataFrame,
                terms: tuple[str, ...] = QUERY_TERMS) -> DataFrame:
    """Score every document against ``terms``; returns doc_id, dl,
    per-term tf, rank_score (ln-free rational idf) and bm25 (classic
    ln idf), unrounded. One scan + one broadcast scalar aggregate."""
    def tf_col(t: str):
        # single-arg lambda: a 2-arg one makes pyspark pass the array
        # INDEX as the second argument.
        return (F.size(F.filter(F.split("text", " "),
                                lambda x: x == F.lit(t)))
                .cast("long").alias(f"tf_{t}"))

    base = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("dl"),
        *[tf_col(t) for t in terms],
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        *[F.count_if(F.col(f"tf_{t}") > 0).cast("long").alias(f"df_{t}")
          for t in terms],
    )
    joined = base.join(F.broadcast(stats))
    avgdl = (F.col("total_tokens").cast("double")
             / F.col("n_docs").cast("double"))
    cols = [F.col("doc_id"), F.col("dl"),
            *[F.col(f"tf_{t}") for t in terms]]
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        tfn = (tf * (BM25_K1 + 1.0)) / (
            tf + BM25_K1 * ((1.0 - BM25_B)
                            + BM25_B * (F.col("dl").cast("double") / avgdl)))
        ridf = ((F.col("n_docs").cast("double")
                 - F.col(f"df_{t}").cast("double") + 0.5)
                / (F.col(f"df_{t}").cast("double") + 0.5))
        cols += [tfn.alias(f"tfn_{t}"), ridf.alias(f"ridf_{t}")]
    scored = joined.select(*cols)

    def fold(parts: list) -> object:
        acc = parts[0]
        for p in parts[1:]:
            acc = acc + p
        return acc

    rank_score = fold([F.col(f"ridf_{t}") * F.col(f"tfn_{t}")
                       for t in terms])
    bm25 = fold([F.log(F.lit(1.0) + F.col(f"ridf_{t}")) * F.col(f"tfn_{t}")
                 for t in terms])
    return scored.select(
        "doc_id", "dl", *[f"tf_{t}" for t in terms],
        rank_score.alias("rank_score"), bm25.alias("bm25"))


@query(
    "bm25_top_docs",
    _BM25_ORACLE,
    doc=f"BM25 top-{BM25_TOP_K} retrieval for the fixed query "
        f"{QUERY_TERMS} (k1={BM25_K1}, b={BM25_B}). Ranked by the "
        "ln-free rational-idf score (bitwise cross-engine — IEEE "
        "+,-,*,/ only, fixed fold order); classic ln-idf BM25 emitted "
        "rounded. Plan: one pruned scan, map-only per-term tf (no "
        "explode), ONE broadcast single-row stats aggregate, top-K via "
        "TakeOrderedAndProject — no global sort at any scale.",
    tags=("text", "retrieval", "north-star"),
)
def q_bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(docs)
    top = (scored
           .orderBy(F.desc("rank_score"), F.asc("doc_id"))
           .limit(BM25_TOP_K))
    # row_number window runs over the K surviving rows only — the
    # global ordering work happened in TakeOrderedAndProject above.
    w = Window.orderBy(F.desc("rank_score"), F.asc("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("doc_id", "dl", *[f"tf_{t}" for t in QUERY_TERMS],
                    F.round("rank_score", 6).alias("rank_score"),
                    F.round("bm25", 6).alias("bm25"), "rank"))


# ---------------------------------------------------------------------------
# Multi-query retrieval EVALUATION: BM25 self-retrieval MRR / NDCG.
# ---------------------------------------------------------------------------

MRR_QDOC_MOD = 13          # doc_id % 13 == 3 -> query doc
MRR_QDOC_RES = 3
MRR_MIN_TOKENS = 10        # need shingles starting at tokens 2, 5, 8
MRR_SH_POS = (2, 5, 8)     # 1-based shingle positions forming the query
MRR_DF_CAP = 4             # drop shingles with df > n_docs / 4
MRR_FIX = 1_000_000_000    # per-term score fixed point
RR_FIX = 1_000_000         # reciprocal-rank / NDCG fixed point
NDCG_K = 10

# the corpus vocabulary is ~31 tokens (median single-token df is 78%
# of the corpus), so the retrieval unit is the 3-gram SHINGLE (median
# df = 1) — the same unit the dedup family indexes. dl is the shingle
# count (n_tokens - 2).
_SH_EXPR_SQL = "toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]"

_MRR_ORACLE = f"""
WITH td AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), qterms AS (
  SELECT DISTINCT doc_id AS qid, sh AS term FROM (
    SELECT doc_id,
           unnest(list_transform([{", ".join(str(p) for p in MRR_SH_POS)}],
                                 i -> {_SH_EXPR_SQL})) AS sh
    FROM td
    WHERE len(toks) >= {MRR_MIN_TOKENS}
      AND doc_id % {MRR_QDOC_MOD} = {MRR_QDOC_RES})
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks) - 2) AS BIGINT) AS total_sh
  FROM td
), dl AS (
  SELECT doc_id, CAST(len(toks) - 2 AS BIGINT) AS dl FROM td
), tf AS MATERIALIZED (
  SELECT doc_id, sh AS term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - 2),
                                 i -> {_SH_EXPR_SQL})) AS sh
    FROM td)
  WHERE sh IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, sh
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), kept AS (
  SELECT term, df FROM df, stats WHERE {MRR_DF_CAP} * df <= n_docs
), persc AS (
  SELECT q.qid, t.doc_id,
         CAST(round(
           ((CAST(s.n_docs AS DOUBLE) - CAST(k.df AS DOUBLE) + 0.5)
              / (CAST(k.df AS DOUBLE) + 0.5))
           * ((CAST(t.tf AS DOUBLE) * ({BM25_K1} + 1.0))
              / (CAST(t.tf AS DOUBLE)
                 + {BM25_K1} * ((1.0 - {BM25_B})
                    + {BM25_B} * (CAST(l.dl AS DOUBLE)
                       / (CAST(s.total_sh AS DOUBLE)
                          / CAST(s.n_docs AS DOUBLE))))))
           * {MRR_FIX}) AS BIGINT) AS fix
  FROM qterms q
  JOIN kept k ON k.term = q.term
  JOIN tf t ON t.term = q.term
  JOIN dl l ON l.doc_id = t.doc_id, stats s
), byqd AS (
  SELECT qid, doc_id, CAST(sum(fix) AS BIGINT) AS score_fix
  FROM persc GROUP BY qid, doc_id
), ranked AS (
  SELECT qid, doc_id, score_fix,
         CAST(row_number() OVER (PARTITION BY qid
             ORDER BY score_fix DESC, doc_id) AS BIGINT) AS rank
  FROM byqd
), perq AS (
  SELECT qid, CAST(count(*) AS BIGINT) AS n_candidates,
         max(CASE WHEN doc_id = qid THEN rank END) AS self_rank
  FROM ranked GROUP BY qid
), fixed AS (
  SELECT qid, n_candidates, self_rank,
         CASE WHEN self_rank IS NULL THEN 0
              ELSE CAST(round({RR_FIX}.0 / self_rank) AS BIGINT)
         END AS rr_fix,
         CASE WHEN self_rank IS NULL OR self_rank > {NDCG_K} THEN 0
              ELSE CAST(round({RR_FIX}.0
                   / log2(CAST(self_rank AS DOUBLE) + 1.0)) AS BIGINT)
         END AS ndcg_fix
  FROM perq
)
SELECT f.qid, f.n_candidates, f.self_rank,
       round(CAST(f.rr_fix AS DOUBLE) / {RR_FIX}, 6) AS rr,
       round(CAST(f.ndcg_fix AS DOUBLE) / {RR_FIX}, 6) AS ndcg{NDCG_K},
       g.mrr, g.mean_ndcg
FROM fixed f, (
  SELECT round(CAST(sum(rr_fix) AS DOUBLE) / count(*) / {RR_FIX}, 6)
           AS mrr,
         round(CAST(sum(ndcg_fix) AS DOUBLE) / count(*) / {RR_FIX}, 6)
           AS mean_ndcg
  FROM fixed) g
"""


def _shingle_expr(positions) -> str:
    """Spark SQL: explode the doc's 3-gram shingles at ``positions``
    (a sequence expression or a literal array of 1-based starts)."""
    return (f"explode(transform({positions}, "
            f"i -> concat_ws(' ', element_at(split(text, ' '), i), "
            f"element_at(split(text, ' '), i + 1), "
            f"element_at(split(text, ' '), i + 2))))")


@query(
    "bm25_self_retrieval_mrr",
    _MRR_ORACLE,
    doc=f"Multi-query retrieval EVALUATION: every query doc "
        f"(doc_id%{MRR_QDOC_MOD}=={MRR_QDOC_RES}) issues its 3-gram "
        f"shingles at positions {MRR_SH_POS} as a BM25 query over the "
        f"whole corpus (shingles, not tokens: the 31-token synthetic "
        f"vocabulary makes single-token df useless, while shingle "
        f"median df is 1 — the same unit the dedup family indexes); "
        f"the metric is the rank of the SOURCE doc (self-retrieval "
        f"sanity eval): per-query reciprocal rank + NDCG@{NDCG_K}, "
        f"plus corpus MRR / mean NDCG. Candidates come from the "
        f"posting-list equi-join with a WAND-style df cap "
        f"(df > n_docs/{MRR_DF_CAP} dropped), so fan-out is bounded — "
        f"no all-pairs. Per-term BM25 scores quantize to 1e-9 fixed "
        f"point BEFORE the per-doc SUM (neither engine guarantees "
        f"float SUM accumulation order; integer sums are exact), and "
        f"the MRR/NDCG means reuse the trick at 1e-6. The one "
        f"transcendental (log2 in NDCG) follows the PMI round-6 "
        f"precedent.",
    tags=("text", "retrieval", "eval", "north-star"),
)
def q_bm25_self_retrieval_mrr(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ranked = shingle_bm25_ranked(
        docs, F.col("doc_id") % MRR_QDOC_MOD == MRR_QDOC_RES)
    perq = (ranked.groupBy("qid")
            .agg(F.count(F.lit(1)).cast("long").alias("n_candidates"),
                 F.max(F.when(F.col("doc_id") == F.col("qid"),
                              F.col("rank"))).alias("self_rank")))
    rr_fix = F.when(F.col("self_rank").isNull(), F.lit(0).cast("long")) \
              .otherwise(F.round(float(RR_FIX) / F.col("self_rank"))
                         .cast("long"))
    ndcg_fix = F.when(
        F.col("self_rank").isNull() | (F.col("self_rank") > NDCG_K),
        F.lit(0).cast("long")).otherwise(
        F.round(float(RR_FIX)
                / F.log2(F.col("self_rank").cast("double") + 1.0))
        .cast("long"))
    fixed = perq.select("qid", "n_candidates", "self_rank",
                        rr_fix.alias("rr_fix"),
                        ndcg_fix.alias("ndcg_fix"))
    glob = fixed.groupBy().agg(
        F.round(F.sum("rr_fix").cast("double") / F.count(F.lit(1))
                / RR_FIX, 6).alias("mrr"),
        F.round(F.sum("ndcg_fix").cast("double") / F.count(F.lit(1))
                / RR_FIX, 6).alias("mean_ndcg"))
    return (fixed.join(F.broadcast(glob))
            .select("qid", "n_candidates", "self_rank",
                    F.round(F.col("rr_fix").cast("double") / RR_FIX, 6)
                    .alias("rr"),
                    F.round(F.col("ndcg_fix").cast("double") / RR_FIX, 6)
                    .alias(f"ndcg{NDCG_K}"),
                    "mrr", "mean_ndcg"))


def shingle_bm25_ranked(docs: DataFrame, qdoc_pred,
                        exclude_self: bool = False) -> DataFrame:
    """Full shingle-BM25 candidate ranking (qid, doc_id, score_fix,
    rank) for every query doc selected by ``qdoc_pred`` (composed with
    the MRR_MIN_TOKENS shingle-length floor). The shared lexical leg
    of the MRR eval above and the RRF fusion below; ``exclude_self``
    drops the query doc from its own candidate list BEFORE ranking
    (retrieval semantics) — the MRR eval keeps it (self-rank IS the
    metric)."""
    toks = F.split("text", " ")
    pos_arr = "array(" + ", ".join(str(p) for p in MRR_SH_POS) + ")"
    qterms = (docs
              .filter((F.size(toks) >= MRR_MIN_TOKENS) & qdoc_pred)
              .select(F.col("doc_id").alias("qid"),
                      F.expr(_shingle_expr(pos_arr)).alias("term"))
              .distinct())
    # per-doc shingle lengths, checkpointed (n_docs × two longs —
    # tiny): the corpus stats then aggregate the materialized frame
    # (count/sum over dl's rows equal the direct corpus aggregates
    # exactly — same rows, associative integer sums) and the per-score
    # join re-reads it, saving one full text-column scan per ranking
    # call (round 11, guide §2.4)
    dl = (docs.select(
        "doc_id", (F.size(toks).cast("long") - 2).alias("dl"))
        .localCheckpoint(eager=True))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_sh"))
    terms = qterms.select("term").distinct()
    tf = (docs.select(
              "doc_id",
              F.expr(_shingle_expr(ngram_positions("split(text, ' ')", 3)))
              .alias("term"))
          .join(F.broadcast(terms), "term", "left_semi")
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).cast("long").alias("tf")))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    kept = (df.join(F.broadcast(stats))
            .filter(MRR_DF_CAP * F.col("df") <= F.col("n_docs"))
            .select("term", "df"))
    avg_sh = (F.col("total_sh").cast("double")
              / F.col("n_docs").cast("double"))
    tfd = F.col("tf").cast("double")
    tfn = (tfd * (BM25_K1 + 1.0)) / (
        tfd + BM25_K1 * ((1.0 - BM25_B)
                         + BM25_B * (F.col("dl").cast("double") / avg_sh)))
    ridf = ((F.col("n_docs").cast("double")
             - F.col("df").cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5))
    persc = (qterms
             .join(F.broadcast(kept), "term")
             .join(tf, "term")
             .join(dl, "doc_id")
             .join(F.broadcast(stats))
             .select("qid", "doc_id",
                     F.round(ridf * tfn * MRR_FIX).cast("long")
                     .alias("fix")))
    byqd = (persc.groupBy("qid", "doc_id")
            .agg(F.sum("fix").cast("long").alias("score_fix")))
    if exclude_self:
        byqd = byqd.filter(F.col("doc_id") != F.col("qid"))
    w = Window.partitionBy("qid").orderBy(
        F.desc("score_fix"), F.asc("doc_id"))
    return byqd.withColumn("rank",
                           F.row_number().over(w).cast("long"))


RRF_K = 60                 # standard reciprocal-rank-fusion constant
RRF_FIX = 1_000_000_000    # per-leg 1/(k+rank) fixed point
RRF_TOP_K = 10


def _rrf_oracle() -> str:
    from ecommerce_analytics_spark.operators.similarity import (
        N_QUERIES, _cos_sql)
    pos = ", ".join(str(p) for p in MRR_SH_POS)
    return f"""
WITH td AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), qterms AS (
  SELECT DISTINCT doc_id AS qid, sh AS term FROM (
    SELECT doc_id,
           unnest(list_transform([{pos}],
                                 i -> {_SH_EXPR_SQL})) AS sh
    FROM td
    WHERE len(toks) >= {MRR_MIN_TOKENS}
      AND doc_id < {N_QUERIES})
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks) - 2) AS BIGINT) AS total_sh
  FROM td
), dl AS (
  SELECT doc_id, CAST(len(toks) - 2 AS BIGINT) AS dl FROM td
), tf AS MATERIALIZED (
  SELECT doc_id, sh AS term, CAST(count(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(toks) - 2),
                                 i -> {_SH_EXPR_SQL})) AS sh
    FROM td)
  WHERE sh IN (SELECT DISTINCT term FROM qterms)
  GROUP BY doc_id, sh
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), kept AS (
  SELECT term, df FROM df, stats WHERE {MRR_DF_CAP} * df <= n_docs
), persc AS (
  SELECT q.qid, t.doc_id,
         CAST(round(
           ((CAST(s.n_docs AS DOUBLE) - CAST(k.df AS DOUBLE) + 0.5)
              / (CAST(k.df AS DOUBLE) + 0.5))
           * ((CAST(t.tf AS DOUBLE) * ({BM25_K1} + 1.0))
              / (CAST(t.tf AS DOUBLE)
                 + {BM25_K1} * ((1.0 - {BM25_B})
                    + {BM25_B} * (CAST(l.dl AS DOUBLE)
                       / (CAST(s.total_sh AS DOUBLE)
                          / CAST(s.n_docs AS DOUBLE))))))
           * {MRR_FIX}) AS BIGINT) AS fix
  FROM qterms q
  JOIN kept k ON k.term = q.term
  JOIN tf t ON t.term = q.term
  JOIN dl l ON l.doc_id = t.doc_id, stats s
), byqd AS (
  SELECT qid, doc_id, CAST(sum(fix) AS BIGINT) AS score_fix
  FROM persc WHERE doc_id <> qid GROUP BY qid, doc_id
), lex AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid
             ORDER BY score_fix DESC, doc_id) AS BIGINT) AS lex_rank
  FROM byqd
), qv AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}
), vscored AS (
  SELECT qv.vec_id AS qid, c.vec_id AS doc_id,
         {_cos_sql('qv.embedding', 'c.embedding')} AS cos_sim
  FROM qv JOIN embeddings c ON qv.vec_id <> c.vec_id
), vec AS (
  SELECT qid, doc_id,
         CAST(row_number() OVER (PARTITION BY qid
             ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS vec_rank
  FROM vscored
), fused AS (
  SELECT coalesce(l.qid, v.qid) AS qid,
         coalesce(l.doc_id, v.doc_id) AS doc_id,
         l.lex_rank, v.vec_rank,
         coalesce(CAST(round({RRF_FIX}.0 / ({RRF_K} + l.lex_rank))
                       AS BIGINT), 0)
         + coalesce(CAST(round({RRF_FIX}.0 / ({RRF_K} + v.vec_rank))
                         AS BIGINT), 0) AS rrf_fix
  FROM lex l FULL OUTER JOIN vec v
    ON v.qid = l.qid AND v.doc_id = l.doc_id
), franked AS (
  SELECT qid, doc_id, lex_rank, vec_rank, rrf_fix,
         CAST(row_number() OVER (PARTITION BY qid
             ORDER BY rrf_fix DESC, doc_id) AS BIGINT) AS rank
  FROM fused
)
SELECT qid, doc_id, lex_rank, vec_rank,
       round(CAST(rrf_fix AS DOUBLE) / {RRF_FIX}, 6) AS rrf, rank
FROM franked WHERE rank <= {RRF_TOP_K}
"""


@query(
    "hybrid_retrieval_rrf",
    _rrf_oracle(),
    doc=f"Hybrid search: reciprocal-rank fusion (k={RRF_K}) of the "
        f"shingle-BM25 lexical ranking (shared builder with the MRR "
        f"eval, self-excluded) and the exact-cosine vector ranking "
        f"(the knn_bruteforce leg) for the same query docs, top-"
        f"{RRF_TOP_K} fused per query — the standard production "
        f"pattern for combining an inverted index with an ANN tier. "
        f"Each leg's 1/(k+rank) contribution snaps to 1e-9 fixed "
        f"point from an INTEGER rank, so fusion scores and the final "
        f"ranking are exact; a doc missing from one leg contributes "
        f"0 through the full-outer join (no rank imputation). At "
        f"scale the vector leg swaps for the IVF/PQ tier "
        f"(similarity.py, ivfpq.py) without touching the fusion.",
    tags=("text", "retrieval", "similarity", "north-star", "join"),
)
def q_hybrid_retrieval_rrf(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.operators.similarity import (
        N_QUERIES, dot, norm)

    docs = load_table(spark, sf_dir, "documents")
    lex = (shingle_bm25_ranked(docs, F.col("doc_id") < N_QUERIES,
                               exclude_self=True)
           .select("qid", "doc_id",
                   F.col("rank").alias("lex_rank")))

    emb = load_table(spark, sf_dir, "embeddings")
    qv = (emb.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("qid"),
                  F.col("embedding").alias("q_emb"),
                  norm(F.col("embedding")).alias("q_norm")))
    c = emb.select(F.col("vec_id").alias("doc_id"),
                   F.col("embedding").alias("c_emb"),
                   norm(F.col("embedding")).alias("c_norm"))
    vscored = (F.broadcast(qv)
               .join(c, F.col("qid") != F.col("doc_id"))
               .select("qid", "doc_id",
                       (dot(F.col("q_emb"), F.col("c_emb"))
                        / (F.col("q_norm") * F.col("c_norm")))
                       .alias("cos_sim")))
    wv = Window.partitionBy("qid").orderBy(
        F.desc("cos_sim"), F.asc("doc_id"))
    vec = (vscored
           .withColumn("vec_rank", F.row_number().over(wv).cast("long"))
           .select("qid", "doc_id", "vec_rank"))

    leg = lambda r: F.round(float(RRF_FIX) / (RRF_K + F.col(r))) \
        .cast("long")
    fused = (lex.join(vec, ["qid", "doc_id"], "full_outer")
             .select("qid", "doc_id", "lex_rank", "vec_rank",
                     (F.coalesce(leg("lex_rank"), F.lit(0))
                      + F.coalesce(leg("vec_rank"), F.lit(0)))
                     .alias("rrf_fix")))
    wf = Window.partitionBy("qid").orderBy(
        F.desc("rrf_fix"), F.asc("doc_id"))
    return (fused
            .withColumn("rank", F.row_number().over(wf).cast("long"))
            .filter(F.col("rank") <= RRF_TOP_K)
            .select("qid", "doc_id", "lex_rank", "vec_rank",
                    F.round(F.col("rrf_fix").cast("double") / RRF_FIX, 6)
                    .alias("rrf"), "rank"))
