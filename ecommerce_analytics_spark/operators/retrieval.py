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
