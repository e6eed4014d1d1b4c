"""Corpus-quality and chunking operators for training-data pipelines
(SURVEY §2.10 N3 extensions).

Four operators a pretraining data pipeline runs corpus-wide:

- ``doc_quality_gopher``   — Gopher-style rule-based quality gate
  (Rae et al. 2021 §A1.1 adapted to token-level signals: word-count
  bounds, mean word length, most-frequent-token fraction, duplicate
  2-gram fraction).
- ``doc_repetition_topngram`` — repetition detection: the single most
  repeated 2-gram per document and the fraction of the document it
  covers (the "top n-gram fraction" signal from the Gopher/C4 rules).
- ``doc_chunks``           — overlapping token-window chunking (size
  CHUNK_TOKENS, stride CHUNK_STRIDE): the context-window preparation
  step before tokenization.
- ``tfidf_top_terms``      — per-document top-5 keyword extraction.

Scale notes: the quality/repetition operators are MAP-ONLY — every
feature is a higher-order array function over the per-row token array
(documents are bounded-size), so they run at scan speed with zero
shuffle at any corpus size; the alternative explode+groupBy(doc, gram)
formulation shuffles one row per (doc, gram) and only wins when
single documents are huge. Chunking is a map-side explode (output ∝
input). TF-IDF is the one shuffle-bearing op: token explode →
groupBy(doc, term) → two window passes on compact keys; the corpus
size N broadcasts.

Cross-engine determinism: every ranked/filters score is a ratio of
exact integers (bitwise-identical doubles in Spark and DuckDB); the
transcendental ln() appears only in a display column rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

# Gopher-style gate thresholds, calibrated so the synthetic corpus
# splits (n_tokens 10-99, mean_len 3.7-5.3, top-token p90 ≈ 0.14,
# dup-bigram p90 ≈ 0.065 at sf0.01).
MIN_TOKENS = 25
MEAN_LEN_LO = 3.0
MEAN_LEN_HI = 5.0
TOP_TOKEN_FRAC_MAX = 0.12
DUP_BIGRAM_FRAC_MAX = 0.05

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24
TFIDF_TOP_K = 5

def gopher_feat_ctes(src: str = "documents") -> str:
    """The tok/feat CTE pair (DuckDB SQL) over any doc-shaped source —
    reused by the pipeline-composition oracle (training_prep) with an
    augmented corpus as ``src``."""
    return f"""tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t, length(text) AS n_chars
  FROM {src}
), feat AS (
  SELECT doc_id, lang,
         CAST(len(t) AS BIGINT) AS n_tokens,
         CAST(n_chars - len(t) + 1 AS DOUBLE) / len(t) AS mean_token_len,
         CAST(list_max(list_transform(list_distinct(t),
              x -> len(list_filter(t, y -> y = x)))) AS DOUBLE) / len(t)
           AS top_token_frac,
         CASE WHEN len(t) >= 2 THEN
           CAST(len(t) - 1
                - len(list_distinct(list_transform(
                      generate_series(1, len(t) - 1),
                      i -> t[i] || ' ' || t[i + 1]))) AS DOUBLE)
             / (len(t) - 1)
         ELSE 0.0 END AS dup_bigram_frac
  FROM tok
)"""


GOPHER_PASS_COND = (
    f"(n_tokens >= {MIN_TOKENS}"
    f" AND mean_token_len >= {MEAN_LEN_LO}"
    f" AND mean_token_len <= {MEAN_LEN_HI}"
    f" AND top_token_frac <= {TOP_TOKEN_FRAC_MAX}"
    f" AND dup_bigram_frac <= {DUP_BIGRAM_FRAC_MAX})")

_GOPHER_ORACLE = f"""
WITH {gopher_feat_ctes("documents")}
SELECT doc_id, lang, n_tokens,
       round(mean_token_len, 6) AS mean_token_len,
       round(top_token_frac, 6) AS top_token_frac,
       round(dup_bigram_frac, 6) AS dup_bigram_frac,
       COALESCE({GOPHER_PASS_COND}, FALSE) AS passes_gopher
FROM feat
"""


@query(
    "doc_quality_gopher",
    _GOPHER_ORACLE,
    doc="N3 Gopher-style quality gate (Rae et al. 2021 §A1.1 adapted): "
        "token-count bounds, mean token length, most-frequent-token "
        "fraction, duplicate-2-gram fraction → boolean keep/drop. "
        "Map-only (higher-order array functions per row, no shuffle); "
        "every gate ratio is exact integer arithmetic.",
    tags=("text", "quality", "north-star"),
)
def q_doc_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_features(load_table(spark, sf_dir, "documents"))


def gopher_features(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc Gopher quality features — a PURE PROJECTION (no
    shuffle). ``keep`` appends pass-through input columns so a caller
    that needs features + payload columns (pretrain_pipeline) avoids
    re-scanning the corpus and self-joining on doc_id to reattach
    them (round 11, guide §2.4)."""
    # All token features come from ONE struct expression: the
    # single-element transform(array(split(...)), t -> ...) binds the
    # token array once per row (Spark SQL has no LET; the naive form
    # re-split the text inside every lambda element — O(n²) splits,
    # 5.1s at sf0.1 → 0.4s). Counts use sort + run-length folds, not
    # distinct×filter rescans (HOFs are interpreted, so O(distinct·n)
    # is real). The struct is referenced by several output columns, so
    # CollapseProject keeps it materialized once instead of inlining.
    # Values are the exact same integers the oracle computes.
    feat = docs.select(
        "doc_id", "lang", *keep, F.length("text").alias("n_chars"),
        F.expr("""
          transform(array(split(text, ' ')), t -> named_struct(
            'n', size(t),
            'top_cnt', aggregate(array_sort(t),
              named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
              (acc, x) -> named_struct(
                'prev', x,
                'run', IF(x <=> acc.prev, acc.run + 1, 1),
                'best', GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1, 1))),
              acc -> acc.best),
            'n_distinct_bigrams', IF(size(t) >= 2,
              aggregate(array_sort(transform(sequence(1, size(t) - 1),
                  i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))),
                named_struct('prev', CAST(NULL AS STRING), 'cnt', 0),
                (acc, x) -> named_struct('prev', x,
                  'cnt', acc.cnt + IF(x <=> acc.prev, 0, 1)),
                acc -> acc.cnt), 0)
          ))[0]
        """).alias("ft"))
    n = F.col("ft.n")
    mean_len = (F.col("n_chars") - n + 1).cast("double") / n
    top_frac = F.col("ft.top_cnt").cast("double") / n
    dup_bigram = F.when(
        n >= 2,
        (n - 1 - F.col("ft.n_distinct_bigrams")).cast("double") / (n - 1)
    ).otherwise(F.lit(0.0))
    passes = (
        (n.cast("long") >= MIN_TOKENS)
        & (mean_len >= MEAN_LEN_LO) & (mean_len <= MEAN_LEN_HI)
        & (top_frac <= TOP_TOKEN_FRAC_MAX)
        & (dup_bigram <= DUP_BIGRAM_FRAC_MAX)
    )
    return feat.select(
        "doc_id", "lang", *keep,
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(top_frac, 6).alias("top_token_frac"),
        F.round(dup_bigram, 6).alias("dup_bigram_frac"),
        # coalesce: a NULL-text doc does NOT pass the gate (a nullable
        # boolean would also hit the None-vs-NaN pandas
        # canonicalization asymmetry between the engines)
        F.coalesce(passes, F.lit(False)).alias("passes_gopher"),
    )


_REPETITION_ORACLE = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), bg AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i + 1]) AS grams
  FROM tok WHERE len(t) >= 2
), scored AS (
  SELECT doc_id,
         CAST(len(grams) AS BIGINT) AS n_bigrams,
         list_max(list_transform(list_distinct(grams),
                  g -> len(list_filter(grams, x -> x = g)))) AS top_cnt,
         grams
  FROM bg
)
SELECT doc_id, n_bigrams,
       list_min(list_filter(list_distinct(grams),
                g -> len(list_filter(grams, x -> x = g)) = top_cnt))
         AS top_bigram,
       CAST(top_cnt AS BIGINT) AS top_bigram_count,
       round(CAST(top_cnt AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac
FROM scored
"""


@query(
    "doc_repetition_topngram",
    _REPETITION_ORACLE,
    doc="N3 repetition detection: the most-repeated 2-gram per document "
        "(ties broken to the lexicographically smallest) and the "
        "fraction of the document it covers — the top-n-gram-fraction "
        "repetition signal. Map-only per-row array compute; exact "
        "integer ratios.",
    tags=("text", "quality", "north-star"),
)
def q_doc_repetition_topngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = (
        docs
        .select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 2)
        .select("doc_id", F.expr(
            "transform(sequence(1, size(t) - 1), "
            "i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"
        ).alias("grams"))
    )
    # One sort + run-length fold finds the max count AND its gram: the
    # sorted scan visits grams in ascending order, and best_gram only
    # updates on a STRICTLY larger run, so ties resolve to the
    # lexicographically smallest gram — the oracle's array_min tie rule
    # — without the O(distinct·n) distinct×filter rescans.
    scored = grams.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_bigrams"),
        F.expr(
            "aggregate(array_sort(grams), "
            "  named_struct('prev', CAST(NULL AS STRING), 'run', 0, "
            "               'best', 0, 'best_gram', CAST(NULL AS STRING)), "
            "  (acc, x) -> named_struct("
            "    'prev', x, "
            "    'run', IF(x <=> acc.prev, acc.run + 1, 1), "
            "    'best', GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1, 1)), "
            "    'best_gram', IF(IF(x <=> acc.prev, acc.run + 1, 1) > acc.best, "
            "                    x, acc.best_gram)), "
            "  acc -> named_struct('cnt', acc.best, 'gram', acc.best_gram))"
        ).alias("top"),
    )
    return scored.select(
        "doc_id", "n_bigrams",
        F.col("top.gram").alias("top_bigram"),
        F.col("top.cnt").cast("long").alias("top_bigram_count"),
        F.round(F.col("top.cnt").cast("double") / F.col("n_bigrams"), 6)
        .alias("top_bigram_frac"),
    )


_CHUNKS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
       CAST(s AS INTEGER) AS chunk_start,
       CAST(least(s + {CHUNK_TOKENS - 1}, len(t)) - s + 1 AS BIGINT)
         AS n_chunk_tokens,
       array_to_string(list_slice(t, s, least(s + {CHUNK_TOKENS - 1}, len(t))), ' ')
         AS chunk_text
FROM tok, unnest(generate_series(1, len(t), {CHUNK_STRIDE})) AS u(s)
"""


@query(
    "doc_chunks",
    _CHUNKS_ORACLE,
    doc=f"N3 context-window chunking: overlapping {CHUNK_TOKENS}-token "
        f"windows at stride {CHUNK_STRIDE} per document — the pre-"
        "tokenization splitting step of an LLM data pipeline. Map-side "
        "explode (no shuffle); output rows ∝ input tokens / stride. "
        "Trailing windows may be short (they keep the stride grid).",
    tags=("text", "chunking", "north-star"),
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .select("doc_id", "t",
                F.explode(F.sequence(
                    F.lit(1), F.size("t"), F.lit(CHUNK_STRIDE))).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.col("s").cast("int").alias("chunk_start"),
            F.size(F.slice(F.col("t"), F.col("s"), CHUNK_TOKENS))
            .cast("long").alias("n_chunk_tokens"),
            F.array_join(F.slice(F.col("t"), F.col("s"), CHUNK_TOKENS), " ")
            .alias("chunk_text"),
        )
    )


_TFIDF_ORACLE = f"""
WITH tc AS (
  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf_count
  FROM documents, unnest(string_split(text, ' ')) AS u(tok)
  GROUP BY doc_id, tok
), stats AS (
  SELECT doc_id, term, tf_count,
         sum(tf_count) OVER (PARTITION BY doc_id) AS n_tok,
         count(*) OVER (PARTITION BY term) AS df
  FROM tc
), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf_count,
         CAST(tf_count * n_docs AS DOUBLE) / CAST(n_tok * df AS DOUBLE)
           AS rarity,
         round((CAST(tf_count AS DOUBLE) / CAST(n_tok AS DOUBLE))
               * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
  FROM stats, n
), ranked AS (
  SELECT *, CAST(row_number() OVER (
      PARTITION BY doc_id ORDER BY rarity DESC, term) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, term, tf_count, round(rarity, 6) AS rarity, tfidf, rank
FROM ranked WHERE rank <= {TFIDF_TOP_K}
"""


@query(
    "tfidf_top_terms",
    _TFIDF_ORACLE,
    doc=f"N3 keyword extraction: top-{TFIDF_TOP_K} terms per document. "
        "Ranked by the exact-rational rarity score tf·N/(n_tok·df) "
        "(bitwise-identical across engines — ln() would risk 1-ulp rank "
        "flips); classic ln-idf TF-IDF emitted alongside, rounded. "
        "Shuffle profile: explode → groupBy(doc, term) → window on doc "
        "and on term — three compact-key exchanges; N broadcasts.",
    tags=("text", "agg", "window", "north-star"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf_count"))
    )
    stats = tc.select(
        "doc_id", "term", "tf_count",
        F.sum("tf_count").over(Window.partitionBy("doc_id")).alias("n_tok"),
        F.count(F.lit(1)).over(Window.partitionBy("term")).alias("df"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = stats.join(F.broadcast(n_docs)).select(
        "doc_id", "term", "tf_count",
        ((F.col("tf_count") * F.col("n_docs")).cast("double")
         / (F.col("n_tok") * F.col("df")).cast("double")).alias("rarity"),
        F.round((F.col("tf_count").cast("double") / F.col("n_tok").cast("double"))
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("rarity"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf_count",
                F.round("rarity", 6).alias("rarity"), "tfidf", "rank")
    )
