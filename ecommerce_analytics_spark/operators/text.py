"""Text-analysis operators for training-data pipelines (SURVEY §2.10 N3).

Token statistics, quality scoring, language-ID heuristic, BPE-ish token
counting, and document fingerprinting over the ``documents`` table.
Everything is built-in column expressions (split / explode / higher-
order array functions) — JVM-side, whole-stage-codegen'd, no Python in
the hot path. Shuffle profile: token explode is map-side only; the only
shuffles are the final groupBys on compact keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query
from ecommerce_analytics_spark.sqlkit import ngram_positions

STOPWORDS = ("the", "a")

# language → marker token for the n-gram/keyword lang-ID heuristic.
# Ordered: ties resolve by this priority in both engines.
LANG_MARKERS = (("en", "the"), ("es", "a"), ("de", "data"),
                ("fr", "table"), ("zh", "spark"))

_TOKEN_STATS_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, source, text,
         string_split(text, ' ') AS tokens,
         CAST(length(text) AS BIGINT) AS n_chars_actual
  FROM documents
)
SELECT doc_id, lang, source,
       CAST(len(tokens) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(tokens)) AS BIGINT) AS n_distinct_tokens,
       round(CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens), 6)
         AS distinct_ratio,
       round(CAST(n_chars_actual - len(tokens) + 1 AS DOUBLE) / len(tokens), 6)
         AS avg_token_len,
       CAST(len(list_filter(tokens, t -> t IN ('the', 'a'))) AS BIGINT)
         AS n_stopwords
FROM tok
"""


@query(
    "documents_validation",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_text,
           CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_empty_text,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_lang,
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_source,
           CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_nchars,
           CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
             AS n_dup_doc_id,
           CAST(sum(CASE WHEN text IS NOT NULL AND text <> ''
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_text_valid
    FROM documents
    """,
    doc="The documents ingest gate — completes the four-family gate "
        "set (retail_validation / events_validation / "
        "embedding_validation): one map-side pass counts NULL/empty "
        "texts (the r6 short-doc crash class), NULL lang/source and "
        "bad n_chars metadata (the r7 metadata wave), and duplicate "
        "doc_id deliveries (at-least-once artifacts — a doc_id "
        "self-join fans quadratically on them; identity consumers "
        "gate with DISTINCT, certified in "
        "tests/test_hostile_dup_events.py).",
    tags=("validation", "text", "north-star"),
)
def q_documents_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def count_when(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        count_when(F.col("text").isNull()).alias("n_null_text"),
        count_when(F.col("text") == "").alias("n_empty_text"),
        count_when(F.col("lang").isNull()).alias("n_null_lang"),
        count_when(F.col("source").isNull()).alias("n_null_source"),
        count_when(F.col("n_chars").isNull()
                   | (F.col("n_chars") < 0)).alias("n_bad_nchars"),
        (F.count(F.lit(1)) - F.countDistinct("doc_id")).cast("long")
        .alias("n_dup_doc_id"),
        count_when(F.col("text").isNotNull()
                   & (F.col("text") != "")).alias("n_text_valid"),
    )


@query(
    "text_token_stats",
    _TOKEN_STATS_ORACLE,
    doc="N3 token statistics per document: counts, distinct ratio "
        "(type-token ratio), average token length, stopword count — all "
        "higher-order array functions, zero UDFs.",
    tags=("text", "north-star"),
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    n_distinct = F.size(F.array_distinct(tokens))
    return docs.select(
        "doc_id", "lang", "source",
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        F.round(n_distinct.cast("double") / n_tokens, 6)
        .alias("distinct_ratio"),
        F.round((F.length("text") - n_tokens + 1).cast("double") / n_tokens, 6)
        .alias("avg_token_len"),
        F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS))).cast("long")
        .alias("n_stopwords"),
    )


@query(
    "token_frequencies",
    """
    SELECT tok AS token, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM documents, unnest(string_split(text, ' ')) AS u(tok)
    GROUP BY tok
    ORDER BY n_occurrences DESC, token
    LIMIT 50
    """,
    doc="N3 corpus token frequencies: explode + groupBy + top-k. The "
        "explode is map-local; only compact (token, partial-count) rows "
        "shuffle — the shape that survives a 100 TB corpus.",
    tags=("text", "agg", "north-star"),
)
def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"),
             F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(50)
    )


_QUALITY_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tokens FROM documents
), feat AS (
  SELECT doc_id, lang,
         CAST(len(tokens) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens) AS distinct_ratio,
         CAST(len(list_filter(tokens, t -> t IN ('the', 'a'))) AS DOUBLE)
           / len(tokens) AS stopword_ratio
  FROM tok
)
SELECT doc_id, lang, n_tokens,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(least(1.0, 0.5 * least(1.0, n_tokens / 100.0)
                        + 0.3 * (1 - stopword_ratio)
                        + 0.2 * distinct_ratio), 6) AS quality_score,
       COALESCE(n_tokens >= 20 AND stopword_ratio < 0.5, FALSE)
         AS passes_filter
FROM feat
"""


@query(
    "text_quality_score",
    _QUALITY_ORACLE,
    doc="N3 quality scoring: length/stopword/diversity features combined "
        "into a capped score + a boolean keep/drop filter — the standard "
        "pretraining-corpus quality gate, fully declarative.",
    tags=("text", "north-star"),
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens).cast("long")
    distinct_ratio = (F.size(F.array_distinct(tokens)).cast("double")
                      / F.size(tokens))
    stopword_ratio = (
        F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS))).cast("double")
        / F.size(tokens))
    quality = F.least(
        F.lit(1.0),
        0.5 * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + 0.3 * (1 - stopword_ratio)
        + 0.2 * distinct_ratio)
    return docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality_score"),
        # coalesce: a NULL-text doc does NOT pass the gate (and a
        # nullable boolean would hit the None-vs-NaN pandas
        # canonicalization asymmetry between the engines)
        F.coalesce((n_tokens >= 20) & (stopword_ratio < 0.5),
                   F.lit(False)).alias("passes_filter"),
    )


def _lang_counts_sql() -> str:
    return ",\n".join(
        f"         CAST(len(list_filter(tokens, t -> t = '{marker}')) AS BIGINT)"
        f" AS c_{lang}" for lang, marker in LANG_MARKERS)


def _lang_case_sql() -> str:
    clauses = []
    langs = [lang for lang, _ in LANG_MARKERS]
    for i, lang in enumerate(langs):
        others = [f"c_{lang} >= c_{other}" for other in langs[i + 1:]]
        cond = " AND ".join(others) if others else "TRUE"
        clauses.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(clauses[:-1]) + f" ELSE '{langs[-1]}' END"


_LANG_ID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tokens FROM documents
), counts AS (
  SELECT doc_id, lang,
{_lang_counts_sql()}
  FROM tok
)
SELECT doc_id, lang AS actual_lang,
       {_lang_case_sql()} AS predicted_lang,
       coalesce({_lang_case_sql()} = lang, FALSE) AS is_match
FROM counts
"""


@query(
    "lang_id_heuristic",
    _LANG_ID_ORACLE,
    doc="N3 language identification: marker-token frequency argmax with a "
        "fixed priority tie-break (the synthetic corpus shares one "
        "vocabulary, so accuracy is chance — the operator contract is the "
        "deterministic argmax pipeline, which on real text uses per-lang "
        "stopword lists the same way).",
    tags=("text", "north-star"),
)
def q_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    def count_marker(marker: str):
        # NB: a (t, i) lambda would bind i to the array index — keep 1-arg
        return F.size(F.filter(tokens, lambda t: t == F.lit(marker)))

    counted = docs.select(
        "doc_id", F.col("lang").alias("actual_lang"),
        *[count_marker(marker).cast("long").alias(f"c_{lang}")
          for lang, marker in LANG_MARKERS])
    langs = [lang for lang, _ in LANG_MARKERS]
    pred = None
    for i, lang in enumerate(langs[:-1]):
        cond = F.lit(True)
        for other in langs[i + 1:]:
            cond = cond & (F.col(f"c_{lang}") >= F.col(f"c_{other}"))
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(langs[-1])
    return counted.select(
        "doc_id", "actual_lang", pred.alias("predicted_lang"),
        # coalesce FALSE: an unlabeled (NULL-lang) doc is not a match —
        # and a NULL boolean round-trips as None here vs NaN from
        # SUM-based engines (hostile doc-metadata probe, round 7)
        F.coalesce(pred == F.col("actual_lang"), F.lit(False))
        .alias("is_match"),
    )


@query(
    "token_count_bpe_estimate",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS n_regex_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_estimate
    FROM documents
    """,
    doc="N3 token counting three ways: whitespace, BPE-ish regex "
        "(word-or-symbol pieces), and the chars/4 estimator — the "
        "budget-planning primitives for a 100 TB tokenization pass.",
    tags=("text", "north-star"),
)
def q_token_count_bpe_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z0-9]+|[^a-z0-9 ]"))
        .cast("long").alias("n_regex_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_bpe_estimate"),
    )


@query(
    "lang_source_stats",
    """
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="N3 corpus composition: docs/chars per (lang, source) — the "
        "mixture-weights table every pretraining data pipeline maintains.",
    tags=("text", "agg", "north-star"),
)
def q_lang_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6)
        .alias("avg_chars"),
    )


PMI_MIN_COUNT = 5       # bigram support floor
PMI_TOP_K = 50
PMI_FIX = 1_000_000     # 1e-6 fixed point for the ln() combination


@query(
    "bigram_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bi AS (
      SELECT unnest(list_transform(
               generate_series(1, len(t) - 1),
               i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS b
      FROM toks
    ), bc AS (
      SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS c_ab
      FROM bi GROUP BY b.w1, b.w2
    ), uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM toks, unnest(t) AS u(tok) GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_uni,
             (SELECT CAST(sum(c_ab) AS BIGINT) FROM bc) AS n_bi
      FROM uni
    ), scored AS (
      SELECT bc.w1, bc.w2, bc.c_ab, a.c AS c_a, b.c AS c_b,
             CAST(round((ln(CAST(bc.c_ab AS DOUBLE))
                         + 2 * ln(CAST(tot.n_uni AS DOUBLE))
                         - ln(CAST(tot.n_bi AS DOUBLE))
                         - ln(CAST(a.c AS DOUBLE))
                         - ln(CAST(b.c AS DOUBLE))) * {PMI_FIX})
                  AS BIGINT) AS pmi_fix
      FROM bc
      JOIN uni a ON a.tok = bc.w1
      JOIN uni b ON b.tok = bc.w2
      CROSS JOIN tot
      WHERE bc.c_ab >= {PMI_MIN_COUNT}
    )
    SELECT w1, w2, c_ab, c_a, c_b,
           CAST(pmi_fix AS DOUBLE) / {PMI_FIX} AS pmi
    FROM scored
    ORDER BY pmi_fix DESC, w1, w2
    LIMIT {PMI_TOP_K}
    """,
    doc="Collocation mining: top-50 bigrams by pointwise mutual "
        "information, PMI = ln(p(ab) / (p(a)p(b))) over the corpus's "
        "adjacent-token pairs — the phrase detector (word2vec-phrases "
        "/ gensim recipe) a pretraining tokenizer pipeline runs "
        "before vocab induction. One explode pass each for bigram "
        "and unigram counts (compact-key shuffles), two vocab joins, "
        "scalar totals attached in-plan; support floor of "
        f"{PMI_MIN_COUNT} kills the hapax noise PMI is notorious "
        "for. The ln() combination is snapped to 1e-6 fixed point "
        "(the decontam.py LOG_FIX recipe) so ranking and emitted "
        "scores are engine-exact; ties broken by (w1, w2) for a "
        "deterministic top-k.",
    tags=("text", "north-star", "scale"),
)
def q_bigram_pmi_collocations(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("t"))
    bi = toks.select(F.explode(F.expr(
        f"transform({ngram_positions('t', 2)}, "
        "i -> named_struct('w1', element_at(t, i), "
        "'w2', element_at(t, i + 1)))")).alias("b"))
    # both count tables are referenced three times each (grand totals,
    # the two unigram probes / the scored filter) — persist the narrow
    # vocab-sized aggregates so the corpus explode runs once per table
    # (r11 scan census: 5 surviving documents scans, now 2)
    bc = (bi.select("b.w1", "b.w2")
          .groupBy("w1", "w2")
          .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
          .persist())
    uni = (toks.select(F.explode("t").alias("tok"))
           .groupBy("tok")
           .agg(F.count(F.lit(1)).cast("long").alias("c"))
           .persist())
    tot = (uni.agg(F.sum("c").cast("long").alias("n_uni"))
           .crossJoin(F.broadcast(
               bc.agg(F.sum("c_ab").cast("long").alias("n_bi")))))

    a, b = uni.alias("a"), uni.alias("b")
    scored = (bc.filter(F.col("c_ab") >= PMI_MIN_COUNT)
              .join(a, F.col("a.tok") == F.col("w1"))
              .join(b, F.col("b.tok") == F.col("w2"))
              .crossJoin(F.broadcast(tot))
              .select(
                  "w1", "w2", "c_ab",
                  F.col("a.c").alias("c_a"),
                  F.col("b.c").alias("c_b"),
                  F.round((F.log(F.col("c_ab").cast("double"))
                           + 2 * F.log(F.col("n_uni").cast("double"))
                           - F.log(F.col("n_bi").cast("double"))
                           - F.log(F.col("a.c").cast("double"))
                           - F.log(F.col("b.c").cast("double")))
                          * PMI_FIX).cast("bigint").alias("pmi_fix")))
    return (scored
            .orderBy(F.desc("pmi_fix"), "w1", "w2")
            .limit(PMI_TOP_K)
            .select("w1", "w2", "c_ab", "c_a", "c_b",
                    (F.col("pmi_fix").cast("double") / PMI_FIX)
                    .alias("pmi")))


KL_FIX = 1_000_000_000

_KL_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
), by_src AS (
  SELECT source, tok, CAST(count(*) AS HUGEINT) AS c
  FROM toks GROUP BY source, tok
), src_tot AS (
  SELECT source, CAST(sum(c) AS HUGEINT) AS ns,
         CAST(count(*) AS BIGINT) AS vocab
  FROM by_src GROUP BY source
), corpus AS (
  SELECT tok, CAST(sum(c) AS HUGEINT) AS cc FROM by_src GROUP BY tok
), corpus_tot AS (
  SELECT CAST(sum(cc) AS HUGEINT) AS nc FROM corpus
), terms AS (
  SELECT s.source, t.ns, t.vocab,
         CAST(round((CAST(s.c AS DOUBLE) / CAST(t.ns AS DOUBLE))
              * log2((CAST(s.c AS DOUBLE) / CAST(t.ns AS DOUBLE))
                     / (CAST(g.cc AS DOUBLE) / CAST(ct.nc AS DOUBLE)))
              * {KL_FIX}) AS HUGEINT) AS term_fix
  FROM by_src s
  JOIN src_tot t ON t.source = s.source
  JOIN corpus g ON g.tok = s.tok
  CROSS JOIN corpus_tot ct
)
SELECT source, CAST(ns AS BIGINT) AS n_tokens, vocab,
       round(CAST(sum(term_fix) AS DOUBLE) / {KL_FIX}, 6) AS kl_bits
FROM terms GROUP BY source, ns, vocab
"""


@query(
    "corpus_kl_divergence",
    _KL_ORACLE,
    doc="Distribution-shift audit per source: KL(P_source || "
        "P_corpus) in bits between each source's unigram LM and the "
        "whole-corpus unigram LM — the drift score a training "
        "pipeline uses to spot a source whose token mix diverged "
        "(no smoothing needed: every source token is in the corpus "
        "by construction, so q > 0 always). Each p*log2(p/q) term "
        "quantizes to 1e-9 fixed point before the exact integer sum "
        "(the entropy/PMI precedent). Shuffle profile: one explode "
        "(map-side), counting aggregation on (source, token), the "
        "corpus LM derived from THAT aggregate (never a second scan "
        "of the raw text), then an equi-join back on token.",
    tags=("northstar", "text", "stats", "agg"),
)
def q_corpus_kl_divergence(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    _DEC = "decimal(38,0)"
    docs = load_table(spark, sf_dir, "documents")
    # (source, tok, c) feeds four statistic subtrees (src totals, the
    # corpus LM, its grand total, and the per-term join) — without a
    # cut each re-scans + re-explodes the documents fact (4 surviving
    # parquet scans). Lazy persist (the r11 scan-discipline recipe for
    # corpus-sized narrow frames): plan-only callers execute nothing,
    # and the fact is read once per run.
    by_src = (docs
              .select("source",
                      F.explode(F.split(F.col("text"), " ")).alias("tok"))
              .groupBy("source", "tok")
              .agg(F.count(F.lit(1)).cast(_DEC).alias("c"))
              .persist())
    src_tot = (by_src.groupBy("source")
               .agg(F.sum("c").alias("ns"),
                    F.count(F.lit(1)).cast("long").alias("vocab")))
    corpus = by_src.groupBy("tok").agg(F.sum("c").alias("cc"))
    corpus_tot = corpus.groupBy().agg(F.sum("cc").alias("nc"))
    p = F.col("c").cast("double") / F.col("ns").cast("double")
    q = F.col("cc").cast("double") / F.col("nc").cast("double")
    terms = (by_src
             .join(F.broadcast(src_tot), "source")
             .join(corpus, "tok")
             .join(F.broadcast(corpus_tot))
             .select("source", "ns", "vocab",
                     F.round(p * F.log2(p / q) * KL_FIX).cast(_DEC)
                     .alias("term_fix")))
    return (terms.groupBy("source", "ns", "vocab")
            .agg(F.round(F.sum("term_fix").cast("double") / KL_FIX, 6)
                 .alias("kl_bits"))
            .select("source", F.col("ns").cast("long").alias("n_tokens"),
                    "vocab", "kl_bits"))


BPE_TOP_K = 20

_BPE_ORACLE = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
), pairs AS (
  SELECT substr(t, CAST(g.i AS INTEGER), 2) AS pair
  FROM tok, unnest(generate_series(1, length(t) - 1)) AS g(i)
  WHERE length(t) >= 2
), counted AS (
  SELECT pair, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY pair
), ranked AS (
  SELECT pair, n,
         CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT)
           AS rank
  FROM counted
)
SELECT pair, n, rank FROM ranked WHERE rank <= {BPE_TOP_K}
"""


@query(
    "bpe_merge_candidates",
    _BPE_ORACLE,
    doc=f"Tokenizer-training primitive: the top-{BPE_TOP_K} adjacent "
        f"character pairs by corpus frequency — exactly the merge-"
        f"candidate table the first BPE training iteration maximizes "
        f"over (later iterations re-run the same count after applying "
        f"the merge; the counting pass IS the distributed work). "
        f"Exact integer counts, ties broken lexicographically. "
        f"Shuffle profile: the char-pair explode is map-side, the "
        f"count is one compact-key aggregation, and the top-K is "
        f"TakeOrderedAndProject over the counted pairs — at 100 TB "
        f"the pair vocabulary (bounded by charset^2 per length-2 "
        f"window) stays tiny regardless of corpus size.",
    tags=("northstar", "text", "agg"),
)
def q_bpe_merge_candidates(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (docs.select(F.explode(F.split(F.col("text"), " "))
                       .alias("t"))
           .filter(F.length("t") >= 2))
    pairs = tok.select(
        F.explode(F.expr("transform(sequence(1, length(t) - 1), "
                         "i -> substring(t, i, 2))")).alias("pair"))
    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    top = counted.orderBy(F.desc("n"), F.asc("pair")).limit(BPE_TOP_K)
    w = Window.orderBy(F.desc("n"), F.asc("pair"))
    return (top.withColumn("rank",
                           F.row_number().over(w).cast("long"))
            .select("pair", "n", "rank"))
