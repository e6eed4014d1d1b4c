"""Benchmark decontamination + unigram-LM scoring (N3 extensions).

Two corpus-wide operators every pretraining pipeline runs that the
repo lacked:

- ``decontam_ngram_overlap`` — eval-set decontamination (the
  GPT-3/Gopher appendix procedure): a training document is
  contaminated if it shares any order-``DECONTAM_N`` token n-gram
  with a held-out benchmark set. Shape: both sides explode their
  n-grams ONCE, hash each to a full 128-bit md5 (engine-portable and
  collision-free vs the raw-string oracle), distinct per side, then a
  broadcast equi-join of train-grams against the (small) eval-gram
  set and a groupBy per train doc. Never train×eval; the eval side of
  the join is the benchmark suite — a few MB at any corpus scale, so
  the join is a broadcast map-side probe and the train side shuffles
  only (doc, matched-gram) hits.
- ``doc_unigram_logprob`` — perplexity-proxy quality score: mean
  negative log-probability of the document's tokens under the
  corpus's own Laplace-smoothed unigram LM (the cheap first-pass
  scorer before a real LM scores the survivors). Two passes: vocab
  counts (one compact-key shuffle), then a token→logprob join and a
  per-doc aggregate.

Cross-engine determinism note for the LM score: ln() is transcendental
and double sums are order-dependent, so the per-token log is snapped
to 1e-9 FIXED POINT (``round(ln(p)*1e9)`` as BIGINT) before summing —
integer sums are associative, so plan shape and engine cannot change
the per-doc total (same discipline as the integer-cents money sums in
numerics.py). Both engines evaluate ln() on identical doubles (the
count ratios are exact), so the snapped value is identical.

The synthetic corpus has no cross-document n-gram overlap, so the
decontamination query injects perturbed eval-doc copies into the
train side (prefix-trimmed and verbatim — the dedup-family pattern,
dedup.py) to create real positives AND negatives for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query
from ecommerce_analytics_spark.sqlkit import ngram_positions

DECONTAM_N = 5     # n-gram order (docs are 10-99 tokens)
EVAL_MOD = 97      # doc_id % EVAL_MOD == 0 → held-out benchmark set
LOG_FIX = 1_000_000_000  # 1e-9 fixed point for ln()


def _ngram_hashes(docs: DataFrame, n: int = DECONTAM_N) -> DataFrame:
    """(doc_id, g): distinct FULL-md5 hashes of order-n token n-grams.

    The join key is the whole 128-bit digest (hex string), not a
    truncated 64-bit prefix: the DuckDB oracle joins raw n-gram
    strings, so the Spark side must be collision-free to match —
    at 2^-128 a full-md5 collision is never the explanation for a
    diverging n_shared_ngrams count. Docs shorter than ``n`` tokens
    are filtered out BEFORE sequence(): Spark's sequence(1, 0) is
    descending ([1, 0]) and would fabricate bogus slice() grams where
    DuckDB's generate_series yields none.
    """
    grams = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= n)
        .select("doc_id", F.expr(
            f"explode(transform({ngram_positions('toks', n)}, "
            f"i -> md5(concat_ws(' ', slice(toks, i, {n})))))").alias("g"))
    )
    return grams.distinct()


_DECONTAM_ORACLE = f"""
WITH eval_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_MOD} = 0
), train_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % {EVAL_MOD} <> 0
  UNION ALL
  SELECT doc_id + 60000000 AS doc_id,
         substr(text, instr(text, ' ') + 1) AS text
  FROM documents WHERE doc_id % ({EVAL_MOD} * 3) = 0
  UNION ALL
  SELECT doc_id + 70000000 AS doc_id, text
  FROM documents WHERE doc_id % ({EVAL_MOD} * 4) = 0
), eval_grams AS (
  SELECT DISTINCT sh AS g FROM (
    SELECT unnest(list_transform(
             generate_series(1, len(t) - {DECONTAM_N - 1}),
             i -> array_to_string(t[i:i+{DECONTAM_N - 1}], ' '))) AS sh
    FROM (SELECT string_split(text, ' ') AS t FROM eval_docs)
  )
), train_grams AS (
  SELECT DISTINCT doc_id, sh AS g FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(t) - {DECONTAM_N - 1}),
             i -> array_to_string(t[i:i+{DECONTAM_N - 1}], ' '))) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM train_docs)
  )
), hits AS (
  SELECT tg.doc_id, count(*) AS n_shared_ngrams
  FROM train_grams tg JOIN eval_grams eg ON tg.g = eg.g
  GROUP BY tg.doc_id
)
SELECT d.doc_id,
       coalesce(h.n_shared_ngrams, 0) AS n_shared_ngrams,
       coalesce(h.n_shared_ngrams, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM train_docs) d
LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


@query(
    "decontam_ngram_overlap",
    _DECONTAM_ORACLE,
    doc=f"Eval-set decontamination (GPT-3/Gopher procedure): a train "
        f"doc is contaminated if it shares any {DECONTAM_N}-gram with "
        f"the held-out benchmark set (doc_id%{EVAL_MOD}). N-grams "
        f"hashed to full 128-bit md5, distinct per side, eval side "
        f"broadcast into an equi-join probe — never train×eval; at "
        f"100 TB the benchmark suite stays a few MB so the train scan "
        f"is one pass + one (doc, hit) shuffle. Injected perturbed "
        f"eval copies (prefix-trimmed %{EVAL_MOD * 3}, verbatim "
        f"%{EVAL_MOD * 4}) provide real positives; output = per train "
        f"doc, shared-distinct-n-gram count and the contaminated flag.",
    tags=("text", "dedup", "north-star"),
)
def q_decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    near = (docs.filter(F.col("doc_id") % (EVAL_MOD * 3) == 0)
            .select((F.col("doc_id") + 60000000).alias("doc_id"),
                    F.expr("substr(text, instr(text, ' ') + 1)")
                    .alias("text")))
    exact = (docs.filter(F.col("doc_id") % (EVAL_MOD * 4) == 0)
             .select((F.col("doc_id") + 70000000).alias("doc_id"), "text"))
    n_part = spark.sparkContext.defaultParallelism
    train_docs = (docs.filter(F.col("doc_id") % EVAL_MOD != 0)
                  .unionAll(near).unionAll(exact)
                  .repartition(n_part, "doc_id"))

    eval_grams = _ngram_hashes(eval_docs).select("g").distinct()
    train_grams = _ngram_hashes(train_docs)
    # benchmark side is small by construction at every scale → AQE
    # broadcasts the probe set (no hint: the runtime size decides,
    # same guard discipline as dedup._drop_hot)
    hits = (train_grams.join(eval_grams, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared_ngrams")))
    return (
        train_docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_ngrams", F.lit(0).cast("bigint"))
            .alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0)
            .alias("contaminated"))
    )


_UNIGRAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok, count(*) AS c FROM tok GROUP BY tok
), consts AS (
  SELECT sum(c) AS n_total, count(*) AS v_size FROM vocab
), logfix AS (
  SELECT v.tok,
         CAST(round(ln(CAST(v.c + 1 AS DOUBLE)
                       / (consts.n_total + consts.v_size))
                    * -{LOG_FIX}) AS BIGINT) AS neg_log_fix
  FROM vocab v CROSS JOIN consts
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(l.neg_log_fix) AS DOUBLE)
             / count(*) / {LOG_FIX}, 6) AS avg_neg_logprob
FROM tok t JOIN logfix l ON t.tok = l.tok
GROUP BY t.doc_id
"""


@query(
    "doc_unigram_logprob",
    _UNIGRAM_ORACLE,
    doc="Perplexity-proxy quality score: mean negative log-probability "
        "per token under the corpus's Laplace-smoothed unigram LM — "
        "the cheap first-pass scorer before an actual LM scores the "
        "survivors. Two passes: vocab counts (compact-key shuffle), "
        "token→score join, per-doc aggregate. ln() snapped to 1e-9 "
        "fixed point BEFORE summing so the per-doc total is an "
        "associative integer sum — plan shape and engine cannot "
        "change it (integer-cents discipline, numerics.py). At 100 TB "
        "the vocab table is the join's build side (tens of MB after "
        "mincount pruning) and the token stream never re-shuffles.",
    tags=("text", "quality", "north-star"),
)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    consts = vocab.agg(F.sum("c").alias("n_total"),
                       F.count(F.lit(1)).alias("v_size"))
    logfix = vocab.crossJoin(F.broadcast(consts)).select(
        "tok",
        F.round(-F.log((F.col("c").cast("double") + 1)
                       / (F.col("n_total") + F.col("v_size"))) * LOG_FIX)
        .cast("bigint").alias("neg_log_fix"))
    return (
        tok.join(logfix, "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.round(F.sum("neg_log_fix").cast("double")
                     / F.count(F.lit(1)) / F.lit(LOG_FIX), 6)
             .alias("avg_neg_logprob"))
    )


DSIR_TARGET = "src0"  # the "domain" corpus the sampler up-weights

_DSIR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
  FROM documents
), gvocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cg FROM tok GROUP BY tok
), tvocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS ct
  FROM tok WHERE source = '{DSIR_TARGET}' GROUP BY tok
), consts AS (
  SELECT (SELECT sum(cg) FROM gvocab) AS ng,
         (SELECT count(*) FROM gvocab) AS v,
         (SELECT coalesce(sum(ct), 0) FROM tvocab) AS nt
), logfix AS (
  SELECT g.tok,
         CAST(round((ln(CAST(coalesce(t.ct, 0) + 1 AS DOUBLE)
                        / CAST(c.nt + c.v AS DOUBLE))
                     - ln(CAST(g.cg AS DOUBLE) / CAST(c.ng AS DOUBLE)))
                    * {LOG_FIX}) AS BIGINT) AS ratio_fix
  FROM gvocab g
  LEFT JOIN tvocab t ON t.tok = g.tok
  CROSS JOIN consts c
)
SELECT k.doc_id, k.source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(l.ratio_fix) AS DOUBLE) / {LOG_FIX}, 6)
         AS log_importance,
       round(CAST(sum(l.ratio_fix) AS DOUBLE) / count(*)
             / {LOG_FIX}, 6) AS per_token_logratio
FROM tok k JOIN logfix l ON l.tok = k.tok
GROUP BY k.doc_id, k.source
"""


@query(
    "dsir_importance_weights",
    _DSIR_ORACLE,
    doc=f"DSIR-style importance weights (Xie et al. 2023, data "
        f"selection via importance resampling): per document, the "
        f"log-likelihood ratio between the TARGET domain's "
        f"Laplace-smoothed unigram LM (source='{DSIR_TARGET}') and "
        f"the general corpus LM — the score a domain-upsampling "
        f"pipeline feeds into weighted/temperature resampling "
        f"(corpus_resample, weighted_sample_per_lang). Per-token "
        f"ln-ratio snaps to 1e-9 fixed point ONCE per vocabulary "
        f"entry; each document then sums exact integers through the "
        f"token-keyed join (tf-weighting falls out of the instance "
        f"join). Both LMs derive from the same single (token) "
        f"aggregate family; the token stream shuffles once.",
    tags=("northstar", "text", "sampling", "agg"),
)
def q_dsir_importance_weights(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "source",
        F.explode(F.split(F.col("text"), " ")).alias("tok"))
    # one vocabulary pass: per-(tok, source) counts persisted, both
    # LMs derived from the aggregate — the former twin groupBys each
    # re-scanned + re-exploded documents (r11 scan census: 5 surviving
    # scans; now 2 — the vocab build and the per-doc scoring join,
    # which genuinely need separate passes). Integer count sums are
    # exact, and (tok, source = target) holds one row per tok, so both
    # derivations are value-identical to the direct groupBys.
    svocab = (tok.groupBy("tok", "source")
              .agg(F.count(F.lit(1)).alias("cs"))
              .persist())
    gvocab = svocab.groupBy("tok").agg(
        F.sum("cs").cast("long").alias("cg"))
    tvocab = (svocab.filter(F.col("source") == DSIR_TARGET)
              .select("tok", F.col("cs").cast("long").alias("ct")))
    consts = (gvocab.groupBy()
              .agg(F.sum("cg").alias("ng"),
                   F.count(F.lit(1)).alias("v"))
              .crossJoin(F.broadcast(
                  tvocab.groupBy().agg(
                      F.coalesce(F.sum("ct"), F.lit(0)).alias("nt")))))
    logfix = (gvocab
              .join(tvocab, "tok", "left")
              .join(F.broadcast(consts))
              .select("tok",
                      F.round((F.log((F.coalesce(F.col("ct"), F.lit(0))
                                      + 1).cast("double")
                                     / (F.col("nt") + F.col("v"))
                                     .cast("double"))
                               - F.log(F.col("cg").cast("double")
                                       / F.col("ng").cast("double")))
                              * LOG_FIX).cast("long")
                      .alias("ratio_fix")))
    return (tok.join(logfix, "tok")
            .groupBy("doc_id", "source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.round(F.sum("ratio_fix").cast("double") / LOG_FIX, 6)
                 .alias("log_importance"),
                 F.round(F.sum("ratio_fix").cast("double")
                         / F.count(F.lit(1)) / LOG_FIX, 6)
                 .alias("per_token_logratio")))
