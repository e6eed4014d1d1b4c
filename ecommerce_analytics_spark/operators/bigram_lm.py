"""Bigram language-model document scoring (KenLM-style quality filter).

``doc_unigram_logprob`` (decontam.py) is the cheapest perplexity
proxy; real pretraining pipelines (CCNet, Gopher, RefinedWeb) filter
on an n-gram LM. This is the order-2 member: every document scored by
the mean negative log-probability of its token bigrams under the
corpus's own interpolated bigram model,

    P(w2 | w1) = 3/4 * c12 / c1h  +  1/4 * (c2 + 1) / (N + V)

(Jelinek-Mercer interpolation of the ML bigram with the add-1
unigram; c12 = bigram count, c1h = count of w1 as a bigram history,
c2 = unigram count of w2, N = total tokens, V = vocab size). With
lambda = 3/4 the probability is a single ratio of exact integers:

    P = (3 * c12 * (N + V) + c1h * (c2 + 1)) / (4 * c1h * (N + V))

so both engines feed ln() the identical IEEE double (one division of
two exact BIGINTs), and the per-bigram log is snapped to 1e-9 fixed
point before the associative integer per-doc sum — plan shape and
engine cannot change a document's score (the doc_unigram_logprob /
DSIR discipline, decontam.py:24-30). Self-scoring means every (w1,w2)
the scorer meets exists in the counts (c12 >= 1, c1h >= 1): no OOV
branch.

Integer headroom: num <= 3 * c12 * (N+V) + c1h * (c2+1) — at sf1-ish
corpora (~3M tokens) that is ~3 * 3e6 * 6e6 ~ 5e13, comfortably
BIGINT. At a 100 TB corpus (N ~ 1e13) the exact-integer product
overflows; the production swap is the same formula over DOUBLE terms
(or DECIMAL(38)) — the snapping tolerance then absorbs the <1-ulp
division/multiply divergence. Documented here because the certified
form is the exact-integer one.

Scale shape: ONE bigram explode over the corpus; c12 via a compact
(w1, w2) shuffle; c1h and the unigram table derive from c12 / the
token stream by map-side-combined aggregations; the score table joins
the scoring stream on (w1, w2) — at 100 TB that table is far beyond
broadcast range, so this is an honest co-partitioned equi-join, then
one doc_id aggregate. No all-pairs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

LOG_FIX = 1_000_000_000  # 1e-9 fixed point for ln() (decontam.py idiom)


_BIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c2
  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
), consts AS (
  SELECT CAST(sum(c2) AS BIGINT) AS n_total,
         CAST(count(*) AS BIGINT) AS v_size
  FROM uni
), big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i])) AS w1,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> t[i + 1])) AS w2
  FROM toks WHERE len(t) >= 2
), c12 AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
  FROM big GROUP BY w1, w2
), hist AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS c1h FROM c12 GROUP BY w1
), score AS (
  SELECT c12.w1, c12.w2,
         CAST(round(-ln(
           CAST(3 * c12.c * (consts.n_total + consts.v_size)
                + hist.c1h * (uni.c2 + 1) AS DOUBLE)
           / CAST(4 * hist.c1h * (consts.n_total + consts.v_size)
                  AS DOUBLE)) * {LOG_FIX}) AS BIGINT) AS neg_log_fix
  FROM c12
  JOIN hist ON hist.w1 = c12.w1
  JOIN uni ON uni.tok = c12.w2
  CROSS JOIN consts
)
SELECT b.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(s.neg_log_fix) AS DOUBLE)
             / {LOG_FIX} / count(*), 6) AS bigram_nll
FROM big b
JOIN score s ON s.w1 = b.w1 AND s.w2 = b.w2
GROUP BY b.doc_id
"""


@query(
    "doc_bigram_logprob",
    _BIGRAM_ORACLE,
    doc="KenLM-style quality score, order 2: mean negative "
        "log-probability of each document's bigrams under the "
        "corpus's own Jelinek-Mercer-interpolated bigram LM "
        "(lambda=3/4 bigram ML + 1/4 add-1 unigram). The lambda "
        "choice makes every probability a single ratio of exact "
        "BIGINTs, so both engines feed ln() the identical double; "
        "per-bigram logs snap to 1e-9 fixed point before the "
        "associative per-doc integer sum. ONE bigram explode, "
        "compact (w1,w2)/w1/tok count shuffles, score-table "
        "equi-join (beyond broadcast at 100 TB — honest "
        "co-partitioned join), one doc aggregate.",
    tags=("text", "quality", "ml", "north-star"),
)
def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))

    tok_stream = toks.select(F.explode("t").alias("tok"))
    # the unigram LM feeds both the smoothing constants and the score
    # join; the bigram counts feed both the backoff histogram and the
    # score itself — persist the two narrow count tables (the
    # materialize-the-LM-not-the-corpus shape) so each corpus explode
    # survives once (r11 scan census: 5 surviving scans, now 3 — the
    # two LM builds plus the per-doc scoring join)
    uni = (tok_stream.groupBy("tok")
           .agg(F.count(F.lit(1)).alias("c2")).persist())
    consts = uni.agg(F.sum("c2").alias("n_total"),
                     F.count(F.lit(1)).alias("v_size"))

    big = (toks.filter(F.size("t") >= 2)
           .select("doc_id", F.expr(
               "explode(transform(sequence(1, size(t) - 1), "
               "i -> struct(element_at(t, i) AS w1, "
               "element_at(t, i + 1) AS w2)))").alias("bg"))
           .select("doc_id", "bg.w1", "bg.w2"))

    c12 = (big.groupBy("w1", "w2")
           .agg(F.count(F.lit(1)).alias("c")).persist())
    hist = c12.groupBy("w1").agg(F.sum("c").alias("c1h"))

    nv = F.col("n_total") + F.col("v_size")
    score = (
        c12.join(hist, "w1")
        .join(uni, c12.w2 == uni.tok)
        .crossJoin(F.broadcast(consts))
        .select(
            "w1", "w2",
            F.round(-F.log(
                (3 * F.col("c") * nv
                 + F.col("c1h") * (F.col("c2") + 1)).cast("double")
                / (4 * F.col("c1h") * nv).cast("double")) * LOG_FIX)
            .cast("bigint").alias("neg_log_fix")))

    return (
        big.join(score, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"),
             F.round(F.sum("neg_log_fix").cast("double")
                     / LOG_FIX / F.count(F.lit(1)), 6)
             .alias("bigram_nll"))
    )
