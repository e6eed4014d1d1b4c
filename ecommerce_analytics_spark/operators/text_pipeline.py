"""Additional corpus-pipeline operators (N3): PII scrubbing and
deterministic stratified sampling — standard passes in a pretraining
data pipeline, both pure column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

# emails + international-ish phone numbers; identical RE2/Java semantics
PII_EMAIL = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_PHONE = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"

_PII_ORACLE = f"""
WITH seeded AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact user' || CAST(doc_id AS STRING)
                   || '@example.com or +12-345-6789 now'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id, lang,
       CAST(length(regexp_replace(regexp_replace(text,
              '{PII_EMAIL}', '<EMAIL>', 'g'),
              '{PII_PHONE}', '<PHONE>', 'g')) AS BIGINT) AS scrubbed_len,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
         AS n_phones,
       (len(regexp_extract_all(text, '{PII_EMAIL}'))
        + len(regexp_extract_all(text, '{PII_PHONE}')) > 0) AS had_pii
FROM seeded
"""


@query(
    "pii_scrub",
    _PII_ORACLE,
    doc="N3 PII scrubbing: email/phone patterns replaced with typed "
        "placeholders + per-doc detection counts (PII seeded onto every "
        "10th doc so the oracle certifies true positives). Map-only — "
        "no shuffle at any scale.",
    tags=("text", "north-star"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % 10 == 0,
               F.concat(F.col("text"), F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com or +12-345-6789 now")))
        .otherwise(F.col("text")).alias("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL, "<EMAIL>"),
        PII_PHONE, "<PHONE>")
    n_emails = F.regexp_count("text", F.lit(PII_EMAIL)).cast("long")
    n_phones = F.regexp_count("text", F.lit(PII_PHONE)).cast("long")
    return seeded.select(
        "doc_id", "lang",
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        ((n_emails + n_phones) > 0).alias("had_pii"),
    )


VOCAB_SIZE = 20

_VOCAB_OOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
vocab AS (
  SELECT tok FROM tok GROUP BY tok
  ORDER BY count(*) DESC, tok LIMIT {VOCAB_SIZE}
),
marked AS (
  SELECT t.doc_id, t.tok, (v.tok IS NOT NULL) AS in_vocab,
         CAST(freq.c AS BIGINT) AS tok_freq
  FROM tok t
  LEFT JOIN vocab v ON t.tok = v.tok
  JOIN (SELECT tok, count(*) AS c FROM tok GROUP BY tok) freq
    ON t.tok = freq.tok
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE NOT in_vocab) AS BIGINT) AS n_oov,
       round(CAST(count(*) FILTER (WHERE NOT in_vocab) AS DOUBLE)
             / count(*), 6) AS oov_rate,
       round(sum(CAST(1.0 AS DOUBLE) / tok_freq), 6) AS rarity_score
FROM marked GROUP BY doc_id
"""


@query(
    "vocab_oov_stats",
    _VOCAB_OOV_ORACLE,
    doc=f"N3 vocabulary build + OOV analysis: top-{VOCAB_SIZE} corpus "
        "vocabulary (count-desc, token tie-break), per-doc OOV rate, and "
        "a rarity score = Σ 1/corpus-frequency (rational arithmetic — a "
        "surprisal proxy that stays bitwise-deterministic cross-engine "
        "where log() would not). Vocab broadcasts; tokens never shuffle "
        "twice.",
    tags=("text", "north-star"),
)
def q_vocab_oov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    # Checkpoint the token frequency table (vocab-bounded): the top-K
    # vocab pick AND the per-token frequency attach both read it —
    # uncached, each re-ran the corpus explode + aggregation
    # (documents×3 in the plan census; round 11, guide §2.4).
    freq = (tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=True))
    vocab = (freq.orderBy(F.desc("c"), F.asc("tok")).limit(VOCAB_SIZE)
             .select("tok", F.lit(True).alias("in_vocab")))
    marked = (
        tok.join(F.broadcast(vocab), "tok", "left")
        .join(F.broadcast(freq), "tok")
        .select("doc_id",
                F.coalesce("in_vocab", F.lit(False)).alias("in_vocab"),
                F.col("c").alias("tok_freq"))
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_if(~F.col("in_vocab")).alias("n_oov"),
        F.round(F.count_if(~F.col("in_vocab")).cast("double")
                / F.count(F.lit(1)), 6).alias("oov_rate"),
        F.round(F.sum(F.lit(1.0).cast("double") / F.col("tok_freq")), 6)
        .alias("rarity_score"),
    )


SAMPLE_PER_LANG = 20

_STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, sample_rank FROM (
  SELECT doc_id, lang,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS STRING)), doc_id
         ) AS INTEGER) AS sample_rank
  FROM documents
) WHERE sample_rank <= {SAMPLE_PER_LANG}
"""


@query(
    "stratified_sample",
    _STRATIFIED_ORACLE,
    doc=f"N3 deterministic stratified sample: top-{SAMPLE_PER_LANG} docs "
        "per language ordered by content hash — replayable eval-set "
        "carving with no RNG state; one shuffle on the stratum key.",
    tags=("text", "sampling", "north-star"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang",
                    F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= SAMPLE_PER_LANG)
    )
