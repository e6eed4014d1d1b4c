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
