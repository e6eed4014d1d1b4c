"""Cross-corpus comparison: trigram novelty and vocabulary overlap.

Two curation metrics a training-data pipeline tracks as a corpus
grows, both built on the inverted-index shape (token-keyed equi-joins,
never document-pair joins):

* ``trigram_novelty_by_doc`` — for each document (doc_id order = the
  ingestion order), the fraction of its word-trigram INSTANCES whose
  corpus-first occurrence is this document. A freshly scraped corpus
  shows novelty near 1; as near-duplicate content accumulates the
  curve decays — the marginal-value signal behind dedup-aware data
  mixing (what SemDeDup/D4-style pipelines monitor). Exact integer
  counts: first-occurrence doc per trigram via min(doc_id), joined
  back on the trigram key.
* ``source_vocab_jaccard`` — pairwise Jaccard similarity of the
  distinct-token vocabularies of every source pair, via the token
  inverted index: explode each source's vocab once, self-join on
  token with source_a < source_b, |A∪B| = |A|+|B|−|A∩B|. Candidate
  generation is an equi-join on the token key — pair cost is bounded
  by per-token source lists (≤ #sources), never #docs² — the same
  blocking discipline as the dedup family (dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), tri AS (
  SELECT doc_id,
         t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3
), first_seen AS (
  SELECT g, min(doc_id) AS first_doc FROM tri GROUP BY g
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_trigrams,
       CAST(sum(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(CAST(sum(CASE WHEN f.first_doc = t.doc_id
                      THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS novelty
FROM tri t JOIN first_seen f ON f.g = t.g
GROUP BY t.doc_id
"""


@query(
    "trigram_novelty_by_doc",
    _NOVELTY_ORACLE,
    doc="Per-document trigram novelty: the fraction of each doc's "
        "word-trigram instances whose corpus-first occurrence (min "
        "doc_id over the trigram) is this document — the "
        "marginal-novelty decay curve a growing corpus is monitored "
        "by in dedup-aware mixing. Exact integer counts throughout. "
        "Shuffle profile: one map-side trigram explode feeding BOTH "
        "the first-occurrence aggregate and the instance side of the "
        "trigram-keyed equi-join; per-doc fan-in is the final "
        "doc_id groupBy.",
    tags=("northstar", "text", "dedup", "join"),
)
def q_trigram_novelty_by_doc(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    tri = (docs
           .select("doc_id", t.alias("t"))
           .filter(F.size("t") >= 3)
           .select("doc_id",
                   F.explode(
                       F.transform(
                           F.sequence(F.lit(0), F.size("t") - 3),
                           lambda i: F.concat_ws(
                               " ", F.col("t")[i], F.col("t")[i + 1],
                               F.col("t")[i + 2]))).alias("g")))
    first_seen = tri.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                  .otherwise(0))
    return (tri.join(first_seen, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_trigrams"),
                 novel.cast("long").alias("n_novel"),
                 F.round(novel.cast("double") / F.count(F.lit(1)), 6)
                 .alias("novelty")))


_VOCAB_JACCARD_ORACLE = """
WITH vocab AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS v FROM vocab
  GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM vocab a JOIN vocab b
    ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b,
       sa.v AS vocab_a, sb.v AS vocab_b, i.n_inter,
       round(CAST(i.n_inter AS DOUBLE)
             / (sa.v + sb.v - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""


@query(
    "source_vocab_jaccard",
    _VOCAB_JACCARD_ORACLE,
    doc="Pairwise Jaccard similarity of source vocabularies via the "
        "token inverted index: one distinct (source, token) explode, "
        "a token-keyed self-join with source_a < source_b (pair "
        "fan-out bounded by the per-token source list, <= #sources, "
        "never #docs^2 — the dedup-family blocking discipline), and "
        "|A u B| = |A| + |B| - |A n B| from broadcast per-source "
        "sizes. The source-redundancy map that complements the "
        "corpus_kl_divergence drift score.",
    tags=("northstar", "text", "dedup", "join"),
)
def q_source_vocab_jaccard(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Checkpoint the per-source vocabulary (distinct (source, token) —
    # vocab-bounded, far smaller than the corpus): the size aggregate
    # and BOTH sides of the intersection self-join otherwise re-run
    # the full text explode + distinct three times (documents×4 in the
    # plan census; round 11, guide §2.4).
    vocab = (docs
             .select("source",
                     F.explode(F.split(F.col("text"), " ")).alias("tok"))
             .distinct().localCheckpoint(eager=True))
    sizes = (vocab.groupBy("source")
             .agg(F.count(F.lit(1)).cast("long").alias("v")))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (a.join(b, (F.col("a.tok") == F.col("b.tok"))
                    & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("source_a"),
                      F.col("b.source").alias("source_b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    sa = F.broadcast(sizes.select(F.col("source").alias("source_a"),
                                  F.col("v").alias("vocab_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("source_b"),
                                  F.col("v").alias("vocab_b")))
    return (inter.join(sa, "source_a").join(sb, "source_b")
            .select("source_a", "source_b", "vocab_a", "vocab_b",
                    "n_inter",
                    F.round(F.col("n_inter").cast("double")
                            / (F.col("vocab_a") + F.col("vocab_b")
                               - F.col("n_inter")), 6).alias("jaccard")))
