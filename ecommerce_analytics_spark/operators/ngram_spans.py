"""Cross-document repeated n-gram mining + span pruning (N3/N1
extension — the exact-substring-dedup family of LLM data pipelines).

Deduplicating repeated spans (not just whole near-duplicate documents)
is a standard pretraining-corpus step: memorized boilerplate — headers,
license blocks, navigation chrome — recurs verbatim across documents
that are otherwise distinct, and near-dup detectors tuned for whole-doc
similarity never fire on it (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better", approximates it with suffix
arrays; C4/RefinedWeb use repeated-span heuristics). The distributed
formulation here is the n-gram-inventory approximation:

- ``repeated_ngram_docs``: every word 8-gram that occurs in ≥2
  distinct documents, with document and occurrence counts — the
  corpus-wide repeated-span inventory.
- ``repeated_ngram_prune``: rebuild each document with every token
  covered by a cross-document-repeated 8-gram removed; emits byte
  counts and an md5 of the pruned text, so the oracle certifies the
  reconstruction EXACTLY, not just the counts.

Scale shape (100 TB): grams are md5-hashed AT THE EXPLODE, so the
inventory groupBy shuffles (hash, doc_id) pairs — never gram strings;
gram fan-out is ~tokens-per-doc (linear). The prune path is one
semi-join of per-doc gram occurrences against the repeated-hash set
(equi on the hash — AQE broadcasts it when small, as boilerplate
inventories are) followed by a per-doc covered-position aggregation;
reassembly is a higher-order array filter — no per-token shuffle, no
Python. The prune plan scans/explodes the corpus twice (once to build
the repeated-hash set, once for occurrences) — deliberate: the
single-scan alternative (collect_list of (doc, pos) per gram hash,
then filter + re-explode) concentrates every occurrence of a
mega-repeated boilerplate gram into ONE aggregation buffer, an
unbounded-skew trap; at 100 TB the right reuse is materializing the
gram table once (checkpoint/persist between the two consumers), which
changes no plan shape. Reference parity: no counterpart (the
reference has no text operators at all); north-star family per
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query
from ecommerce_analytics_spark.sqlkit import ngram_positions

NGRAM_N = 8

# shared gram generator: 1-based start positions, inclusive slices.
# NB Spark's sequence(1, 0) counts DOWN ([1, 0]) — docs shorter than N
# tokens must hit the empty-array branch, not a descending sequence.
_GRAMS_EXPR = (
    f"CASE WHEN size(toks) >= {NGRAM_N} THEN "
    f"  transform({ngram_positions('toks', NGRAM_N)}, "
    f"            i -> concat_ws(' ', slice(toks, i, {NGRAM_N}))) "
    f"ELSE array() END"
)

_GRAMS_CTE = f"""
WITH d AS (
  -- identity contract: one row per delivered document — duplicate
  -- deliveries double every span count and token reassembly (dup
  -- probe, round 7)
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM (SELECT DISTINCT * FROM documents)
), g AS (
  SELECT doc_id, i, array_to_string(toks[i:i + {NGRAM_N - 1}], ' ') AS gram
  FROM d, LATERAL unnest(generate_series(
         1, greatest(len(toks) - {NGRAM_N - 1}, 0))) AS t(i)
)
"""

_REPEATED_ORACLE = _GRAMS_CTE + """
SELECT md5(gram) AS gram_hash,
       min(gram) AS gram,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM g
GROUP BY md5(gram)
HAVING count(DISTINCT doc_id) >= 2
"""


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos 1-based, gram_hash) for every word 8-gram."""
    docs = load_table(spark, sf_dir, "documents").distinct()
    return (
        docs.select("doc_id",
                    F.split("text", " ").alias("toks"))
        .select("doc_id", F.posexplode(F.expr(_GRAMS_EXPR))
                .alias("pos0", "gram"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                F.md5("gram").alias("gram_hash"), "gram")
    )


@query(
    "repeated_ngram_docs",
    _REPEATED_ORACLE,
    doc="Cross-document repeated-span inventory: every word 8-gram "
        "occurring in >=2 distinct documents, with doc/occurrence "
        "counts. Grams md5-hashed at the explode — the inventory "
        "groupBy shuffles hashes, never gram strings.",
    tags=("text", "dedup", "north-star"),
)
def q_repeated_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    grams = _doc_grams(spark, sf_dir)
    return (
        grams.groupBy("gram_hash")
        .agg(F.min("gram").alias("gram"),
             F.countDistinct("doc_id").cast("long").alias("n_docs"),
             F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .filter(F.col("n_docs") >= 2)
    )


_PRUNE_ORACLE = _GRAMS_CTE + f"""
, rep AS (
  SELECT md5(gram) AS gram_hash
  FROM g GROUP BY md5(gram) HAVING count(DISTINCT doc_id) >= 2
), cov AS (
  SELECT DISTINCT g.doc_id, c.j
  FROM g JOIN rep r ON md5(g.gram) = r.gram_hash,
       LATERAL unnest(generate_series(g.i, g.i + {NGRAM_N - 1})) AS c(j)
), tok_pos AS (
  SELECT doc_id, i, toks[i] AS tok
  FROM d, LATERAL unnest(generate_series(1, len(toks))) AS t(i)
), pruned AS (
  SELECT t.doc_id,
         string_agg(t.tok, ' ' ORDER BY t.i) AS pruned_text,
         CAST(count(*) AS BIGINT) AS n_tokens_after
  FROM tok_pos t
  ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.j
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(len(d.toks) AS BIGINT) AS n_tokens_before,
       coalesce(p.n_tokens_after, 0) AS n_tokens_after,
       md5(coalesce(p.pruned_text, '')) AS pruned_md5
FROM d LEFT JOIN pruned p ON d.doc_id = p.doc_id
"""


@query(
    "repeated_ngram_prune",
    _PRUNE_ORACLE,
    doc="Span-level dedup: every token covered by a cross-document-"
        "repeated 8-gram is removed and the document reassembled; "
        "md5 of the pruned text certifies the reconstruction exactly. "
        "One hash-only inventory shuffle + one semi-join on the "
        "repeated-hash set + a per-doc covered-position agg; "
        "reassembly is a higher-order array filter, no per-token "
        "shuffle.",
    tags=("text", "dedup", "north-star"),
)
def q_repeated_ngram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").distinct() \
        .select("doc_id", F.split("text", " ").alias("toks"))
    # persist(): the repeated-gram filter and the coverage join both
    # read the 8-gram explode — uncached, the md5-per-gram pipeline
    # runs twice (documents×3 in the plan census; round 11, guide
    # §2.4/§5). Narrow rows (id, pos, hash); lazy persist, the
    # pagerank precedent.
    grams = _doc_grams(spark, sf_dir).select(
        "doc_id", "pos", "gram_hash").persist()
    rep = (grams.groupBy("gram_hash")
           .agg(F.countDistinct("doc_id").alias("n_docs"))
           .filter(F.col("n_docs") >= 2)
           .select("gram_hash"))
    cov = (
        grams.join(rep, "gram_hash", "left_semi")
        .select("doc_id", F.explode(
            F.sequence(F.col("pos"),
                       F.col("pos") + F.lit(NGRAM_N - 1))).alias("j"))
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("j").alias("covered"))
    )
    pruned_toks = F.expr(
        "filter(toks, (tok, i) -> covered IS NULL "
        "OR NOT array_contains(covered, i + 1))")
    return (
        docs.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens_before"),
            # coalesce mirrors the oracle's coalesce(n_tokens_after, 0)
            # LEFT-JOIN form: a NULL-text doc keeps 0 tokens, not NULL
            F.coalesce(F.size(pruned_toks).cast("long"), F.lit(0))
            .alias("n_tokens_after"),
            F.md5(F.concat_ws(" ", pruned_toks)).alias("pruned_md5"),
        )
    )


# ---------------------------------------------------------------------------
# Maximal shared runs — the suffix-array question answered distributively

RUN_OCC_CAP = 64  # grams above this total-occurrence count are boilerplate


_RUNS_ORACLE = _GRAMS_CTE + f"""
, gh AS (
  SELECT doc_id, i, md5(gram) AS h FROM g
), ok AS (
  SELECT h FROM gh GROUP BY h
  HAVING count(*) <= {RUN_OCC_CAP} AND count(DISTINCT doc_id) >= 2
), m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.i - b.i AS diag, a.i AS pos
  FROM gh a
  JOIN ok ON ok.h = a.h
  JOIN gh b ON b.h = a.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
), isl AS (
  SELECT doc_a, doc_b, diag, pos,
         pos - row_number() OVER (PARTITION BY doc_a, doc_b, diag
                                  ORDER BY pos) AS grp
  FROM m
), runs AS (
  SELECT doc_a, doc_b,
         CAST(count(*) + {NGRAM_N - 1} AS BIGINT) AS run_tokens
  FROM isl GROUP BY doc_a, doc_b, diag, grp
)
SELECT doc_a, doc_b,
       max(run_tokens) AS longest_run_tokens,
       CAST(count(*) AS BIGINT) AS n_runs
FROM runs GROUP BY doc_a, doc_b
"""


@query(
    "longest_shared_run",
    _RUNS_ORACLE,
    doc="The suffix-array question of Lee et al. 2022 answered "
        "distributively: for every document pair sharing a word "
        "8-gram, the exact length in tokens of their longest common "
        "contiguous run, plus the count of maximal shared runs. "
        "Matching 8-gram positions lie on (pos_a - pos_b) diagonals; "
        "consecutive positions on one diagonal are one shared run "
        "(gaps-and-islands: pos - row_number), of token length "
        "island_size + 7. Grams occurring > 64 times are excluded "
        "(boilerplate belongs to repeated_ngram_prune; the cap bounds "
        "the per-gram pair fan-out at 64^2 so no mega-gram can melt "
        "the join — the same df-cap discipline as dedup_ngram_jaccard)"
        ". One gram scan, posting-list pair explode, window over "
        "(pair, diagonal) — no all-pairs, no collects.",
    tags=("text", "dedup", "window", "north-star"),
)
def q_longest_shared_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    grams = _doc_grams(spark, sf_dir)
    # posting-list per gram hash, capped: one scan, bounded buffers
    posts = (grams.groupBy("gram_hash")
             .agg(F.collect_list(F.struct("doc_id", "pos")).alias("occ"))
             .filter((F.size("occ") <= RUN_OCC_CAP)
                     & (F.size(F.array_distinct(
                         F.expr("transform(occ, x -> x.doc_id)"))) >= 2)))
    pairs = (posts.select(F.explode(F.expr(
        "filter(flatten(transform(occ, x -> transform(occ, y -> "
        "struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "x.pos - y.pos AS diag, x.pos AS pos)))), "
        "p -> p.doc_a < p.doc_b)")).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.diag", "p.pos")
        .distinct())
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pos")
    runs = (pairs
            .withColumn("grp", F.col("pos") - F.row_number().over(w))
            .groupBy("doc_a", "doc_b", "diag", "grp")
            .agg((F.count(F.lit(1)) + (NGRAM_N - 1)).cast("long")
                 .alias("run_tokens")))
    return (runs.groupBy("doc_a", "doc_b")
            .agg(F.max("run_tokens").alias("longest_run_tokens"),
                 F.count(F.lit(1)).cast("long").alias("n_runs")))
