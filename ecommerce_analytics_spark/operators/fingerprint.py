"""Rolling-hash document fingerprinting via winnowing (SURVEY §2.10 N3
"document fingerprinting (rolling hash)").

Implements the winnowing algorithm (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS fingerprinter): polynomial rolling hashes over
token k-grams, then one fingerprint selected per sliding window of W
consecutive hashes (the minimum; leftmost on ties). Guarantees: any
shared substring of length ≥ K + W - 1 tokens yields at least one
common fingerprint — the content-based near-dup/overlap primitive
that, unlike MinHash, localizes WHERE the overlap is.

Plan shape: per-row higher-order array functions compute all window
hashes and winnow selections (documents are bounded-size), then one
explode + DISTINCT — a single shuffle on the compact (doc, pos, fp)
triple. At 100 TB the fingerprint index (doc_id, fp) is the join key
for overlap detection, exactly like the shingle index in dedup.py.

Cross-engine: token codes are md5-derived 32-bit ints (the portable
hash primitive — Spark parses hex with one conv() call, the DuckDB
oracle with the instr() formula; identical values), and all rolling
arithmetic is exact integer mod P < 2^30, so fingerprints are
bit-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.dedup import _hex_chunk_sql
from ecommerce_analytics_spark.plans.registry import query
from ecommerce_analytics_spark.sqlkit import ngram_positions

K_GRAM = 4        # tokens per k-gram
WINNOW_W = 5      # winnow window (hashes per selection window)
HASH_B = 257      # polynomial base
HASH_P = 1_000_000_007  # modulus; acc*B + c < 2^52, no overflow

# (pos, fp) pairs are winnow-deduped as a single bigint pos*P + fp
# (struct list_distinct is unavailable in the oracle engine; the
# encoding is exact: fp < P, pos ≤ doc length).


@query(
    "doc_fingerprint_winnow",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {K_GRAM + WINNOW_W - 1}
    ), coded AS (
      SELECT doc_id,
             list_transform(t, x -> {_hex_chunk_sql('md5(x)', 0)}) AS codes
      FROM tok
    ), kh AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(codes) - {K_GRAM - 1}),
               i -> list_reduce(
                      list_prepend(0, list_slice(codes, i, i + {K_GRAM - 1})),
                      (acc, c) -> (acc * {HASH_B} + c) % {HASH_P})) AS kh
      FROM coded
    ), winnowed AS (
      SELECT DISTINCT doc_id, v
      FROM kh, unnest(list_transform(
        generate_series(1, len(kh) - {WINNOW_W - 1}),
        s -> CAST(s - 1 + list_position(
                 list_slice(kh, s, s + {WINNOW_W - 1}),
                 list_min(list_slice(kh, s, s + {WINNOW_W - 1}))) AS BIGINT)
             * {HASH_P}
             + list_min(list_slice(kh, s, s + {WINNOW_W - 1})))) AS u(v)
    )
    SELECT doc_id,
           CAST(v // {HASH_P} AS INTEGER) AS pos,
           v % {HASH_P} AS fingerprint
    FROM winnowed
    """,
    doc=f"N3 winnowing fingerprints (SIGMOD'03): {K_GRAM}-token rolling "
        f"hashes, min per window of {WINNOW_W} (leftmost tie) — any "
        f"shared run of ≥ {K_GRAM + WINNOW_W - 1} tokens shares a "
        "fingerprint. Map-side array compute + one distinct shuffle on "
        "(doc, pos, fp); exact integer arithmetic both engines.",
    tags=("text", "dedup", "north-star"),
)
def q_doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    coded = (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= K_GRAM + WINNOW_W - 1)
        .select("doc_id", F.expr(
            "transform(t, x -> "
            "CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT))"
        ).alias("codes"))
    )
    kh = coded.select("doc_id", F.expr(
        f"transform({ngram_positions('codes', K_GRAM)}, "
        f"i -> aggregate(slice(codes, i, {K_GRAM}), 0L, "
        f"(acc, c) -> (acc * {HASH_B} + c) % {HASH_P}))").alias("kh"))
    winnowed = (
        kh.select("doc_id", F.explode(F.expr(
            f"transform({ngram_positions('kh', WINNOW_W)}, "
            f"s -> CAST(s - 1 + array_position("
            f"         slice(kh, s, {WINNOW_W}), "
            f"         array_min(slice(kh, s, {WINNOW_W}))) AS BIGINT) "
            f"     * {HASH_P} "
            f"     + array_min(slice(kh, s, {WINNOW_W})))")).alias("v"))
        .distinct()
    )
    return winnowed.select(
        "doc_id",
        F.expr(f"CAST(v DIV {HASH_P} AS INT)").alias("pos"),
        F.expr(f"v % {HASH_P}").alias("fingerprint"),
    )


@query(
    "fingerprint_overlap_pairs",
    f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 30000000 AS doc_id,
               text || ' ' || array_to_string(
                 list_slice(string_split(text, ' '), 1, 20), ' ') AS text
        FROM documents WHERE doc_id % 40 = 0
      ) WHERE len(string_split(text, ' ')) >= {K_GRAM + WINNOW_W - 1}
    ), coded AS (
      SELECT doc_id,
             list_transform(t, x -> {_hex_chunk_sql('md5(x)', 0)}) AS codes
      FROM tok
    ), kh AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(codes) - {K_GRAM - 1}),
               i -> list_reduce(
                      list_prepend(0, list_slice(codes, i, i + {K_GRAM - 1})),
                      (acc, c) -> (acc * {HASH_B} + c) % {HASH_P})) AS kh
      FROM coded
    ), fp AS (
      SELECT DISTINCT doc_id, v % {HASH_P} AS fingerprint
      FROM kh, unnest(list_transform(
        generate_series(1, len(kh) - {WINNOW_W - 1}),
        s -> CAST(s - 1 + list_position(
                 list_slice(kh, s, s + {WINNOW_W - 1}),
                 list_min(list_slice(kh, s, s + {WINNOW_W - 1}))) AS BIGINT)
             * {HASH_P}
             + list_min(list_slice(kh, s, s + {WINNOW_W - 1})))) AS u(v)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared_fingerprints
    FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint
                       AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
    doc="N3 fingerprint-index overlap join: winnowed fingerprints as an "
        "inverted index, equi-self-join on the fingerprint → pairs "
        "sharing ≥ 2 fingerprints (partial-copy detection; the injected "
        "corpus appends each 40th doc's 20-token prefix to itself, so "
        "true positives exist). Candidate cost ∝ index size, never "
        "docs² — the plagiarism/contamination-scan shape at 100 TB.",
    tags=("text", "dedup", "join", "north-star"),
)
def q_fingerprint_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    partial = (docs.filter(F.col("doc_id") % 40 == 0)
               .select((F.col("doc_id") + 30000000).alias("doc_id"),
                       F.concat(F.col("text"), F.lit(" "), F.expr(
                           "array_join(slice(split(text, ' '), 1, 20), ' ')"))
                       .alias("text")))
    n_part = spark.sparkContext.defaultParallelism
    corpus = docs.unionAll(partial).repartition(n_part, "doc_id")
    coded = (
        corpus.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= K_GRAM + WINNOW_W - 1)
        .select("doc_id", F.expr(
            "transform(t, x -> "
            "CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT))"
        ).alias("codes"))
    )
    kh = coded.select("doc_id", F.expr(
        f"transform({ngram_positions('codes', K_GRAM)}, "
        f"i -> aggregate(slice(codes, i, {K_GRAM}), 0L, "
        f"(acc, c) -> (acc * {HASH_B} + c) % {HASH_P}))").alias("kh"))
    fp = (
        kh.select("doc_id", F.explode(F.expr(
            f"transform({ngram_positions('kh', WINNOW_W)}, "
            f"s -> CAST(s - 1 + array_position("
            f"         slice(kh, s, {WINNOW_W}), "
            f"         array_min(slice(kh, s, {WINNOW_W}))) AS BIGINT) "
            f"     * {HASH_P} "
            f"     + array_min(slice(kh, s, {WINNOW_W})))")).alias("v"))
        .select("doc_id", (F.col("v") % HASH_P).alias("fingerprint"))
        .distinct()
        # persist(): both sides of the shared-fingerprint self-join
        # read fp — uncached, the md5 → rolling-hash → winnow pipeline
        # (the expensive part) executes twice (documents×4 in the plan
        # census). Two longs per fingerprint cached; lazy persist, the
        # pagerank precedent (round 11, guide §2.4/§5).
        .persist()
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fingerprint") == F.col("b.fingerprint"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_fingerprints"))
        .filter(F.col("n_shared_fingerprints") >= 2)
    )
