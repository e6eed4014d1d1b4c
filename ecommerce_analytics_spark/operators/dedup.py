"""Deduplication operators for training-data pipelines (SURVEY §2.10 N1).

Exact (hash-groupBy), n-gram Jaccard (shingle inverted-index join),
MinHash + LSH banding (shingle → 16 min-hashes → 4 bands → bucket
join), and SimHash (16-bit token-hash majority) — each fully
declarative, portable to the DuckDB oracle via a shared md5 hash
primitive (engine-native hash functions differ across engines; md5
does not).

Scale shape: every candidate-pair generator is an equi-join on a
compact key (shingle, band signature, simhash bucket) — never a cross
join. At 100 TB the shingle inverted index is the dominant shuffle;
hot shingles are capped (DF_CAP) exactly like stop-shingle filtering
in production MinHash pipelines, which also bounds skew.

The synthetic corpus has no near-duplicates, so each query unions in
deterministic perturbed copies of a sample of documents (prefix-
trimmed / verbatim) — the operator must *find* them, giving the
oracle real positives to certify.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_K = 3
DF_CAP = 200  # drop shingles appearing in more docs (stop-shingles)
JACCARD_THRESHOLD = 0.2

# -- shared corpus with injected near/exact duplicates ------------------
_CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         substr(text, instr(text, ' ') + 1) AS text
  FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text
  FROM documents WHERE doc_id % 25 = 0
)
"""

# shingles: k-gram over tokens, DISTINCT per doc, stop-shingles dropped
_SHINGLE_SQL = f"""
shingle_all AS (
  SELECT DISTINCT doc_id, sh
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             generate_series(1, len(tokens) - {SHINGLE_K - 1}),
             i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]
           )) AS sh
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM corpus)
  )
),
shingle AS (
  SELECT doc_id, sh FROM shingle_all
  WHERE sh IN (SELECT sh FROM shingle_all GROUP BY sh
               HAVING count(*) <= {DF_CAP})
)
"""


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = (docs.filter(F.col("doc_id") % 50 == 0)
            .select((F.col("doc_id") + 10000000).alias("doc_id"),
                    F.expr("substr(text, instr(text, ' ') + 1)").alias("text")))
    exact = (docs.filter(F.col("doc_id") % 25 == 0)
             .select((F.col("doc_id") + 20000000).alias("doc_id"), "text"))
    return docs.unionAll(near).unionAll(exact)


def _shingles(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh) distinct, hot shingles capped at DF_CAP docs."""
    sh = (
        corpus
        .select("doc_id", F.expr(
            f"explode(transform(sequence(1, size(split(text, ' ')) - {SHINGLE_K - 1}), "
            f"i -> concat_ws(' ', element_at(split(text, ' '), i), "
            f"element_at(split(text, ' '), i + 1), "
            f"element_at(split(text, ' '), i + 2))))").alias("sh"))
        .distinct()
    )
    # document-frequency cap as a single window pass (an anti-join
    # against a separate hot-list aggregate recomputes the explode
    # subtree; one partition-only window does not)
    df_count = F.count(F.lit(1)).over(Window.partitionBy("sh"))
    return (sh.withColumn("df", df_count)
            .filter(F.col("df") <= DF_CAP).drop("df"))


@query(
    "dedup_exact",
    f"""
    WITH {_CORPUS_SQL.strip()}
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS canonical_doc_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM corpus GROUP BY md5(text)
    """,
    doc="N1 exact dedup: content-hash groupBy, canonical = min doc_id. "
        "One shuffle on the 128-bit fingerprint; at 100 TB this is the "
        "cheapest dedup pass and runs first.",
    tags=("dedup", "north-star"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    return (
        corpus.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


_JACCARD_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
{_SHINGLE_SQL.strip().lstrip()},
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shingle GROUP BY doc_id
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM shingle a JOIN shingle b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.n_common,
       round(CAST(i.n_common AS DOUBLE)
             / (sa.n + sb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common)
      >= {JACCARD_THRESHOLD}
"""


@query(
    "dedup_ngram_jaccard",
    _JACCARD_ORACLE,
    doc=f"N1 n-gram Jaccard near-dup: {SHINGLE_K}-gram shingle inverted "
        "index self-join → intersection counts → |A∩B|/|A∪B| ≥ "
        f"{JACCARD_THRESHOLD}. The join key is the shingle (capped df ≤ "
        f"{DF_CAP}), so candidate generation is linear in index size, "
        "never all-pairs.",
    tags=("dedup", "join", "north-star"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    shingle = _shingles(_corpus(spark, sf_dir))
    sizes = shingle.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shingle.alias("a")
    b = shingle.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (F.col("n_common").cast("double")
           / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")))
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


_MINHASH_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
{_SHINGLE_SQL.strip().lstrip()},
seeds AS (SELECT unnest(generate_series(0, {N_MINHASH - 1})) AS seed),
mh AS (
  SELECT s.doc_id, sd.seed,
         min(md5(s.sh || '#' || CAST(sd.seed AS VARCHAR))) AS h
  FROM shingle s CROSS JOIN seeds sd
  GROUP BY s.doc_id, sd.seed
),
bands AS (
  SELECT doc_id, seed // {N_MINHASH // N_BANDS} AS band,
         string_agg(h, '' ORDER BY seed) AS sig
  FROM mh GROUP BY doc_id, seed // {N_MINHASH // N_BANDS}
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared_bands
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b, c.n_shared_bands,
       round(avg(CASE WHEN ma.h = mb.h THEN 1.0 ELSE 0.0 END), 6)
         AS est_jaccard
FROM cand c
JOIN mh ma ON ma.doc_id = c.doc_a
JOIN mh mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed
GROUP BY c.doc_a, c.doc_b, c.n_shared_bands
"""


@query(
    "dedup_minhash_lsh",
    _MINHASH_ORACLE,
    doc=f"N1 MinHash+LSH: {N_MINHASH} md5-derived min-hashes per doc → "
        f"{N_BANDS} bands of {N_MINHASH // N_BANDS} → candidate pairs "
        "share a full band signature → estimated Jaccard = matching-hash "
        "fraction. Candidates come from an equi-join on (band, sig): "
        "cost ∝ docs, not docs² — the 100 TB fuzzy-dedup workhorse.",
    tags=("dedup", "join", "north-star"),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Wide-signature plan: ONE aggregation computes all 16 min-hashes as
    # columns (no 16× row blowup / no fat shuffle — the naive
    # seed-crossJoin formulation measured 22s at sf0.1; this is ~4×
    # less shuffled data). Bands and the matching-hash estimate are then
    # pure column expressions over the wide rows.
    shingle = _shingles(_corpus(spark, sf_dir))
    mh = shingle.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat_ws("#", F.col("sh"), F.lit(str(i)))))
        .alias(f"h{i}") for i in range(N_MINHASH)])

    rows_per_band = N_MINHASH // N_BANDS
    band_structs = [
        F.struct(F.lit(b).alias("band"),
                 F.concat(*[F.col(f"h{b * rows_per_band + j}")
                            for j in range(rows_per_band)]).alias("sig"))
        for b in range(N_BANDS)
    ]
    bands = mh.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"),
             F.col("bs.sig").alias("sig"))

    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )
    ma = mh.alias("ma")
    mb = mh.alias("mb")
    n_match = sum(
        F.when(F.col(f"ma.h{i}") == F.col(f"mb.h{i}"), 1).otherwise(0)
        for i in range(N_MINHASH))
    return (
        cand.join(ma, F.col("ma.doc_id") == F.col("doc_a"))
        .join(mb, F.col("mb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", "n_shared_bands",
                F.round(n_match / F.lit(float(N_MINHASH)), 6)
                .alias("est_jaccard"))
    )


def _simhash_bit_sums_sql() -> list[str]:
    return [
        f"sum(CASE WHEN (instr('0123456789abcdef', substring(md5(tok), {j}, 1)) - 1) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(1, 17)
    ]


_SIMHASH_CONCAT = ("concat(" + ", ".join(
    f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(1, 17)) + ")")

_SIMHASH_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus
),
sums AS (
  SELECT doc_id, {', '.join(_simhash_bit_sums_sql())}
  FROM tok GROUP BY doc_id
),
sh AS (
  SELECT doc_id, {_SIMHASH_CONCAT} AS simhash FROM sums
)
SELECT doc_id, simhash,
       CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS n_same_bucket
FROM sh
"""


@query(
    "dedup_simhash",
    _SIMHASH_ORACLE,
    doc="N1 SimHash: 16-bit signature — per token take 16 md5-derived "
        "bits, majority-vote each bit over the doc (±1 sums), bucket by "
        "signature. Identical docs collide exactly; the Hamming-radius "
        "extension joins buckets over bit-flip probes. Pure agg: one "
        "shuffle on doc_id, one on the signature.",
    tags=("dedup", "north-star"),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus(spark, sf_dir)
    tok = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    sums = tok.groupBy("doc_id").agg(
        *[F.expr(e) for e in _simhash_bit_sums_sql()])
    sh = sums.select("doc_id", F.expr(_SIMHASH_CONCAT).alias("simhash"))
    return sh.select(
        "doc_id", "simhash",
        F.count(F.lit(1)).over(Window.partitionBy("simhash"))
        .cast("long").alias("n_same_bucket"),
    )
