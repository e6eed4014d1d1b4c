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
from ecommerce_analytics_spark.sqlkit import ngram_positions

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SHINGLE_K = 3
DF_CAP = 200  # drop shingles appearing in more docs (stop-shingles)
JACCARD_THRESHOLD = 0.2

def _drop_hot(df: DataFrame, hot: DataFrame, keys: list[str]) -> DataFrame:
    """Anti-join ``df`` against the hot key list, skew-safely.

    Hot lists are tiny by construction (≤ total_instances/DF_CAP rows —
    only the head of the Zipf curve exceeds the cap), but at 100 TB
    "tiny" needs a guard, not a hope. The guard is AQE: with no
    broadcast hint, the runtime size of the materialized hot-list
    exchange decides broadcast-anti (under
    spark.sql.adaptive.autoBroadcastJoinThreshold) vs shuffle-anti —
    exactly the fallback we want, with no driver-side count. An earlier
    version counted via localCheckpoint to pick the hint itself; that
    ran the whole shingle subtree in a separate job and lost exchange
    reuse, doubling the dedup queries' wall time. A window-count cap
    over the key would be worse still: it sort-shuffles the hottest key,
    the exact skew the cap exists to remove.
    """
    return df.join(hot, keys, "left_anti")

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
    # r12 (guide §2.4, VERDICT r11 #10): the synthetic-dup union used
    # to be three branches over the same documents scan (base + %50
    # near-dup + %25 exact-dup) — every dedup-family pipeline instance
    # paid THREE corpus reads. One scan + a conditional-array explode
    # emits exactly the same rows map-side: each doc yields itself,
    # plus its near variant iff doc_id % 50 = 0, plus its exact copy
    # iff doc_id % 25 = 0 (concat of conditionally-empty arrays — no
    # NULL rows ever constructed). Row-identical to the union (same
    # doc_ids, same texts), so every oracle CTE is untouched.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.select(F.explode(F.expr("""
        concat(
          array(named_struct('doc_id', doc_id, 'text', text)),
          IF(doc_id % 50 = 0,
             array(named_struct('doc_id', doc_id + 10000000L,
                                'text', substr(text, instr(text, ' ') + 1))),
             array()),
          IF(doc_id % 25 = 0,
             array(named_struct('doc_id', doc_id + 20000000L, 'text', text)),
             array())
        )""")).alias("d")).select("d.doc_id", "d.text")
    # the documents table is a handful of parquet row groups → 1-2 scan
    # partitions; without a repartition the shingle explode (50-100×
    # fan-out) runs nearly single-threaded (profiled 4.5s of a 10s
    # query at sf0.1). At 100 TB input splits provide this for free.
    n_part = spark.sparkContext.defaultParallelism
    return corpus.repartition(n_part, "doc_id")


def _shingles(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh) distinct, hot shingles capped at DF_CAP docs.

    The cap is a groupBy + broadcast anti-join of the hot list — the
    same shape as the minhash path. (Round 1 used a count().over(
    Window.partitionBy("sh")) single-pass cap; that sort-shuffles the
    hottest key, which is precisely the skew the stop-shingle cap is
    meant to eliminate.)
    """
    pos = ngram_positions("split(text, ' ')", SHINGLE_K)
    sh = (
        corpus
        .select("doc_id", F.expr(
            f"explode(transform({pos}, "
            f"i -> concat_ws(' ', element_at(split(text, ' '), i), "
            f"element_at(split(text, ' '), i + 1), "
            f"element_at(split(text, ' '), i + 2))))").alias("sh"))
        .distinct()
        # referenced by BOTH the stop-shingle aggregation and the
        # anti-join's probe side; without a cut each re-runs the
        # 3-branch corpus union + shingle explode (r11 scan census:
        # the whole pipeline survived 6x per consumer). Lazy persist
        # of the narrow (doc_id, sh) index — no text payload cached.
        .persist()
    )
    hot = (sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") > DF_CAP).select("sh"))
    return _drop_hot(sh, hot, ["sh"])


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
    # Intersection counts via posting-list explode, not a self-join:
    # group the capped index by shingle (lists are ≤ DF_CAP docs by
    # construction — the cap runs FIRST, so no unbounded collect) and
    # explode within-list ordered pairs PLUS a singleton marker row
    # (doc_b NULL) per posting, so intersection counts AND per-doc
    # shingle counts come out of ONE aggregation — the recommendations
    # NULL-marker shape. The naive formulation referenced the shingle
    # subtree four times (self-join sides + sizes ×2 = 18 file scans in
    # the logical plan, ~10s at sf0.1); this lineage scans the corpus
    # once and every downstream branch hangs off one reused exchange.
    shingle = _shingles(_corpus(spark, sf_dir))
    counts = (
        shingle.groupBy("sh")
        .agg(F.collect_list("doc_id").alias("docs"))
        .select(F.explode(F.expr(
            "flatten(transform(docs, a -> "
            "  concat(array(named_struct('doc_a', a, 'doc_b', CAST(NULL AS BIGINT))), "
            "         transform(filter(docs, b -> a < b), "
            "                   b -> named_struct('doc_a', a, 'doc_b', b)))))")
        ).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
        # sizes/inter filter on the GROUPING KEY (doc_b NULL-ness), so
        # Catalyst pushes the filters below the aggregation and the
        # two exchange subtrees stop being identical — persist is what
        # makes the candidate aggregation run once (the
        # basket_association_rules finding; cache ≈ the aggregation's
        # own shuffle output)
        .persist()
    )
    sizes = (counts.filter(F.col("doc_b").isNull())
             .select(F.col("doc_a").alias("doc_id"), F.col("c").alias("n")))
    inter = (counts.filter(F.col("doc_b").isNotNull())
             .withColumnRenamed("c", "n_common"))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (F.col("n_common").cast("double")
           / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")))
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard"))
    )


# 2-universal hash family over ONE md5 per shingle: hash_i(x) =
# (A_i·x1 + B_i·x2 + C_i) mod P with x1/x2 the two 32-bit halves of
# md5(sh). One digest instead of N_MINHASH — the md5 calls were the
# dominant cost of the naive formulation. Constants < 2^20 keep every
# product < 2^52 (no signed-64 overflow in either engine).
MINHASH_P = 2147483647  # 2^31 - 1
MINHASH_COEFFS = [  # (A_i, B_i, C_i), fixed odd constants
    (710113, 383681, 905341), (569597, 969359, 427169),
    (855127, 510287, 685193), (150151, 717629, 244973),
    (930737, 286927, 553711), (473687, 840179, 118757),
    (222323, 655211, 966947), (788099, 102913, 341743),
    (611953, 924929, 777781), (333233, 448421, 201101),
    (997043, 573473, 864013), (125899, 361275, 494651),  # 361275 even ok
    (741103, 209257, 632033), (485167, 881999, 150023),
    (867289, 317011, 723419), (254413, 692537, 938083),
]


def _hex_chunk_sql(col: str, start: int) -> str:
    """First/second 8 hex digits of an md5 string → BIGINT (portable:
    both engines lack a shared hex-parse builtin, instr does it)."""
    # substring is 1-based; Spark silently treats pos 0 as 1 but DuckDB
    # returns '' — keep positions strictly >= 1
    return "(" + " + ".join(
        f"CAST((instr('0123456789abcdef', substring({col}, {start + d + 1}, 1)) - 1) AS BIGINT)"
        f" * {16 ** (8 - 1 - d)}" for d in range(8)) + ")"


def _minhash_exprs(x1: str = "x1", x2: str = "x2") -> list[str]:
    return [f"(({a} * {x1} + {b} * {x2} + {c}) % {MINHASH_P})"
            for a, b, c in MINHASH_COEFFS]


_MINHASH_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
shingle_raw AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, len(tokens) - {SHINGLE_K - 1}),
           i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]
         )) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM corpus)
),
hx_all AS (
  SELECT DISTINCT doc_id,
         {_hex_chunk_sql('h', 0)} AS x1, {_hex_chunk_sql('h', 8)} AS x2
  FROM (SELECT doc_id, md5(sh) AS h FROM shingle_raw)
),
hx AS (
  SELECT doc_id, x1, x2 FROM (
    SELECT *, count(*) OVER (PARTITION BY x1, x2) AS df FROM hx_all
  ) WHERE df <= {DF_CAP}
),
mh AS (
  SELECT doc_id,
         {', '.join(f'min({e}) AS h{i}' for i, e in enumerate(_minhash_exprs()))}
  FROM hx GROUP BY doc_id
),
bands AS (
  SELECT doc_id, band,
         CASE band {' '.join(
             f"WHEN {b} THEN CAST(h{b*4} AS VARCHAR) || '_' || CAST(h{b*4+1} AS VARCHAR)"
             f" || '_' || CAST(h{b*4+2} AS VARCHAR) || '_' || CAST(h{b*4+3} AS VARCHAR)"
             for b in range(N_BANDS))} END AS sig
  FROM mh CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band)
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared_bands
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT c.doc_a, c.doc_b, c.n_shared_bands,
       round(({' + '.join(f'CASE WHEN ma.h{i} = mb.h{i} THEN 1 ELSE 0 END'
                          for i in range(N_MINHASH))}) / {float(N_MINHASH)}, 6)
         AS est_jaccard
FROM cand c
JOIN mh ma ON ma.doc_id = c.doc_a
JOIN mh mb ON mb.doc_id = c.doc_b
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
    return minhash_lsh_pairs(_corpus(spark, sf_dir))


def minhash_lsh_pairs(corpus: DataFrame) -> DataFrame:
    """MinHash+LSH candidate pairs over a (doc_id, text) corpus —
    the production pipeline, mega-cluster-safe (VERDICT r5 #2), with
    output identical to the all-docs oracle formulation.

    Wide-signature plan, pipeline computed ONCE:
    - shingles hashed to two 32-bit ints AT THE EXPLODE (one md5 per
      shingle; the naive 16-digest formulation measured 22s at sf0.1)
      so every downstream shuffle moves ints, never shingle strings
      (conv() parses the hex — one JVM call per chunk vs the oracle's
      16-instr portable formula; identical values);
    - 16 universal-hash mins as columns in a single aggregation.

    Skew safety — why no step of this plan can concentrate a mega
    cluster into one task:

    1. THE DF CAP BOUNDS EVERY BUCKET. For b docs to land in the same
       (band, sig) bucket, all four of that band's min-hash values
       must coincide, i.e. each minimizing shingle is present in all
       b member docs — so that shingle's document frequency is >= b.
       Shingles with df > DF_CAP are dropped BEFORE hashing, hence
       b <= DF_CAP (up to universal-hash collisions): worst-case
       per-bucket pair fan-out is DF_CAP²/2, a constant, at ANY
       corpus size. The same mechanism makes verbatim clusters
       self-limiting: a text duplicated more than DF_CAP times pushes
       every one of its own shingles over the cap, erasing the whole
       cluster's signatures (stop-shingle semantics — the oracle
       formulation does exactly this; certified by the 2×DF_CAP
       mega-duplicate skew-stress test), while a cluster at or below
       the cap yields bounded buckets. The shingle EXPLODE of a
       duplicated text is linear and map-side — spread across input
       splits, never one task.
    2. SELF-JOIN pair generation. Candidate pairs come from an
       equi-join of the band table with itself on (band, sig), NOT
       from a groupBy(band,sig)+collect_list bucket explosion: a
       bucket holding b docs would put all b members (and their
       16-long signature vectors) into a single aggregation buffer —
       one row, one task, O(b²) pair fan-out with no way for the
       scheduler to split it. The sort-merge self-join keeps members
       as rows, so a hot (band, sig) bucket is exactly the skew AQE's
       OptimizeSkewedJoin splits (asserted by the skew-stress test);
       the build side reuses the probe side's exchange
       (ReusedExchange — plan-asserted in tests), so the shingle
       pipeline still executes once. Measured FASTER than the bucket
       formulation at sf0.1 (1.02s vs 1.45s min-of-3): the bucket
       path paid an object-heavy collect_list aggregation.

    (A verbatim-duplicate pre-collapse — md5(text) grouping, pipeline
    on representatives, pair expansion afterward — was built and
    oracle-certified, then REMOVED: the cap already bounds every
    cluster's cost, and the collapse's extra join/aggregation stages
    measured 2.4× on the headline bench for zero safety gain. Its
    compute saving is linear in the verbatim-dup rate, which exact
    dedup upstream captures anyway.)
    """
    # tokens materialized once per row — element_at over a projected
    # array column instead of re-evaluating split() inside the lambda
    hx_all = (
        corpus
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.expr(
            f"explode(transform({ngram_positions('toks', SHINGLE_K)}, "
            f"i -> md5(concat_ws(' ', element_at(toks, i), "
            f"element_at(toks, i + 1), element_at(toks, i + 2)))))").alias("h"))
        .select("doc_id",
                F.expr("CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)").alias("x1"),
                F.expr("CAST(conv(substring(h, 9, 8), 16, 10) AS BIGINT)").alias("x2"))
    )
    # min() is duplicate-insensitive, so the per-doc DISTINCT the oracle
    # writes is only needed for the document-frequency CAP, not the
    # mins. Compute the (few) hot shingles with an all-longs exact
    # countDistinct — codegen hash agg, no per-group object collection
    # (a collect_set formulation allocated millions of sets and fell
    # back to sort-based aggregation) — and broadcast-anti-join them
    # out, then take map-side-combined mins straight off the multiset:
    # the doc_id shuffle moves 16 longs per (doc × input partition).
    hot = (hx_all.groupBy("x1", "x2")
           .agg(F.countDistinct("doc_id").alias("df"))
           .filter(F.col("df") > DF_CAP)
           .select("x1", "x2"))
    mh = (_drop_hot(hx_all, hot, ["x1", "x2"])
          .groupBy("doc_id").agg(*[
              F.min(F.expr(e)).alias(f"h{i}")
              for i, e in enumerate(_minhash_exprs())])
          # r12 (guide §2.4/§5, VERDICT r11 #6): the band self-join
          # plans as BroadcastHashJoin under the default threshold, and
          # a BroadcastExchange build side cannot reuse the probe
          # side's subtree — the r11 initial plan carried FOUR full
          # shingle/md5 pipeline instances (12 parquet scans: probe +
          # build sides × the hot-list + min branches). Lazy persist of
          # the signature table (ONE row per doc, 16 ints — corpus
          # metadata, never text) makes both join sides a map-only band
          # explode over the cache: pipeline instances 4 → 2 (the
          # hot-list/min pair inside one materialization is the
          # remaining intrinsic double pass). The planner's size-based
          # BHJ→SMJ flip at scale is unaffected (both sides still
          # derive from the same cached frame, so SMJ reuses one
          # exchange — the forced-SMJ skew test pins this).
          .persist())

    # bands carry the full signature vector, so the pair estimate is
    # computed inline at pair generation — no later re-join against mh
    rows_per_band = N_MINHASH // N_BANDS
    band_structs = [
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("_", *[F.col(f"h{b * rows_per_band + j}")
                                    for j in range(rows_per_band)]).alias("sig"))
        for b in range(N_BANDS)
    ]
    bands = mh.select(
        "doc_id",
        F.explode(F.array(*band_structs)).alias("bs"),
        F.array(*[F.col(f"h{i}") for i in range(N_MINHASH)]).alias("hv"),
    ).select("doc_id", F.col("bs.band").alias("band"),
             F.col("bs.sig").alias("sig"), "hv")

    # candidate pairs: skew-splittable self-join (see docstring §2)
    a, b = bands.alias("a"), bands.alias("b")
    pair_nm = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.sig") == F.col("b.sig"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.expr("aggregate(zip_with(a.hv, b.hv, "
                       "(x, y) -> IF(x = y, 1, 0)), 0, "
                       "(s, v) -> s + v)").alias("nm")))
    return (
        pair_nm.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"),
             F.round(F.first("nm") / F.lit(float(N_MINHASH)), 6)
             .alias("est_jaccard"))
    )


def _simhash_bit_sums_sql(n_bits: int = 16) -> list[str]:
    return [
        f"sum(CASE WHEN (instr('0123456789abcdef', substring(md5(tok), {j}, 1)) - 1) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{j}"
        for j in range(1, n_bits + 1)
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


# The probe-join variant uses a WIDER 32-bit signature (all 32 md5 hex
# digits): the 16-bit signature that keeps dedup_simhash's bucketing
# oracle compact collides heavily on a topically-clustered corpus
# (measured ~10k distance-≤2 pairs at sf0.001 — growing ~n²), while 32
# bits leave only genuine near-duplicates inside radius 2 at any SF.
HAMMING_BITS = 32
HAMMING_RADIUS = 2  # pairs found: Hamming distance ≤ 2 (1-flip probes both sides)

_SIMHASH_IV32_SQL = "(" + " + ".join(
    f"CASE WHEN s{j} > 0 THEN {1 << (HAMMING_BITS - j)} ELSE 0 END"
    for j in range(1, HAMMING_BITS + 1)) + ")"

_SIMHASH_HAMMING_ORACLE = f"""
WITH {_CORPUS_SQL.strip()},
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus
),
sums AS (
  SELECT doc_id, {', '.join(_simhash_bit_sums_sql(HAMMING_BITS))}
  FROM tok GROUP BY doc_id
),
sh AS (
  SELECT doc_id, CAST({_SIMHASH_IV32_SQL} AS BIGINT) AS iv FROM sums
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.iv, b.iv)) AS INTEGER) AS hamming_dist
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.iv, b.iv)) <= {HAMMING_RADIUS}
"""


@query(
    "dedup_simhash_hamming",
    _SIMHASH_HAMMING_ORACLE,
    doc=f"N1 SimHash Hamming-radius probe join (the documented extension "
        f"of dedup_simhash): each doc emits its {HAMMING_BITS}-bit "
        f"signature plus all {HAMMING_BITS} single-bit flips; matching "
        "probe buckets from both sides find every pair within Hamming "
        f"distance {HAMMING_RADIUS} WITHOUT an all-pairs comparison "
        f"(cost ∝ {HAMMING_BITS + 1} × docs). The oracle brute-forces "
        "all pairs — the probe join must find the identical set, "
        "including near-identical docs (one token removed) that exact-"
        "signature bucketing misses.",
    tags=("dedup", "join", "north-star"),
)
def q_dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same bucket-groupBy + within-bucket pair-explode shape as the
    # minhash path (a probe self-join would run the token-sum pipeline
    # twice). A pair at distance d ≤ 2 collides in ≥ 1 probe bucket
    # (d=0: 17, d=1: 2, d=2 via the intermediate signature: 1), so
    # dedup by (doc_a, doc_b) then filter on the exact distance.
    corpus = _corpus(spark, sf_dir)
    tok = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    sums = tok.groupBy("doc_id").agg(
        *[F.expr(e) for e in _simhash_bit_sums_sql(HAMMING_BITS)])
    sh = sums.select(
        "doc_id", F.expr(_SIMHASH_IV32_SQL).cast("long").alias("iv"))
    masks = F.array(*[F.lit(m) for m in
                      [0] + [1 << k for k in range(HAMMING_BITS)]])
    probes = sh.select(
        "doc_id", "iv",
        F.explode(masks).alias("mask"),
    ).select("doc_id", "iv",
             F.col("iv").bitwiseXOR(F.col("mask")).alias("probe"))
    buckets = (
        probes.groupBy("probe")
        .agg(F.collect_list(F.struct("doc_id", "iv")).alias("members"))
        .filter(F.size("members") >= 2)
    )
    pairs = buckets.select(F.explode(F.expr(
        "flatten(transform(members, a -> "
        "  transform(filter(members, b -> a.doc_id < b.doc_id), b -> "
        "    named_struct('doc_a', a.doc_id, 'doc_b', b.doc_id, "
        "                 'iva', a.iv, 'ivb', b.iv))))")).alias("p"))
    return (
        pairs.select("p.doc_a", "p.doc_b",
                     F.bit_count(F.col("p.iva").bitwiseXOR(F.col("p.ivb")))
                     .cast("int").alias("hamming_dist"))
        .filter(F.col("hamming_dist") <= HAMMING_RADIUS)
        .groupBy("doc_a", "doc_b")
        .agg(F.first("hamming_dist").alias("hamming_dist"))
    )


# -- incremental dedup: new batch vs an existing corpus index -----------

NEARDUP_MIN_EST = 0.5  # ≥ 8/16 matching min-hashes

_INCR_ORACLE = f"""
WITH existing AS (
  SELECT doc_id, text FROM documents
),
incoming AS (
  SELECT doc_id + 30000000 AS doc_id, text
  FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 40000000 AS doc_id,
         substr(text, instr(text, ' ') + 1) AS text
  FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 50000000 AS doc_id,
         substr(text, 1, n_chars // 2) AS text
  FROM documents WHERE doc_id % 40 = 0
),
x_fp AS (SELECT DISTINCT md5(text) AS fp FROM existing),
sh_e_all AS (
  SELECT DISTINCT doc_id, {_hex_chunk_sql('h', 0)} AS x1,
         {_hex_chunk_sql('h', 8)} AS x2
  FROM (
    SELECT doc_id, md5(unnest(list_transform(
             generate_series(1, len(tokens) - {SHINGLE_K - 1}),
             i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]
           ))) AS h
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM existing)
  )
),
hot AS (
  SELECT x1, x2 FROM sh_e_all GROUP BY x1, x2 HAVING count(*) > {DF_CAP}
),
sh_i_all AS (
  SELECT DISTINCT doc_id, {_hex_chunk_sql('h', 0)} AS x1,
         {_hex_chunk_sql('h', 8)} AS x2
  FROM (
    SELECT doc_id, md5(unnest(list_transform(
             generate_series(1, len(tokens) - {SHINGLE_K - 1}),
             i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2]
           ))) AS h
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM incoming)
  )
),
mh_e AS (
  SELECT doc_id,
         {', '.join(f'min({e}) AS h{i}' for i, e in enumerate(_minhash_exprs()))}
  FROM sh_e_all ANTI JOIN hot USING (x1, x2) GROUP BY doc_id
),
mh_i AS (
  SELECT doc_id,
         {', '.join(f'min({e}) AS h{i}' for i, e in enumerate(_minhash_exprs()))}
  FROM sh_i_all ANTI JOIN hot USING (x1, x2) GROUP BY doc_id
),
bands_e AS (
  SELECT doc_id, band,
         CASE band {' '.join(
             f"WHEN {b} THEN CAST(h{b*4} AS VARCHAR) || '_' || CAST(h{b*4+1} AS VARCHAR)"
             f" || '_' || CAST(h{b*4+2} AS VARCHAR) || '_' || CAST(h{b*4+3} AS VARCHAR)"
             for b in range(N_BANDS))} END AS sig
  FROM mh_e CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band)
),
bands_i AS (
  SELECT doc_id, band,
         CASE band {' '.join(
             f"WHEN {b} THEN CAST(h{b*4} AS VARCHAR) || '_' || CAST(h{b*4+1} AS VARCHAR)"
             f" || '_' || CAST(h{b*4+2} AS VARCHAR) || '_' || CAST(h{b*4+3} AS VARCHAR)"
             for b in range(N_BANDS))} END AS sig
  FROM mh_i CROSS JOIN (SELECT unnest(generate_series(0, {N_BANDS - 1})) AS band)
),
cand AS (
  SELECT i.doc_id AS doc_a, e.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared_bands
  FROM bands_i i JOIN bands_e e ON i.band = e.band AND i.sig = e.sig
  GROUP BY i.doc_id, e.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b, c.n_shared_bands,
         round(({' + '.join(f'CASE WHEN mi.h{i} = me.h{i} THEN 1 ELSE 0 END'
                            for i in range(N_MINHASH))}) / {float(N_MINHASH)}, 6)
           AS est_jaccard
  FROM cand c
  JOIN mh_i mi ON mi.doc_id = c.doc_a
  JOIN mh_e me ON me.doc_id = c.doc_b
),
best AS (
  SELECT doc_a, doc_b, n_shared_bands, est_jaccard,
         CAST(count(*) OVER (PARTITION BY doc_a) AS BIGINT) AS n_candidates
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY doc_a
                             ORDER BY est_jaccard DESC, doc_b) = 1
)
SELECT i.doc_id,
       CASE WHEN x.fp IS NOT NULL THEN 'exact_dup'
            WHEN b.est_jaccard >= {NEARDUP_MIN_EST} THEN 'near_dup'
            ELSE 'unique' END AS verdict,
       coalesce(b.n_candidates, 0) AS n_candidates,
       b.doc_b AS best_match_id,
       b.est_jaccard AS best_est
FROM incoming i
LEFT JOIN (SELECT fp FROM x_fp) x ON md5(i.text) = x.fp
LEFT JOIN best b ON b.doc_a = i.doc_id
"""


def _shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, x1, x2): the two 32-bit halves of md5 per 3-gram shingle
    (same hashing as q_dedup_minhash_lsh — one digest per shingle,
    int-only downstream)."""
    return (
        docs
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.expr(
            f"explode(transform({ngram_positions('toks', SHINGLE_K)}, "
            f"i -> md5(concat_ws(' ', element_at(toks, i), "
            f"element_at(toks, i + 1), element_at(toks, i + 2)))))").alias("h"))
        .select("doc_id",
                F.expr("CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)").alias("x1"),
                F.expr("CAST(conv(substring(h, 9, 8), 16, 10) AS BIGINT)").alias("x2"))
    )


def _band_sigs(hx: DataFrame, hot: DataFrame) -> DataFrame:
    """(doc_id, band, sig, hv): LSH band signatures + the full min-hash
    vector, after dropping the hot (stop-)shingles."""
    mh = (_drop_hot(hx, hot, ["x1", "x2"])
          .groupBy("doc_id").agg(*[
              F.min(F.expr(e)).alias(f"h{i}")
              for i, e in enumerate(_minhash_exprs())]))
    rows_per_band = N_MINHASH // N_BANDS
    band_structs = [
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("_", *[F.col(f"h{b * rows_per_band + j}")
                                    for j in range(rows_per_band)]).alias("sig"))
        for b in range(N_BANDS)
    ]
    return (mh.select(
        "doc_id",
        F.explode(F.array(*band_structs)).alias("bs"),
        F.array(*[F.col(f"h{i}") for i in range(N_MINHASH)]).alias("hv"))
        .select("doc_id", F.col("bs.band").alias("band"),
                F.col("bs.sig").alias("sig"), "hv"))


_INCR_DOC = ("Incremental corpus dedup — the production ingestion shape: a "
        "new batch is admitted against an EXISTING corpus, not "
        "self-joined. Exact layer: md5 semi-join against the index's "
        "fingerprint set. Near layer: MinHash band signatures on both "
        "sides, incoming bands equi-joined to index bands on (band, "
        "sig) — never incoming×index. The stop-shingle list comes from "
        "the index side only (an index artifact, applied to both "
        "sides), matching how a deployed pipeline keeps it static per "
        "index generation. Per incoming doc: verdict (exact_dup | "
        "near_dup at est≥0.5 | unique), candidate count, best match by "
        "(est desc, id) — deterministic argmax via row_number. At 100 "
        "TB the index's fingerprints/bands are precomputed once and "
        "bucket-partitioned; each nightly batch shuffles only itself "
        "plus the matched band buckets. Incoming batch = exact copies "
        "(doc_id%25), prefix-trimmed near-dups (%50), and half-length "
        "fresh docs (%40) — injected positives AND negatives.")


def incremental_incoming(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The synthetic nightly batch: exact copies (doc_id%25),
    prefix-trimmed near-dups (%50), half-length fresh docs (%40) —
    injected positives AND negatives, shared by the in-query and
    persisted-index incremental dedup variants."""
    inc_exact = (docs.filter(F.col("doc_id") % 25 == 0)
                 .select((F.col("doc_id") + 30000000).alias("doc_id"), "text"))
    inc_near = (docs.filter(F.col("doc_id") % 50 == 0)
                .select((F.col("doc_id") + 40000000).alias("doc_id"),
                        F.expr("substr(text, instr(text, ' ') + 1)")
                        .alias("text")))
    inc_fresh = (docs.filter(F.col("doc_id") % 40 == 0)
                 .select((F.col("doc_id") + 50000000).alias("doc_id"),
                         F.expr("substring(text, 1, n_chars div 2)")
                         .alias("text")))
    n_part = spark.sparkContext.defaultParallelism
    # the nightly batch is probed three times (exact fingerprints,
    # band signatures, the per-doc verdict join) — persist so the
    # 3-branch union over documents is expanded once, not per probe
    # (r11 scan census: 9 of dedup_incremental's 13 surviving scans
    # were re-expansions of this frame).
    # Cache contract (ADVICE r11): the returned frame is LAZY, so this
    # helper cannot unpersist — the cache lives until the session ends
    # or the caller clears it. A deployment invoking this per nightly
    # batch must unpersist the returned frame (or clearCache) after
    # the batch's verdicts materialize, or cached batches accumulate.
    return (inc_exact.unionAll(inc_near).unionAll(inc_fresh)
            .repartition(n_part, "doc_id")
            .persist())


def admit_incoming(incoming: DataFrame, x_fp: DataFrame, hot: DataFrame,
                   bands_e: DataFrame) -> DataFrame:
    """Admit ``incoming`` docs against index artifacts (fingerprint set
    ``x_fp``, stop-shingle list ``hot``, band table ``bands_e``) —
    whether those artifacts were just computed (q_dedup_incremental) or
    read back from Parquet (dedup_index.q_dedup_incremental_persisted).
    Returns one row per incoming doc: verdict, candidate count, best
    match by (est desc, id)."""
    exact_hits = (incoming.select("doc_id", F.md5("text").alias("fp"))
                  .join(x_fp, "fp", "left_semi")
                  .select("doc_id").withColumn("is_exact", F.lit(True)))

    bands_i = _band_sigs(_shingle_hashes(incoming).distinct(), hot)

    nm = F.expr("aggregate(zip_with(hv_i, hv_e, (x, y) -> IF(x = y, 1, 0)), "
                "0, (s, v) -> s + v)")
    scored = (
        bands_i.select(F.col("doc_id").alias("doc_a"), "band", "sig",
                       F.col("hv").alias("hv_i"))
        .join(bands_e.select(F.col("doc_id").alias("doc_b"), "band", "sig",
                             F.col("hv").alias("hv_e")),
              ["band", "sig"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"),
             F.round(F.first(nm) / F.lit(float(N_MINHASH)), 6)
             .alias("est_jaccard"))
    )
    w = Window.partitionBy("doc_a")
    best = (scored
            .withColumn("n_candidates",
                        F.count(F.lit(1)).over(w).cast("bigint"))
            .withColumn("rn", F.row_number().over(
                w.orderBy(F.desc("est_jaccard"), F.asc("doc_b"))))
            .filter(F.col("rn") == 1))

    return (
        incoming.select("doc_id")
        .join(exact_hits, "doc_id", "left")
        .join(best.select(F.col("doc_a").alias("doc_id"), "n_candidates",
                          F.col("doc_b").alias("best_match_id"),
                          "est_jaccard"),
              "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), "exact_dup")
            .when(F.col("est_jaccard") >= NEARDUP_MIN_EST, "near_dup")
            .otherwise("unique").alias("verdict"),
            F.coalesce("n_candidates", F.lit(0).cast("bigint"))
            .alias("n_candidates"),
            "best_match_id",
            F.col("est_jaccard").alias("best_est"))
    )


def index_artifacts(spark: SparkSession, existing: DataFrame
                    ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Compute the three index artifacts a deployment stores:
    (fingerprint set, stop-shingle list, band-signature table)."""
    x_fp = existing.select(F.md5("text").alias("fp")).distinct()
    # referenced by the stop-shingle aggregation AND the band build's
    # anti-join probe side; persist the narrow int triple so the
    # corpus shingle explode runs once. Cache contract (ADVICE r11):
    # lazy return — callers that rebuild the index repeatedly in one
    # session must unpersist/clearCache after materializing it.
    hx_e = _shingle_hashes(existing).distinct().persist()
    hot = (hx_e.groupBy("x1", "x2")
           .agg(F.count(F.lit(1)).alias("df"))
           .filter(F.col("df") > DF_CAP).select("x1", "x2"))
    bands_e = _band_sigs(hx_e, hot)
    return x_fp, hot, bands_e


@query(
    "dedup_incremental",
    _INCR_ORACLE,
    doc=_INCR_DOC,
    tags=("dedup", "join", "north-star", "incremental"),
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    existing = docs.select("doc_id", "text").repartition(n_part, "doc_id")
    incoming = incremental_incoming(spark, docs)
    # in production these three artifacts are the stored index; the
    # persisted-index variant (dedup_index.py) reads them from Parquet
    x_fp, hot, bands_e = index_artifacts(spark, existing)
    return admit_incoming(incoming, x_fp, hot, bands_e)
