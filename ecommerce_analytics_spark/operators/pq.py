"""Product quantization (PQ) for memory-bound ANN serving.

The int8 path (similarity.py) cuts vector memory 4×; product
quantization (Jégou et al., *Product Quantization for Nearest
Neighbor Search*, TPAMI 2011) cuts it ~32×: split each (normalized)
64-dim vector into M=8 contiguous 8-dim subvectors, train a K=16-way
KMeans codebook per subspace, and store each vector as 8 four-bit
codes. Queries stay full-precision and score candidates through the
ADC (asymmetric distance computation) lookup table:

    d²(q, x) ≈ Σ_m ‖q_m − C_m[code_m(x)]‖²

Vectors are L2-normalized before encoding, so ADC euclidean ranking
is monotone-equivalent to cosine ranking (d² = 2 − 2·cos) and the
recall companion can score against the cosine brute-force baseline.

Plan shape (the 100 TB story):
* train: M small KMeans fits over one slice projection each —
  at scale, fit on a sample; the codebook is M·K·(dim/M) floats
  (1 KB here) and broadcasts everywhere;
* encode: explode to (vec, m, subvector), broadcast-join the
  codebook, pick the nearest code with a partial-aggregable
  ``min(struct(d², code))`` — the window-free argmax idiom — then
  one groupBy(vec) to assemble the code array. Map-side combine on
  both aggregations; no window, no driver collect of data rows.
* query: the per-query LUT is M·K partial distances (2 KB),
  built by a broadcast cross of queries × codebook; candidates
  explode their codes and equi-join the LUT on (query, m, code);
  one sum-aggregation yields ADC distances, a per-query top-K window
  ranks them. Candidate scoring never touches the original vectors —
  that is the point of PQ: the fact table of codes is 32× smaller
  than the embedding table it replaces.

Approximate retrieval can't hash-match per-neighbor output
cross-engine (codebooks come from iterative ML); following the
trained-IVF precedent, the raw `q_knn_pq` neighbor list is a pytest
surface and the registered `knn_pq_recall` reduces recall@k vs the
oracle-green brute-force baseline to a hash-matched boolean with a
conservative floor. The IVF×PQ composition (cell-pruned IVFADC) lives
in ``ivfpq.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.similarity import (
    N_QUERIES, TOP_K, knn_exact_baseline, norm,
)
from ecommerce_analytics_spark.plans.registry import query

PQ_M = 8         # subspaces
PQ_K = 16        # codes per subspace (4 bits)
PQ_SUBDIM = 8    # = EMB_DIM / PQ_M
PQ_SEED = 42
PQ_SHORTLIST = 50  # ADC shortlist FLOOR; grows with the corpus, below


def adaptive_shortlist(n_corpus: int, base: int = PQ_SHORTLIST,
                       frac: int = 40) -> int:
    """Shortlist that grows with the corpus: max(base, n/frac). A
    FIXED shortlist is a silently decaying recall contract — 50 of 2k
    vectors is 2.5% at sf0.1, but 50 of 20k is 0.25% at sf1.0, where
    the round-8 scale sweep measured recall@5 below the floor. At a
    fixed ratio the refine cost stays linear in corpus size per query
    (and the ADC scan already is); at the driver SFs (n ≤ 2k) the
    value equals the old constant, so every committed floor and
    sensitivity number is unchanged. IVFADC passes frac=20: residual
    quantization is coarser than plain PQ (measured sf1.0 recall@5
    0.613 at frac=40 against a 0.6 floor — too thin a margin), and
    its ADC scan is already cell-pruned, so the wider exact re-rank
    is the cheap knob."""
    return max(base, n_corpus // frac)

# Certified by knn_pq_recall below. Raw 4-bit ADC ranking alone
# measures recall@5 ≈ 0.25-0.29 on this corpus — too coarse; with the
# standard shortlist-then-refine step (exact cosine over the top-50
# ADC candidates only) measured recall@5 is 0.69/0.83/≥0.8 at
# sf0.001/0.01/0.1. A broken encode/LUT join collapses recall toward
# shortlist/corpus, far below the floor.
PQ_RECALL_FLOOR = 0.5


def _normalized(emb: DataFrame) -> DataFrame:
    """vec_id + unit-norm double embedding (cosine ⇔ euclidean).
    Zero vectors are excluded (division by zero would NULL the whole
    array and silently corrupt encode/ADC) — the same nrm > 0 guard
    every other similarity path applies."""
    n = norm(F.col("embedding"))
    return (emb.filter(n > 0)
            .select("vec_id",
                    F.transform(F.col("embedding"),
                                lambda x: x.cast("double") / n)
                    .alias("nemb")))


def _subvectors(df: DataFrame) -> DataFrame:
    """(vec_id, m, s_emb[PQ_SUBDIM]) — one row per subspace."""
    subs = F.array(*[
        F.struct(F.lit(m).alias("m"),
                 F.slice(F.col("nemb"), m * PQ_SUBDIM + 1, PQ_SUBDIM)
                 .alias("s_emb"))
        for m in range(PQ_M)])
    return (df.select("vec_id", F.explode(subs).alias("s"))
            .select("vec_id", F.col("s.m").alias("m"),
                    F.col("s.s_emb").alias("s_emb")))


PQ_TRAIN_CAP = 4096  # deterministic training-sample bound per fit


def train_sample(nemb: DataFrame) -> DataFrame:
    """Deterministic ≈PQ_TRAIN_CAP-row UNIFORM training sample.

    The earlier form (``vec_id < PQ_TRAIN_CAP``) was a PREFIX sample —
    biased at scale: a real corpus is ingest-ordered and drifts, and
    the round-8 sf1.0 sweep measured exactly that failure (codebooks
    trained on the id-prefix never saw the distribution of the rest of
    the corpus; recall@5 fell below the floor). A stride over a HASH of
    vec_id stays engine-deterministic and seed-free while covering the
    whole id range — and, unlike a raw ``vec_id % stride`` (the first
    fix), assumes nothing about id density or pattern: a post-dedup or
    filtered corpus with sparse/strided ids would alias a raw modulus
    (systematically under- or over-sampling), while xxhash64 scatters
    any id pattern uniformly. Corpora at or under the cap — every
    driver SF — take the identity path, so the committed floors and
    sensitivity tables are byte-for-byte unchanged there."""
    n = nemb.count()
    if n <= PQ_TRAIN_CAP:
        return nemb
    stride = -(-n // PQ_TRAIN_CAP)  # ceil
    return nemb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0)


def train_codebooks(spark: SparkSession, nemb: DataFrame) -> DataFrame:
    """Per-subspace KMeans codebooks: (m, code, c_emb[PQ_SUBDIM]).

    M independent small fits, each over the deterministic
    ≤ PQ_TRAIN_CAP uniform sample (train_sample) — codebook training
    cost is CONSTANT in the corpus size, the standard PQ recipe
    (train on a sample, encode everything). The result is
    PQ_M × PQ_K rows — broadcast wherever it is used.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = train_sample(nemb).cache()
    train.count()  # materialize the cache once before the fan-out

    def _fit(m: int):
        sl = train.select(array_to_vector(
            F.slice(F.col("nemb"), m * PQ_SUBDIM + 1, PQ_SUBDIM))
            .alias("fv"))
        # maxIter=10: subspace codebooks converge in a handful of
        # rounds (8-dim, 16 cells); halving the default 20 halves
        # training wall time with measured recall unchanged
        model = KMeans(k=PQ_K, seed=PQ_SEED + m, maxIter=10,
                       featuresCol="fv").fit(sl)
        return [(m, code, [float(x) for x in c])
                for code, c in enumerate(model.clusterCenters())]

    # The M subspace fits are independent (own seed, own column
    # slice) and each is a short driver-coordinated iterative job —
    # run them as CONCURRENT Spark jobs from a thread pool. Same
    # seeds + same cached input ⇒ bitwise-identical models to the
    # serial loop; wall time drops from Σ fits to ~max(fit) (the
    # scheduler interleaves the tiny per-iteration stages).
    with ThreadPoolExecutor(max_workers=PQ_M) as pool:
        rows = [r for chunk in pool.map(_fit, range(PQ_M))
                for r in chunk]
    train.unpersist()
    return spark.createDataFrame(
        rows, "m int, code int, c_emb array<double>")


def _sq_dist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)


def encode_pq(nemb: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vec_id, codes array<int>[PQ_M]) — the 32×-compressed table.

    MAP-ONLY (round 11): the codebook is collapsed to ONE broadcast
    row — an (m, code)-sorted array of M·K centroids — and each
    vector picks all M nearest codes inside a single projection:
    per subspace, build the K candidate (d², code) structs and take
    ``array_min`` (struct comparison is lexicographic, so this is
    exactly the ``min(struct(d², code))`` the previous groupBy
    computed, same tie-break on code). The previous shape exploded
    every vector ×M, broadcast-joined the codebook, and paid TWO
    corpus-sized exchanges (groupBy (vec_id, m), then groupBy vec_id
    to reassemble) — encoding is embarrassingly parallel, so at
    100 TB those exchanges were pure waste. Arithmetic is identical:
    same _sq_dist expression per (subvector, centroid), same argmin
    ordering; verified exact-equal to the former output at three SFs
    and by the quantization-error recomputation test."""
    cb_row = codebooks.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("m", "code", "c_emb")))
        .alias("_cb"))
    codes = F.array(*[
        F.array_min(F.transform(
            F.sequence(F.lit(0), F.lit(PQ_K - 1)),
            lambda c: F.struct(
                _sq_dist(
                    F.slice(F.col("nemb"), m * PQ_SUBDIM + 1, PQ_SUBDIM),
                    F.element_at(F.col("_cb"),
                                 F.lit(m * PQ_K + 1) + c)["c_emb"])
                .alias("d2"),
                c.cast("int").alias("code"))))["code"]
        for m in range(PQ_M)])
    return (nemb.crossJoin(F.broadcast(cb_row))
            .select("vec_id", codes.alias("codes")))


def adc_lut(queries: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(query_id, m, code, pd2): per-subspace partial distances."""
    qsub = _subvectors(queries).withColumnRenamed("vec_id", "query_id")
    return (qsub.join(F.broadcast(codebooks), "m")
            .select("query_id", "m", "code",
                    _sq_dist(F.col("s_emb"), F.col("c_emb"))
                    .alias("pd2")))


def adc_shortlist(codes: DataFrame, lut: DataFrame,
                  shortlist: int = PQ_SHORTLIST) -> DataFrame:
    """(query_id, neighbor_id): the top-``shortlist`` candidates per
    query by ADC distance. Shared by the in-memory and persisted
    pipelines (their exact-equality test depends on the two staying
    in lockstep).

    MAP-ONLY scoring (round 11): the per-query LUTs collapse to ONE
    broadcast row of (query_id, (m, code)-sorted partial distances);
    each code row fans out to its |Q| (query, neighbor, adc_d2)
    candidates in the projection, summing the M table lookups in
    ascending-m order — the same addition order the previous
    posexplode → broadcast-join → groupBy partial-sum produced (all M
    rows of a vector sat in one partition, in posexplode order), so
    distances are bit-identical. The old shape exchanged the ENTIRE
    |corpus|×|Q| scored set to aggregate the per-pair sums; now the
    only exchange is the per-query top-k ranking, and the rank filter
    lets WindowGroupLimit cap each map partition at ``shortlist``
    rows per query BEFORE that exchange — shuffle volume drops from
    |corpus|×|Q| rows to ≤ partitions×|Q|×shortlist."""
    lut_row = (lut.groupBy("query_id")
               .agg(F.array_sort(F.collect_list(
                   F.struct("m", "code", "pd2"))).alias("pds"))
               .groupBy()
               .agg(F.collect_list(F.struct("query_id", "pds"))
                    .alias("_luts")))
    adc_d2 = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc + F.element_at(
            F.col("q")["pds"],
            m * PQ_K + F.element_at(F.col("codes"), m + 1) + 1)["pd2"])
    scored = (codes.crossJoin(F.broadcast(lut_row))
              .select("vec_id", "codes",
                      F.explode("_luts").alias("q"))
              .filter(F.col("vec_id") != F.col("q")["query_id"])
              .select(F.col("q")["query_id"].alias("query_id"),
                      F.col("vec_id").alias("neighbor_id"),
                      adc_d2.alias("adc_d2")))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("neighbor_id"))
    return (scored.withColumn("_r", F.row_number().over(w_adc))
            .filter(F.col("_r") <= shortlist)
            .select("query_id", "neighbor_id"))


def refine_topk(shortlist: DataFrame, qv: DataFrame,
                nv: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact cosine re-rank of a shortlist: qv = (query_id, _qv),
    nv = (neighbor_id, _nv) unit vectors; touches only
    |queries| × shortlist rows."""
    cos = F.aggregate(
        F.zip_with(F.col("_qv"), F.col("_nv"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    refined = (shortlist.join(F.broadcast(qv), "query_id")
               .join(nv, "neighbor_id")
               .select("query_id", "neighbor_id", cos.alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (refined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("cos_sim", 9).alias("cos_sim"), "rank"))


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 product quantization with re-ranking (pytest surface, not
    registered).

    Unit-normalized embeddings encoded as PQ_M×4-bit codes (PQ_M
    per-subspace KMeans codebooks, k=PQ_K); queries score ALL
    candidates through the broadcast ADC lookup table — reading only
    the 32×-compressed code table — keep a top-PQ_SHORTLIST shortlist,
    and refine just those with exact cosine over the original vectors.
    Top-TOP_K per query after refinement. The trained codebooks have no
    SQL twin, so the raw neighbor listing is a pytest surface
    (tests/test_pq.py); the registry exposes the oracle-green
    ``knn_pq_recall`` companion, which runs this full pipeline
    internally and hash-matches its recall floor.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    nemb = _normalized(emb)
    n_corpus = nemb.count()
    cb = train_codebooks(spark, nemb)
    codes = encode_pq(nemb, cb)
    lut = adc_lut(nemb.filter(F.col("vec_id") < N_QUERIES), cb)
    shortlist = adc_shortlist(codes, lut,
                              shortlist=adaptive_shortlist(n_corpus))
    qv = (nemb.filter(F.col("vec_id") < N_QUERIES)
          .select(F.col("vec_id").alias("query_id"),
                  F.col("nemb").alias("_qv")))
    nv = nemb.select(F.col("vec_id").alias("neighbor_id"),
                     F.col("nemb").alias("_nv"))
    return refine_topk(shortlist, qv, nv)


@query(
    "knn_pq_recall",
    f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           CAST({TOP_K} AS INTEGER) AS k,
           CAST({N_QUERIES * TOP_K} AS BIGINT) AS n_exact_pairs,
           TRUE AS recall_floor_met
    """,
    doc=f"Driver-certifiable companion for knn_pq: recall@{TOP_K} of "
        f"ADC retrieval over the 4-bit codes, measured in Spark "
        f"against the oracle-green cosine brute-force baseline and "
        f"reduced to a hash-matched boolean (floor "
        f"{PQ_RECALL_FLOOR}). Normalization makes ADC euclidean "
        f"ranking cosine-equivalent, so the comparison is apples to "
        f"apples.",
    tags=("similarity", "ml", "north-star"),
)
def q_knn_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    exact = knn_exact_baseline(spark, sf_dir) \
        .select("query_id", "neighbor_id", "rank")
    approx = (q_knn_pq(spark, sf_dir)
              .select("query_id", "neighbor_id")
              .withColumn("hit", F.lit(1)))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .agg(F.countDistinct("query_id").alias("nq"),
             F.max("rank").alias("mk"),
             F.count(F.lit(1)).alias("np"),
             (F.sum(F.coalesce(F.col("hit"), F.lit(0)))
              / F.count(F.lit(1))).alias("recall"))
        .select(F.col("nq").alias("n_queries"),
                F.col("mk").alias("k"),
                F.col("np").alias("n_exact_pairs"),
                (F.col("recall") >= PQ_RECALL_FLOOR)
                .alias("recall_floor_met"))
    )


# ---------------------------------------------------------------------------
# Persisted PQ index: build → store → serve (the deployed shape)


def build_pq_index(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Materialize the PQ serving artifacts: ``codebooks/`` (M×K
    subspace centroids, kilobytes — always broadcast) and ``codes/``
    (vec_id → 4-bit code array, the 32×-compressed corpus). At 100 TB
    new vectors append to codes/ encoded against the FROZEN codebook;
    codebook refresh is a blue/green rebuild to a fresh path, same as
    the IVF and dedup index generations."""
    import os
    emb = load_table(spark, sf_dir, "embeddings")
    nemb = _normalized(emb)
    cb = train_codebooks(spark, nemb)
    cb.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "codebooks"))
    encode_pq(nemb, cb).write.mode("overwrite") \
        .parquet(os.path.join(path, "codes"))
    return path


def knn_pq_stored(spark: SparkSession, queries: DataFrame,
                  neighbors: DataFrame, path: str) -> DataFrame:
    """Serve a query batch against the STORED code table: broadcast
    ADC LUT from the stored codebooks, score the stored codes,
    shortlist, exact-refine. ``queries``/``neighbors`` are raw
    (vec_id, embedding) frames; a deployment stores the refinement
    vectors alongside codes/ or fetches the shortlisted ones on
    demand. Returns the refined top-K per query."""
    import os
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    nq = _normalized(queries)
    # corpus size from the stored code table (one row per encoded
    # vector, footer-cheap count) — matches the in-memory twin's
    # nemb.count() exactly, which the equality test depends on
    shortlist = adc_shortlist(
        codes, adc_lut(nq, cb),
        shortlist=adaptive_shortlist(codes.count()))
    qv = nq.select(F.col("vec_id").alias("query_id"),
                   F.col("nemb").alias("_qv"))
    nv = _normalized(neighbors).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("nemb").alias("_nv"))
    return refine_topk(shortlist, qv, nv)


def q_knn_pq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index twin of knn_pq (pytest surface, not registered).

    Codebooks + 4-bit code table written to Parquet and read back cold
    before serving — the build→store→serve round-trip of a deployed PQ
    tier. Trained codebooks aren't SQL-expressible, so retrieval
    through the store is pytest-certified (tests/test_pq.py: EXACTLY
    equal to the in-memory PQ pipeline — ints and doubles round-trip
    bit-exact through Parquet), inheriting the oracle-certified
    knn_pq_recall floor transitively. The registered oracle-green
    composition is ``knn_ivfpq_persisted_recall`` (IVF×PQ on the
    stored index).
    """
    import os
    from ecommerce_analytics_spark.io import run_tmpdir
    run_dir = run_tmpdir(prefix="pq_index_run_")
    path = build_pq_index(spark, sf_dir, os.path.join(run_dir, "index"))
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_pq_stored(spark, emb.filter(F.col("vec_id") < N_QUERIES),
                         emb, path)
