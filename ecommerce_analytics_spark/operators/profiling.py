"""Dataset profiling + deterministic splits (pipeline ops tooling).

- ``events_profile`` — deequ-style column profile of the events
  table: one row per column with row/null/distinct counts and
  min/max rendered as strings. The whole profile is ONE aggregate
  pass (every metric for every column in a single scan — the
  profiling shape that matters at 100 TB; a per-column loop of
  scans is the anti-pattern).
- ``corpus_split`` — deterministic hash-based train/val/test split
  (90/5/5) of the documents table: split assignment from the same
  content-hash uniform family as corpus_resample (replayable, no RNG
  state, stable under reprocessing — the property a training
  pipeline needs so a re-run never moves a document across splits),
  reported as per-(lang, split) counts so the oracle certifies both
  membership and realized proportions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.dedup_resolve import _U_SQL
from ecommerce_analytics_spark.plans.registry import query

_PROFILE_COLS = ("event_id", "user_id", "event_type", "value")

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(min({c}) AS VARCHAR) AS min_value,
           CAST(max({c}) AS VARCHAR) AS max_value
    FROM events""" for c in _PROFILE_COLS)


@query(
    "events_profile",
    _PROFILE_ORACLE,
    doc="deequ-style table profile: row/null/distinct counts and "
        "min/max per column, computed for ALL columns in one "
        "aggregate pass over one scan (the count-distincts expand to "
        "one partial-agg each under the same exchange; a per-column "
        "scan loop is the anti-pattern at 100 TB). min/max rendered "
        "as strings so one schema fits every column type.",
    tags=("agg", "validation"),
)
def q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__dist"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = events.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("column_name"),
                 F.col(f"{c}__n").alias("n_rows"),
                 F.col(f"{c}__null").alias("n_null"),
                 F.col(f"{c}__dist").alias("n_distinct"),
                 F.col(f"{c}__min").alias("min_value"),
                 F.col(f"{c}__max").alias("max_value"))
        for c in _PROFILE_COLS])
    return (wide.select(F.explode(rows).alias("r"))
            .select("r.column_name", "r.n_rows", "r.n_null",
                    "r.n_distinct", "r.min_value", "r.max_value"))


SPLIT_VAL, SPLIT_TEST = 0.90, 0.95  # [0,.90) train, [.90,.95) val, rest test

_SPLIT_CASE = (f"CASE WHEN {_U_SQL} < {SPLIT_VAL} THEN 'train' "
               f"WHEN {_U_SQL} < {SPLIT_TEST} THEN 'val' "
               f"ELSE 'test' END")


@query(
    "corpus_split",
    f"""
    SELECT lang, {_SPLIT_CASE} AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id,
           CAST(max(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    GROUP BY lang, {_SPLIT_CASE}
    """,
    doc="Deterministic 90/5/5 train/val/test split via content-hash "
        "uniforms (replayable — a re-run never moves a document "
        "across splits, the stability property training pipelines "
        "need; no RNG state to manage). Reported as per-(lang, split) "
        "counts + id ranges so the oracle certifies membership and "
        "realized proportions; the assignment itself is a pushed-down "
        "scalar expression, zero extra passes.",
    tags=("text", "sampling", "north-star"),
)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = F.expr(_SPLIT_CASE)
    return (docs.groupBy("lang", split.alias("split"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").alias("min_doc_id"),
                 F.max("doc_id").alias("max_doc_id")))


# ---------------------------------------------------------------------------
# PCA sufficient statistics (exact fixed-point covariance accumulation)

COV_FIX = 1_000_000  # 1e-6 fixed point per embedding coordinate

_COV_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, CAST(g.i AS INTEGER) AS dim,
         CAST(round(CAST(embedding[g.i] AS DOUBLE) * {COV_FIX})
              AS BIGINT) AS xf
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS g(i)
)
SELECT a.dim AS dim_i, b.dim AS dim_j,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(a.xf) AS BIGINT) AS sum_i,
       CAST(sum(b.xf) AS BIGINT) AS sum_j,
       CAST(sum(a.xf * b.xf) AS BIGINT) AS sum_ij
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim
"""


def upper_triangle_terms(emb):
    """(dim_i, dim_j, xi, xj) upper-triangle outer-product terms,
    emitted MAP-SIDE from each embedding row (one flatten-explode, no
    coordinate-table self-join). xi/xf are the shared 1e-6 fixed-point
    longs. Shared with eigen._iterated_vector's stats pass."""
    xfa = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * COV_FIX).cast("long"))
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.size("xfa")),
        lambda i: F.transform(
            F.sequence(i, F.size("xfa")),
            lambda j: F.struct(
                i.cast("int").alias("dim_i"),
                j.cast("int").alias("dim_j"),
                F.element_at(F.col("xfa"), i).alias("xi"),
                F.element_at(F.col("xfa"), j).alias("xj")))))
    return (emb.select(F.col("vec_id"), xfa.alias("xfa"))
            .select("vec_id", F.explode(pairs).alias("t"))
            .select("vec_id", "t.dim_i", "t.dim_j", "t.xi", "t.xj"))


@query(
    "embedding_covariance_stats",
    _COV_ORACLE,
    doc="PCA's data-intensive half in one exact pass: the upper-"
        "triangle covariance sufficient statistics (n, Si, Sj, Sij) "
        "of the 64-dim embeddings, coordinates snapped to 1e-6 fixed "
        "point so every sum is an associative BIGINT — hash-certified "
        "across engines, which float covariance sums cannot be. The "
        "64x64 eigen-solve on the resulting 2080-row matrix is "
        "driver-side O(d^3) — data-size-independent. At 100 TB the "
        "same statistics accumulate via per-partition outer products "
        "(mapInPandas + numpy) merged by addition; the relational "
        "formulation here is the certifiable reference semantics.",
    tags=("ml", "agg", "north-star"),
)
def q_embedding_covariance_stats(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Map-side outer products over per-vec_id column sums (round 11).
    # This query's oracle joins the exploded coordinate table with
    # itself ON vec_id with NO dedup, so duplicate deliveries of a
    # vec_id carry cross-copy semantics: k delivered rows with
    # per-dim column-sum vector S contribute k^2 rows to each (i, j)
    # group, k*S_i to sum_i, k*S_j to sum_j and S_i*S_j to sum_ij
    # (Σ_{a,b} x_i(a)·x_j(b) = S_i·S_j). One groupBy(vec_id) over the
    # raw embedding arrays reproduces exactly that — a single n-row
    # array exchange, vs the coordinate self-join's TWO (n·d)-row
    # exchanges — and each aggregated vector then emits its weighted
    # upper-triangle terms map-side. On unique vec_ids (every real
    # corpus) k=1 and S is the vector itself, so the terms reduce to
    # the plain per-vector outer product. Integer sums throughout:
    # accumulation order cannot change the result.
    xfa = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * COV_FIX).cast("long"))
    per_vec = (emb.select("vec_id", xfa.alias("xfa"))
               .groupBy("vec_id")
               .agg(F.count(F.lit(1)).cast("long").alias("k"),
                    F.collect_list("xfa").alias("copies")))
    col_sum = F.aggregate(
        "copies",
        F.transform(F.element_at("copies", 1),
                    lambda _: F.lit(0).cast("long")),
        lambda acc, arr: F.zip_with(acc, arr, lambda p, q: p + q))
    terms = F.flatten(F.transform(
        F.sequence(F.lit(1), F.size("s")),
        lambda i: F.transform(
            F.sequence(i, F.size("s")),
            lambda j: F.struct(
                i.cast("int").alias("dim_i"),
                j.cast("int").alias("dim_j"),
                F.element_at(F.col("s"), i).alias("si"),
                F.element_at(F.col("s"), j).alias("sj")))))
    return (per_vec.select("k", col_sum.alias("s"))
            .select("k", F.explode(terms).alias("t"))
            .select("k", "t.dim_i", "t.dim_j", "t.si", "t.sj")
            .groupBy("dim_i", "dim_j")
            .agg(F.sum(F.col("k") * F.col("k")).cast("long").alias("n"),
                 F.sum(F.col("k") * F.col("si")).cast("long")
                 .alias("sum_i"),
                 F.sum(F.col("k") * F.col("sj")).cast("long")
                 .alias("sum_j"),
                 F.sum(F.col("si") * F.col("sj"))
                 .cast("long").alias("sum_ij")))


_DRIFT_ORACLE = f"""
WITH ex AS (
  SELECT vec_id, CAST(g.i AS INTEGER) AS dim,
         CAST(round(CAST(embedding[g.i] AS DOUBLE) * {COV_FIX})
              AS BIGINT) AS xf
  FROM embeddings,
       unnest(generate_series(1, len(embedding))) AS g(i)
), per AS (
  SELECT d.source, e.dim, CAST(sum(e.xf) AS HUGEINT) AS s,
         CAST(count(*) AS HUGEINT) AS ns
  FROM ex e JOIN documents d ON d.doc_id = e.vec_id
  GROUP BY d.source, e.dim
), corpus AS (
  SELECT dim, CAST(sum(s) AS HUGEINT) AS sc,
         CAST(sum(ns) AS HUGEINT) AS nc
  FROM per GROUP BY dim
), b2 AS (
  SELECT CAST(sum(sc * sc) AS HUGEINT) AS b2 FROM corpus
), terms AS (
  SELECT p.source, p.ns, c.nc,
         p.s * c.sc AS dotterm, p.s * p.s AS aterm,
         (c.nc * p.s - p.ns * c.sc)
           * (c.nc * p.s - p.ns * c.sc) AS l2term
  FROM per p JOIN corpus c ON c.dim = p.dim
)
SELECT t.source, CAST(t.ns AS BIGINT) AS n_docs,
       round(CAST(sum(t.dotterm) AS DOUBLE)
             / (sqrt(CAST(sum(t.aterm) AS DOUBLE))
                * sqrt(CAST(b.b2 AS DOUBLE))), 6) AS cos_centroid,
       round(sqrt(CAST(sum(t.l2term) AS DOUBLE))
             / (CAST(t.ns AS DOUBLE) * CAST(t.nc AS DOUBLE)
                * {COV_FIX}), 6) AS l2_centroid
FROM terms t CROSS JOIN b2 b
GROUP BY t.source, t.ns, t.nc, b.b2
"""


@query(
    "embedding_source_drift",
    _DRIFT_ORACLE,
    doc="Embedding-drift monitor per source: cosine and L2 distance "
        "between each source's embedding centroid and the corpus "
        "centroid — the representation-shift alarm for a multi-source "
        "ingest. The 1/n normalizations CANCEL in the cosine "
        "(cos(mean_s, mean_c) = Sum(S_sd*S_cd) / (|S_s||S_c|)) and "
        "cross-multiply out of the L2 numerator ((nc*S_sd - "
        "ns*S_cd)^2), so with 1e-6 fixed-point coordinates (the "
        "COV_FIX discipline) EVERY accumulated term is an exact "
        "integer; the only float ops are the final sqrt/divide. One "
        "coordinate explode joined to the doc dimension, per-(source,"
        "dim) aggregation, the corpus centroid derived from THAT "
        "aggregate — never a second pass over the vectors.",
    tags=("ml", "agg", "north-star", "multimodal"),
)
def q_embedding_source_drift(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    _DEC = "decimal(38,0)"
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    ex = (emb.select("vec_id", F.posexplode("embedding")
                     .alias("dim0", "x"))
          .select("vec_id",
                  (F.col("dim0") + 1).cast("int").alias("dim"),
                  F.round(F.col("x").cast("double") * COV_FIX)
                  .cast("long").alias("xf")))
    # Checkpoint the per-(source, dim) sums (sources × 64 rows — data-
    # size independent): the corpus rollup, the b2 scalar and the term
    # join all re-derive from materialized rows instead of re-running
    # the coordinate explode + doc join three times (embeddings×3 +
    # documents×3 in the plan census; round 11, guide §2.4).
    per = (ex.join(docs.select(F.col("doc_id").alias("vec_id"),
                               "source"), "vec_id")
           .groupBy("source", "dim")
           .agg(F.sum("xf").cast(_DEC).alias("s"),
                F.count(F.lit(1)).cast(_DEC).alias("ns"))
           .localCheckpoint(eager=True))
    corpus = (per.groupBy("dim")
              .agg(F.sum("s").alias("sc"), F.sum("ns").alias("nc")))
    b2 = corpus.groupBy().agg(
        F.sum(F.col("sc") * F.col("sc")).alias("b2"))
    diff = F.col("nc") * F.col("s") - F.col("ns") * F.col("sc")
    terms = (per.join(corpus, "dim")
             .select("source", "ns", "nc",
                     (F.col("s") * F.col("sc")).alias("dotterm"),
                     (F.col("s") * F.col("s")).alias("aterm"),
                     (diff * diff).alias("l2term")))
    return (terms.join(F.broadcast(b2))
            .groupBy("source", "ns", "nc", "b2")
            .agg(F.sum("dotterm").alias("dot"),
                 F.sum("aterm").alias("a2"),
                 F.sum("l2term").alias("l2"))
            .select(
                "source", F.col("ns").cast("long").alias("n_docs"),
                F.round(F.col("dot").cast("double")
                        / (F.sqrt(F.col("a2").cast("double"))
                           * F.sqrt(F.col("b2").cast("double"))), 6)
                .alias("cos_centroid"),
                F.round(F.sqrt(F.col("l2").cast("double"))
                        / (F.col("ns").cast("double")
                           * F.col("nc").cast("double") * COV_FIX), 6)
                .alias("l2_centroid")))
