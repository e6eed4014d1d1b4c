"""Top principal component by power iteration — iterative linear
algebra under the integer-exactness discipline.

``embedding_covariance_stats`` (profiling.py) certifies PCA's
data-intensive half: exact fixed-point covariance sufficient
statistics. This module runs the eigen-solve itself INSIDE the engine
as an iterative query — the PageRank recipe (graph.py) applied to
linear algebra:

* the covariance NUMERATOR matrix ``C = n·Σxy − Σx·Σy`` is exact
  128-bit integer arithmetic (DECIMAL(38,0) Spark-side, HUGEINT in
  the oracle) over the same 1e-6 fixed-point coordinates — no
  division, so no rounding choice to diverge;
* each power-iteration round is an exact integer mat-vec (64-row
  join + associative integer sum — plan-shape independent), followed
  by ONE deterministic float step: rescale to L∞ = 1e6 fixed point
  (integer → double is round-to-nearest in both engines, the divide
  and round are single IEEE ops);
* the oracle unrolls the same rounds as generated chained CTEs, so
  the ITERATES — not just the limit — hash-match bitwise.

Scale: the matrix build is one (vec_id-join, dim-pair groupBy) pass,
2080 upper-triangle rows regardless of corpus size; every iteration
is a 64×64-row join. At 100 TB only the sufficient-statistics pass
touches data (per-partition outer products merged by addition); the
iteration is data-size independent. Sign and convergence are fixed
by the deterministic e_1 start; tests/test_eigen.py checks the
result against numpy's full eigendecomposition (cosine ≈ 1) — the
cross-engine hash only certifies both engines agree, numpy certifies
they agree on the RIGHT answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.profiling import COV_FIX
from ecommerce_analytics_spark.plans.registry import query

# 80 rounds: the synthetic embedding cloud's spectrum is near-flat
# (lambda2/lambda1 ~= 0.932, measured in tests/test_eigen.py's numpy
# twin), so 25 rounds only reaches cos ~= 0.990 to the true top
# eigenvector; 80 reaches ~0.999997. Per-round magnitude is bounded by
# the L-inf rescale, so the round count does not change overflow
# behavior — only plan length (linear: 2 tiny projections/round).
EIG_ITERS = 80
EIG_FIX = 1_000_000       # L-inf fixed point of the iterated vector


def _cov_cte() -> str:
    """Chained CTEs: ex → upper-triangle stats → full C matrix."""
    # MATERIALIZED: DuckDB inlines plain CTEs, so `cov` (referenced by
    # all 25 unrolled rounds) would re-expand to the parquet self-join
    # 25x — "Too many open files" and a 25x re-scan. Materializing the
    # 2080-row upper triangle makes the unrolled chain scan the data
    # exactly once. (Spark-side equivalence is unaffected: these are
    # the same relational definitions.)
    return f"""ex AS MATERIALIZED (
  SELECT vec_id, CAST(g.i AS INTEGER) AS dim,
         CAST(round(CAST(embedding[g.i] AS DOUBLE) * {COV_FIX})
              AS BIGINT) AS xf
  FROM (SELECT DISTINCT * FROM embeddings) emb_u,
       unnest(generate_series(1, len(embedding))) AS g(i)
), st AS MATERIALIZED (
  SELECT a.dim AS dim_i, b.dim AS dim_j,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(a.xf) AS HUGEINT) AS sum_i,
         CAST(sum(b.xf) AS HUGEINT) AS sum_j,
         CAST(sum(a.xf * b.xf) AS HUGEINT) AS sum_ij
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY a.dim, b.dim
), upper_c AS (
  SELECT dim_i, dim_j, n * sum_ij - sum_i * sum_j AS c FROM st
), cov AS MATERIALIZED (
  SELECT dim_i, dim_j, c FROM upper_c
  UNION ALL
  SELECT dim_j AS dim_i, dim_i AS dim_j, c FROM upper_c
  WHERE dim_i <> dim_j
), v0 AS (
  SELECT dim_i AS dim,
         CASE WHEN dim_i = 1 THEN CAST({EIG_FIX} AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS v
  FROM (SELECT DISTINCT dim_i FROM cov)
)"""


def _iter_cte(k: int) -> str:
    # Both per-round CTEs MATERIALIZED: v{k} references w{k} twice
    # (FROM + the max() scalar subquery), so plain-CTE inlining doubles
    # the expression tree per round — 2^25 by the last iterate. This is
    # the oracle-side mirror of the Spark-side pushdown blowup the
    # localCheckpoint guards against; each materialization is 64 rows.
    return f""", w{k} AS MATERIALIZED (
  SELECT c.dim_i AS dim, sum(c.c * v.v) AS w
  FROM cov c JOIN v{k - 1} v ON v.dim = c.dim_j
  GROUP BY c.dim_i
), v{k} AS MATERIALIZED (
  SELECT dim,
         CAST(round(CAST(w AS DOUBLE) * {EIG_FIX}
                    / (SELECT max(abs(CAST(w AS DOUBLE))) FROM w{k}))
              AS BIGINT) AS v
  FROM w{k}
)"""


def _eig_oracle() -> str:
    cte = "WITH " + _cov_cte()
    for k in range(1, EIG_ITERS + 1):
        cte += _iter_cte(k)
    last = f"v{EIG_ITERS}"
    return cte + f""", wfin AS (
  SELECT c.dim_i AS dim, sum(c.c * v.v) AS w
  FROM cov c JOIN {last} v ON v.dim = c.dim_j
  GROUP BY c.dim_i
), rayleigh AS (
  SELECT CAST(sum(v.v * w.w) AS DOUBLE) AS num,
         CAST(sum(v.v * v.v) AS DOUBLE) AS den
  FROM {last} v JOIN wfin w ON w.dim = v.dim
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS nv
  FROM (SELECT DISTINCT * FROM embeddings)
), l2 AS (
  SELECT sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm FROM {last}
)
SELECT v.dim, v.v AS v_fix,
       round(CAST(v.v AS DOUBLE) / l2.nrm, 6) AS v_unit,
       round(rayleigh.num / rayleigh.den
             / (nn.nv * nn.nv * {COV_FIX} * {COV_FIX}.0), 10)
         AS eigval_cov
FROM {last} v, rayleigh, nn, l2
"""


def _fixed_point_expand(emb: DataFrame) -> DataFrame:
    """(vec_id, dim, xf): 1e-6 fixed-point coordinates, the shared
    integer representation of the embedding cloud (mirrors the
    oracle's ``ex`` CTE)."""
    return (emb.select("vec_id", F.posexplode("embedding")
                       .alias("dim0", "x"))
            .select("vec_id",
                    (F.col("dim0") + 1).cast("int").alias("dim"),
                    F.round(F.col("x").cast("double") * COV_FIX)
                    .cast("long").alias("xf")))


def _iterated_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stats pass + EIG_ITERS power-iteration rounds; returns
    a ONE-ROW frame (nv, cmat, v) — nv the vector count, cmat the
    64x64 integer covariance numerator (eagerly checkpointed; the only
    thing that ever touched the corpus), v the final L-inf=1e6
    fixed-point iterate, computed as a single runtime fold. Shared by
    the eigenvector query and the PCA-projection query."""
    from ecommerce_analytics_spark.operators.profiling import (
        upper_triangle_terms)
    dec = "decimal(38,0)"
    # Map-side outer products (round 11, mirrors the
    # embedding_covariance_stats rewrite): each vector emits its own
    # upper-triangle terms from the embedding array — no coordinate
    # self-join, no pre-aggregation exchange; integer sums make
    # accumulation order irrelevant. The identity contract stays: one
    # row per delivered vector via .distinct() (dup probe, round 7) —
    # the term COUNT per pair is the vector count either way, but a
    # duplicate-delivery row must not double its outer product.
    st = (upper_triangle_terms(
        load_table(spark, sf_dir, "embeddings").distinct())
          .groupBy("dim_i", "dim_j")
          .agg(F.count(F.lit(1)).cast(dec).alias("n"),
               F.sum("xi").cast(dec).alias("sum_i"),
               F.sum("xj").cast(dec).alias("sum_j"),
               F.sum(F.col("xi") * F.col("xj")).cast(dec)
               .alias("sum_ij")))
    upper = st.select(
        "dim_i", "dim_j", "n",
        (F.col("n") * F.col("sum_ij")
         - F.col("sum_i") * F.col("sum_j")).alias("c"))
    cov = upper.unionAll(
        upper.filter(F.col("dim_i") != F.col("dim_j"))
        .select(F.col("dim_j").alias("dim_i"),
                F.col("dim_i").alias("dim_j"), "n", "c"))

    # Collapse the (tiny, data-size-independent) matrix to ONE row of
    # nested arrays; every iteration then happens inside a single
    # projection — no per-round joins, shuffles, or plan growth. The
    # oracle keeps the relational chained-CTE formulation: exact
    # integer arithmetic makes the two formulations value-identical.
    rows = (cov.groupBy("dim_i")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("dim_j", "c"))),
                lambda s: s["c"]).alias("crow"),
                F.max("n").alias("n")))
    mat = (rows.groupBy()
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("dim_i", "crow"))),
               lambda s: s["crow"]).alias("cmat"),
               F.max("n").cast("double").alias("nv")))
    # Materialize the one-row matrix at construction (the KMeans/ALS
    # builder precedent — this query is in the plan-census skip list):
    # leaving the scan→explode→self-join→nested-collect lineage under
    # the 160-stage iteration chain makes AQE re-optimize that whole
    # subtree after every barrier stage, which never finishes. The
    # checkpointed intermediate is ONE row of 64×64 numbers —
    # data-size independent — and the stats job that builds it is the
    # only stage that ever touches the corpus. The vector count rides
    # along from the stats pass itself (st.n IS the vector count), so
    # the checkpointed plan contains no join — Dataset.localCheckpoint
    # goes through .rdd, which does not drive broadcast-exchange
    # subtrees in this path and would hang on one.
    one = mat.localCheckpoint(eager=True)

    v0 = F.transform(F.sequence(F.lit(1), F.size(F.col("cmat"))),
                     lambda j: F.when(j == 1, F.lit(EIG_FIX))
                     .otherwise(F.lit(0)).cast("long"))
    # All EIG_ITERS rounds run as ONE runtime fold inside a single
    # projection: aggregate(sequence(1, K), v0, step). An earlier
    # formulation chained 2 projections + a repartition(1) barrier per
    # round (160 single-row stages ≈ 20s of pure scheduling at any
    # data size) because naming `w` as a COLUMN makes CollapseProject
    # substitute its tree into every reference — doubling per round,
    # 2^80 expression nodes without the barriers. Higher-order
    # functions don't have that problem: the rescale binds the mat-vec
    # result to a LAMBDA VARIABLE (via transform over a 1-element
    # array), so referencing it twice (max + rescale) is a variable
    # read, not a tree substitution, and the loop itself is runtime
    # iteration — the expression tree is one step deep regardless of
    # K. Arithmetic is unchanged and bitwise-identical: same
    # decimal(38,0) mat-vec, same single IEEE divide-and-round per
    # round (oracle parity re-certified after the rewrite).
    def _step(acc, _k):
        w = _matvec(acc)
        return F.element_at(
            F.transform(
                F.array(w),
                lambda wv: F.transform(
                    wv,
                    lambda y: F.round(
                        y.cast("double") * EIG_FIX
                        / F.array_max(F.transform(
                            wv, lambda z: F.abs(z.cast("double"))))
                    ).cast("long"))),
            1)

    v_final = F.aggregate(
        F.sequence(F.lit(1), F.lit(EIG_ITERS)), v0, _step)
    # One projection over the checkpointed one-row matrix: nothing for
    # downstream InferFiltersFromGenerate pushdown to blow up (the
    # fold is a single linear expression), so no trailing checkpoint
    # is needed either.
    return one.select("nv", "cmat", v_final.alias("v"))


def _matvec(vec):
    dec = "decimal(38,0)"
    return F.transform(
        F.col("cmat"),
        lambda row: F.aggregate(
            F.zip_with(row, vec, lambda c, x: c * x),
            F.lit(0).cast(dec), lambda acc, y: acc + y))


@query(
    "embedding_top_eigvec",
    _eig_oracle(),
    doc=f"Top principal component of the embedding cloud by "
        f"{EIG_ITERS}-round power iteration, the eigen-solve run as "
        f"an iterative query under the PageRank integer discipline: "
        f"exact 128-bit covariance numerator (n·Σxy − Σx·Σy, no "
        f"division), exact integer mat-vec per round, one "
        f"deterministic IEEE rescale (L∞ → 1e6 fixed point) per "
        f"round — so the iterate sequence is engine-exact and the "
        f"final vector + Rayleigh eigenvalue hash-match the oracle's "
        f"unrolled chained CTEs bitwise. Matrix build is one "
        f"vec-join/dim-pair pass (2080 rows out regardless of corpus "
        f"size); iterations are data-size independent 64×64 joins. "
        f"numpy cross-check in tests/test_eigen.py certifies the "
        f"answer itself, not just cross-engine agreement.",
    tags=("ml", "iterative", "north-star", "scale"),
)
def q_embedding_top_eigvec(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(38,0)"
    df = _iterated_vector(spark, sf_dir)
    df = df.select("nv", "v", _matvec(F.col("v")).alias("wfin")) \
           .repartition(1)
    num = F.aggregate(
        F.zip_with(F.col("v"), F.col("wfin"), lambda x, y: y * x),
        F.lit(0).cast(dec), lambda acc, y: acc + y).cast("double")
    den = F.aggregate(
        F.transform(F.col("v"), lambda x: x * x),
        F.lit(0).cast("long"), lambda acc, y: acc + y).cast("double")
    final = (df.select("nv", F.col("v").alias("vfinal"),
                       num.alias("num"), den.alias("den"))
             .repartition(1)
             .select("vfinal",
                     F.sqrt(F.col("den")).alias("nrm"),
                     F.round(F.col("num") / F.col("den")
                             / (F.col("nv") * F.col("nv")
                                * float(COV_FIX) * float(COV_FIX)), 10)
                     .alias("eigval_cov")))
    return (final.select(
        F.posexplode("vfinal").alias("dim0", "v_fix"),
        "nrm", "eigval_cov")
        .select((F.col("dim0") + 1).cast("int").alias("dim"),
                "v_fix",
                F.round(F.col("v_fix").cast("double") / F.col("nrm"), 6)
                .alias("v_unit"),
                "eigval_cov"))


PCA_TOP_OUTLIERS = 20


def _pca_outlier_oracle() -> str:
    cte = "WITH " + _cov_cte()
    for k in range(1, EIG_ITERS + 1):
        cte += _iter_cte(k)
    last = f"v{EIG_ITERS}"
    return cte + f""", proj AS MATERIALIZED (
  SELECT e.vec_id, CAST(sum(e.xf * v.v) AS HUGEINT) AS p
  FROM ex e JOIN {last} v ON v.dim = e.dim
  GROUP BY e.vec_id
), tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(p) AS HUGEINT) AS sp
  FROM proj
), l2 AS (
  SELECT sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm FROM {last}
)
SELECT p.vec_id, CAST(p.p AS BIGINT) AS proj_fix,
       round(CAST(t.n * p.p - t.sp AS DOUBLE)
             / (CAST(t.n AS DOUBLE) * l2.nrm * {COV_FIX}), 6)
         AS centered_score
FROM proj p, tot t, l2
ORDER BY abs(t.n * p.p - t.sp) DESC, p.vec_id
LIMIT {PCA_TOP_OUTLIERS}
"""


@query(
    "embedding_pca_outliers",
    _pca_outlier_oracle(),
    doc=f"PCA-projection outlier detection: every embedding is "
        f"projected onto the {EIG_ITERS}-round power-iteration "
        f"principal axis (the certified embedding_top_eigvec vector) "
        f"and the top {PCA_TOP_OUTLIERS} by |mean-centered score| are "
        f"returned — the classic 'which documents sit at the extreme "
        f"of the dominant variance direction' corpus-audit query. "
        f"The projection is an exact integer dot (1e-6 fixed-point "
        f"coords × 1e-6 fixed-point axis), centering is the "
        f"division-free n·p − Σp form, and the outlier ORDER is "
        f"decided on those exact integers — only the reported score "
        f"divides back to embedding units. Plan: the 64-row axis "
        f"broadcasts into one (vec_id)-aggregated pass over the "
        f"coordinates, a broadcast scalar attaches n/Σp, top-k is "
        f"TakeOrderedAndProject — one data-sized shuffle total.",
    tags=("ml", "similarity", "north-star", "scale"),
)
def q_embedding_pca_outliers(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    dec = "decimal(38,0)"
    vrow = _iterated_vector(spark, sf_dir)
    vexp = (vrow.select(F.posexplode("v").alias("dim0", "vv"))
            .select((F.col("dim0") + 1).cast("int").alias("dim"), "vv"))
    ex = _fixed_point_expand(
        # identity contract: the vec_id self-join fans quadratically on
        # duplicate-delivery rows while the vector count grows linearly
        # (dup probe, round 7) — one row per delivered vector
        load_table(spark, sf_dir, "embeddings").distinct())
    proj = (ex.join(F.broadcast(vexp), "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.col("xf").cast(dec) * F.col("vv"))
                 .cast(dec).alias("p")))
    tot = proj.groupBy().agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("p").cast(dec).alias("sp"))
    l2 = vexp.groupBy().agg(
        F.sqrt(F.sum(F.col("vv") * F.col("vv")).cast("double"))
        .alias("nrm"))
    centered = F.col("n") * F.col("p") - F.col("sp")
    return (proj.join(F.broadcast(tot)).join(F.broadcast(l2))
            .select("vec_id",
                    F.col("p").cast("long").alias("proj_fix"),
                    F.round(centered.cast("double")
                            / (F.col("n").cast("double") * F.col("nrm")
                               * COV_FIX), 6).alias("centered_score"),
                    F.abs(centered).alias("_o"))
            .orderBy(F.desc("_o"), F.asc("vec_id"))
            .limit(PCA_TOP_OUTLIERS)
            .drop("_o"))
