"""Graph analytics on the co-purchase graph (iterative, driver-green).

Fixed-iteration PageRank over the basket co-occurrence graph — the
"important products" ranking the recommendation family feeds on. The
interesting part is the certification: iterative float PageRank can't
hash-match across engines (per-round double sums are order-dependent),
so the WHOLE computation runs in 1e-9 fixed-point INTEGER arithmetic:

    contrib(v→u) = rank_fix(v) div deg(v)          (integer div)
    rank_fix'(u) = base_fix + (85 * Σ contrib) div 100   (d = 0.85)

Integer sums are associative and integer division is identical in both
engines (non-negative operands), so after any number of rounds the
ranks are EXACTLY equal bit-for-bit — the same discipline as the
integer-cents money sums (numerics.py), extended to an iterative
algorithm. The truncation this introduces vs float PageRank is ≤
1e-9 per edge per round — noise four orders below any ranking use.

Spark side: a driver loop building K nested (join + aggregate) rounds
over a persist()ed edge list — construction is fully lazy (no
.first(), no eager checkpoints; VERDICT r3 #4) and the whole
computation runs in the one action that executes the returned
DataFrame, rounds 2..K reading the cached edges/degrees. Oracle side:
the SAME K rounds unrolled as chained CTEs (the oracle string is
generated). At 100 TB the edge list is hash-partitioned on src and
each round is one shuffle of (dst, contrib) pairs — the canonical
Pregel-on-DataFrames shape; rank state is |V| rows, never fact-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

PR_ITERS = 5
PR_FIX = 1_000_000_000  # 1e-9 fixed point
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact ratio


def _oracle() -> str:
    cte = """
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), edges AS (
  SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs
), deg AS (
  SELECT src AS node, count(*) AS deg FROM edges GROUP BY src
), consts AS (
  SELECT count(*) AS n,
         (CAST({PR_FIX} AS BIGINT) * (100 - 85)) // (100 * count(*))
           AS base_fix,
         CAST({PR_FIX} AS BIGINT) // count(*) AS init_fix
  FROM deg
), r0 AS (
  SELECT node, deg, (SELECT init_fix FROM consts) AS rank_fix FROM deg
)""".replace("{PR_FIX}", str(PR_FIX))
    for k in range(1, PR_ITERS + 1):
        cte += f""", r{k} AS (
  SELECT d.node, d.deg,
         (SELECT base_fix FROM consts)
           + ({PR_D_NUM} * sum(r.rank_fix // r.deg)) // {PR_D_DEN}
           AS rank_fix
  FROM edges e JOIN r{k - 1} r ON e.src = r.node
  JOIN deg d ON e.dst = d.node
  GROUP BY d.node, d.deg
)"""
    return cte + f"""
SELECT node AS product_id, CAST(deg AS BIGINT) AS degree,
       CAST(rank_fix AS BIGINT) AS pagerank_fix
FROM r{PR_ITERS}
"""


@query(
    "product_pagerank",
    _oracle(),
    doc=f"Iterative PageRank ({PR_ITERS} rounds, d=0.85) over the "
        f"basket co-purchase graph, computed ENTIRELY in 1e-9 "
        f"fixed-point integer arithmetic so the iterative result "
        f"hash-matches the oracle exactly (associative integer sums + "
        f"identical integer division — the integer-cents discipline "
        f"extended to an iterative algorithm; truncation error ≤1e-9 "
        f"per edge-round). One (dst, contrib) shuffle per round, rank "
        f"state = |V| rows; edges/degrees persist()ed across rounds "
        f"and construction fully lazy. Oracle: the same {PR_ITERS} "
        f"rounds unrolled as generated chained CTEs.",
    tags=("graph", "iterative", "join", "north-star"),
)
def q_product_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    basket = lineitem.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").alias("src"),
                     F.col("b.l_partkey").alias("dst"))
             .distinct())
    # persist(), not localCheckpoint(): checkpoint EXECUTES the plan
    # at construction under AQE (Dataset.checkpoint goes through .rdd,
    # which materializes query stages), while persist is genuinely
    # lazy — the cache populates during the single action that
    # executes the returned DataFrame, and rounds 2..K read the cached
    # edge/degree tables instead of re-scanning lineitem. The cached
    # sets are |E| int pairs / |V| rows (never fact-sized); a long
    # session evicts them LRU. Fixed K=5 keeps the nested plan
    # shallow, so no lineage truncation is needed (unbounded-round
    # loops — dedup_resolve.py — still checkpoint per round).
    edges = (pairs.unionAll(pairs.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst")))
             .persist())
    deg = (edges.groupBy(F.col("src").alias("node"))
           .agg(F.count(F.lit(1)).alias("deg"))
           .persist())
    # The two per-node-count scalars stay IN the plan as a broadcast
    # one-row aggregate (mirroring the oracle's `consts` CTE) instead
    # of a driver-side .first(): query construction runs no jobs
    # beyond the parquet footer read every scan pays. Attached via
    # explicit broadcast crossJoin — a 1-row build side, the same
    # scalar-attach shape as funnels/sketches (a literal-key equi-join
    # would constant-fold back to this exact plan anyway).
    consts = deg.agg(
        F.expr(f"CAST({PR_FIX} AS BIGINT) * {PR_D_DEN - PR_D_NUM} "
               f"div ({PR_D_DEN} * count(1))").alias("base_fix"),
        F.expr(f"CAST({PR_FIX} AS BIGINT) div count(1)").alias("init_fix"))

    ranks = (deg.crossJoin(F.broadcast(consts))
             .select("node", "deg", F.col("init_fix").alias("rank_fix")))
    for _ in range(PR_ITERS):
        contribs = (edges.join(ranks, edges.src == ranks.node)
                    .select(F.col("dst"),
                            F.expr("rank_fix div deg").alias("c"))
                    .groupBy("dst")
                    .agg(F.sum("c").alias("s")))
        ranks = (deg.join(contribs, deg.node == contribs.dst)
                 .crossJoin(F.broadcast(consts))
                 .select("node", "deg",
                         (F.col("base_fix")
                          + F.expr(f"({PR_D_NUM} * s) div {PR_D_DEN}"))
                         .alias("rank_fix")))
    return ranks.select(F.col("node").alias("product_id"),
                        F.col("deg").cast("bigint").alias("degree"),
                        F.col("rank_fix").cast("bigint")
                        .alias("pagerank_fix"))
