"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004).

Unsupervised corpus keywording: rank words by WEIGHTED PageRank over
the word-adjacency graph (an undirected edge per adjacent token pair,
weighted by corpus-wide co-occurrence count), then take the top 100.
TF-IDF ([[tfidf_top_terms]]) scores words by document contrast; this
ranks them by graph centrality — the two classic keyword families.

Certification follows graph.py's integer discipline, extended to
WEIGHTED PageRank (the new surface vs [[product_pagerank]]):

    contrib(v→u) = (rank_fix(v) * w(v,u)) div strength(v)
    rank_fix'(u) = base_fix + (85 * Σ contrib) div 100

with strength(v) = Σ_u w(v,u). Integer sums are associative and
integer division identical in both engines, so the 5-round ranks are
bit-exact; the oracle unrolls the same rounds as generated CTEs.
Multiplying BEFORE the div keeps truncation ≤1e-9 per edge-round
(rank_fix ~1e9, weights ≤ ~1e6 at this corpus — the product is ≤
~1e15, inside BIGINT; at a 100 TB corpus pre-divide the weight row
by gcd or upgrade to DECIMAL(38) — ANSI keeps overflow loud).

Top-k tie-break is total: (textrank_fix DESC, word) — exact integer
ranks make the ordering engine-independent, so LIMIT 100 is safe to
hash.

Scale shape: one bigram projection of the corpus (map-side), one
(lo,hi) count shuffle to build weighted edges, |V|-row rank state,
one (dst, contrib) shuffle per round over the persist()ed edge list,
TakeOrderedAndProject for the top-k. No collects, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query
from ecommerce_analytics_spark.sqlkit import ngram_positions

TR_ITERS = 5
TR_FIX = 1_000_000_000  # 1e-9 fixed point
TR_D_NUM, TR_D_DEN = 85, 100  # damping 0.85 as an exact ratio
TR_TOP_K = 100


def _oracle() -> str:
    cte = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), adj AS (
  SELECT least(t[i], t[i + 1]) AS lo, greatest(t[i], t[i + 1]) AS hi
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS s(i)
  WHERE t[i] <> t[i + 1]
), pairs AS (
  SELECT lo, hi, CAST(count(*) AS BIGINT) AS w FROM adj GROUP BY lo, hi
), edges AS (
  SELECT lo AS src, hi AS dst, w FROM pairs
  UNION ALL SELECT hi AS src, lo AS dst, w FROM pairs
), deg AS (
  SELECT src AS node, CAST(sum(w) AS BIGINT) AS strength
  FROM edges GROUP BY src
), consts AS (
  SELECT count(*) AS n,
         (CAST({TR_FIX} AS BIGINT) * ({TR_D_DEN} - {TR_D_NUM}))
           // ({TR_D_DEN} * count(*)) AS base_fix,
         CAST({TR_FIX} AS BIGINT) // count(*) AS init_fix
  FROM deg
), r0 AS (
  SELECT node, strength,
         (SELECT init_fix FROM consts) AS rank_fix FROM deg
)"""
    for k in range(1, TR_ITERS + 1):
        cte += f""", r{k} AS (
  SELECT d.node, d.strength,
         (SELECT base_fix FROM consts)
           + ({TR_D_NUM} * sum((r.rank_fix * e.w) // r.strength))
             // {TR_D_DEN} AS rank_fix
  FROM edges e JOIN r{k - 1} r ON e.src = r.node
  JOIN deg d ON e.dst = d.node
  GROUP BY d.node, d.strength
)"""
    return cte + f"""
SELECT node AS word, CAST(strength AS BIGINT) AS strength,
       CAST(rank_fix AS BIGINT) AS textrank_fix
FROM r{TR_ITERS}
ORDER BY textrank_fix DESC, word
LIMIT {TR_TOP_K}
"""


@query(
    "textrank_keywords",
    _oracle(),
    doc=f"TextRank keyword extraction: weighted PageRank "
        f"({TR_ITERS} rounds, d=0.85) over the word-adjacency graph "
        f"(edges = adjacent token pairs, weight = corpus co-occurrence "
        f"count), top {TR_TOP_K} words by rank. Entirely 1e-9 "
        f"fixed-point integer arithmetic — contrib = (rank*w) div "
        f"strength — so the iterative weighted ranks hash-match the "
        f"unrolled-CTE oracle bit-for-bit, and the (rank DESC, word) "
        f"tie-break makes the LIMIT deterministic. One bigram "
        f"projection, one (lo,hi) count shuffle, per-round (dst, "
        f"contrib) shuffles over persist()ed edges, "
        f"TakeOrderedAndProject top-k.",
    tags=("text", "graph", "iterative", "north-star"),
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    adj = (docs.select(F.split("text", " ").alias("t"))
           .select(F.expr(
               f"explode(transform({ngram_positions('t', 2)}, "
               "i -> struct(least(element_at(t, i), element_at(t, i + 1)) "
               "AS lo, greatest(element_at(t, i), element_at(t, i + 1)) "
               "AS hi)))").alias("p"))
           .filter(F.col("p.lo") != F.col("p.hi"))
           .select("p.lo", "p.hi"))
    pairs = adj.groupBy("lo", "hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("w"))
    # Layout (round 11, the product_pagerank recipe — graph.py): the
    # weighted edge list is cached HASH-PARTITIONED ON src AND SORTED
    # WITHIN PARTITIONS, so every round's edges⋈ranks sort-merge join
    # needs no exchange and no sort on the edge side (only the
    # |V|-row ranks side moves), and the strength aggregation rides
    # the same partitioning exchange-free. Before, each of the 5
    # rounds re-exchanged and re-sorted the full edge list — at sf0.1
    # this query was the slowest non-streaming plan in the registry
    # (min 23.7s Spark-side, noop sink).
    edges = (pairs.select(F.col("lo").alias("src"),
                          F.col("hi").alias("dst"), "w")
             .unionAll(pairs.select(F.col("hi").alias("src"),
                                    F.col("lo").alias("dst"), "w"))
             .repartition("src")
             .sortWithinPartitions("src")
             .persist())
    deg = (edges.groupBy(F.col("src").alias("node"))
           .agg(F.sum("w").cast("bigint").alias("strength"))
           .sortWithinPartitions("node")
           .persist())
    consts = deg.agg(
        F.expr(f"CAST({TR_FIX} AS BIGINT) * {TR_D_DEN - TR_D_NUM} "
               f"div ({TR_D_DEN} * count(1))").alias("base_fix"),
        F.expr(f"CAST({TR_FIX} AS BIGINT) div count(1)").alias("init_fix"))

    ranks = (deg.crossJoin(F.broadcast(consts))
             .select("node", "strength",
                     F.col("init_fix").alias("rank_fix")))
    for _ in range(TR_ITERS):
        contribs = (edges.join(ranks, edges.src == ranks.node)
                    .select(F.col("dst"),
                            F.expr("(rank_fix * w) div strength").alias("c"))
                    .groupBy("dst")
                    .agg(F.sum("c").alias("s")))
        ranks = (deg.join(contribs, deg.node == contribs.dst)
                 .crossJoin(F.broadcast(consts))
                 .select("node", "strength",
                         (F.col("base_fix")
                          + F.expr(f"({TR_D_NUM} * s) div {TR_D_DEN}"))
                         .alias("rank_fix")))
    return (ranks
            .select(F.col("node").alias("word"),
                    F.col("strength").cast("bigint").alias("strength"),
                    F.col("rank_fix").cast("bigint").alias("textrank_fix"))
            .orderBy(F.col("textrank_fix").desc(), "word")
            .limit(TR_TOP_K))
