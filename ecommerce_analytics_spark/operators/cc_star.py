"""Large-star/small-star connected components (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).

The existing resolution path (dedup_resolve.connected_components) is
minimum-label propagation: simple, exact, but it converges in
O(component diameter) rounds — fine for shallow near-dup clusters,
pathological for chain-shaped components (a 10k-link chain of
pairwise-similar shards takes 10k rounds). The star algorithm
alternates two edge rewrites that each keep components intact while
monotonically lowering node–root distances, converging in O(log n)
rounds REGARDLESS of diameter — the shape a 100 TB dedup graph needs.

Per round, with m(u) = min({u} ∪ Γ(u)):

- large-star: for every neighbor v of u with v > u, replace (u, v)
  with (v, m(u)) — strictly-larger neighbors re-attach to u's local
  minimum.
- small-star: direct every edge high→low; for node u, re-attach every
  smaller-or-equal neighbor (and u itself) to m(u).

Both steps are a groupBy-min plus an equi-join back on the node key —
two compact shuffles per round, no collects, edge count never grows
above the input. Converged state is a star forest: every node is
directly attached to its component minimum.

The registered query resolves the SAME minhash candidate pairs as
``dedup_clusters`` and shares its recursive-CTE oracle — both
algorithms must produce the identical component labeling, so the two
registrations cross-certify each other on top of the DuckDB gate.
Reference: the repo-wide N1 resolution step (SURVEY §2 N1);
convergence-rate contrast is pinned in tests/test_cc_star.py (a
64-node path resolves in ≤ ~6 star rounds where label propagation
needs 63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.dedup_resolve import (
    PAIR_THRESHOLD, _build_cluster_oracle)
from ecommerce_analytics_spark.plans.registry import query


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected form: (a, b) with a > b, self-loops
    dropped, deduplicated."""
    return (edges
            .select(F.greatest("a", "b").alias("a"),
                    F.least("a", "b").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v>u) → (v, m(u)). Works on the symmetrized neighbor list so
    m(u) sees ALL neighbors, then keeps only the larger-side emits."""
    sym = edges.unionAll(edges.select(F.col("b").alias("a"),
                                      F.col("a").alias("b")))
    mins = sym.groupBy("a").agg(
        F.least(F.min("b"), F.first("a")).alias("m"))
    return _canon(
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b")))


def _small_star(edges: DataFrame, canonical: bool = False) -> DataFrame:
    """On high→low directed edges: every node's smaller neighbors
    (and the node itself) re-attach to its local minimum.

    ``canonical=True`` skips the input normalization when the caller
    already holds a canonical edge set (_large_star output is one by
    construction) — the redundant distinct cost a full edge-set
    exchange + hash aggregate every round (round-11 plan census)."""
    directed = edges if canonical else _canon(edges)  # a > b per row
    mins = directed.groupBy("a").agg(F.min("b").alias("m"))
    with_min = directed.join(mins, "a")
    leaf_emits = (with_min.filter(F.col("b") != F.col("m"))
                  .select(F.col("b").alias("a"), F.col("m").alias("b")))
    self_emits = mins.select(F.col("a"), F.col("m").alias("b"))
    return _canon(leaf_emits.unionAll(self_emits))


def connected_components_star(edges: DataFrame,
                              node_col: str = "doc_id",
                              max_rounds: int = 50) -> tuple[DataFrame, int]:
    """Alternating large-star/small-star to a fixed point; returns
    (labels, rounds) where labels = (node_col, label=component min).

    Each round localCheckpoints the edge set (truncating lineage so
    plan size stays constant) and unpersists the superseded round
    (ADVICE r4 graph.py hygiene). Fixed point is edge-set equality —
    both rewrites preserve components, so the converged star forest
    IS the exact CC answer.
    """
    cur = _canon(edges).localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        nxt = _small_star(_large_star(cur),
                          canonical=True).localCheckpoint(eager=True)
        # Fixed-point test = symmetric-difference count. Both sides are
        # distinct sets (_canon output), so tagging rows ±1 and keeping
        # groups with a non-zero sum counts exactly |nxt Δ cur| in ONE
        # shuffle of the two (checkpointed, tiny) edge sets — the
        # previous nxt.exceptAll(cur) + cur.exceptAll(nxt) ran two
        # separate jobs, each exchanging both sides (round 11).
        changed = (nxt.withColumn("_s", F.lit(1))
                   .unionAll(cur.withColumn("_s", F.lit(-1)))
                   .groupBy("a", "b").agg(F.sum("_s").alias("_d"))
                   .filter(F.col("_d") != 0).count())
        cur.unpersist()
        cur = nxt
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"star CC did not converge in {max_rounds} rounds")
    # star forest: leaves point at their root; roots have no outgoing
    # high→low edge and label themselves
    leaf_labels = cur.groupBy(F.col("a").alias(node_col)).agg(
        F.min("b").alias("label"))
    root_labels = (cur.select(F.col("b").alias(node_col)).distinct()
                   .join(leaf_labels, node_col, "left_anti")
                   .withColumn("label", F.col(node_col)))
    return leaf_labels.unionAll(root_labels), rounds


@query(
    "dedup_clusters_star",
    _build_cluster_oracle(),
    doc="N1 resolution by the O(log n)-round large-star/small-star "
        "algorithm (Kiveris et al. SoCC'14) over the same minhash "
        "candidate pairs as dedup_clusters — identical exact output "
        "(components, canonical min-id, sizes, keep/drop), different "
        "convergence law: label propagation is O(diameter) rounds, "
        "stars are O(log n) regardless of diameter, which is what a "
        "100 TB chain-shaped dedup graph needs. Per round: two "
        "groupBy-min + equi-join rewrites, edge count never grows, "
        "no collects. Shares dedup_clusters' recursive-CTE oracle, "
        "so the two algorithms cross-certify each other.",
    tags=("dedup", "north-star", "iterative", "graph", "scale"),
)
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.plans.registry import QUERIES
    pairs = QUERIES["dedup_minhash_lsh"].spark_fn(spark, sf_dir) \
        .filter(F.col("est_jaccard") >= PAIR_THRESHOLD) \
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    labels, _ = connected_components_star(pairs)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(F.col("doc_id"),
                F.col("label").alias("canonical_doc_id"),
                F.col("cluster_size"),
                (F.col("doc_id") == F.col("label")).alias("is_canonical"))
    )
