"""Dedup resolution: candidate pairs → connected components → canonical
document per cluster (N1's final step — what a 100 TB dedup actually
ships: a keep/drop decision, not a pair list).

Spark side: Pregel-style minimum-label propagation — a driver loop of
(join + aggregate) rounds, converging in O(cluster diameter) rounds.
Each round is fully distributed; the loop only checks a convergence
count. Oracle: DuckDB recursive CTE computing the same transitive
closure → min label. Also here: deterministic mixture resampling
(per-lang keep probabilities via content-hash uniforms), the corpus
rebalancing op every pretraining pipeline runs after dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.dedup import _corpus
from ecommerce_analytics_spark.plans.registry import query

PAIR_THRESHOLD = 0.5  # minhash est_jaccard cut for an edge

_CLUSTER_ORACLE_TEMPLATE = """
, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM cand_pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM cand_pairs
),
nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
reach AS (
  WITH RECURSIVE r AS (
    SELECT doc_id AS src, doc_id AS dst FROM nodes
    UNION
    SELECT r.src, e.b FROM r JOIN edges e ON r.dst = e.a
  ) SELECT * FROM r
)
SELECT src AS doc_id,
       min(dst) AS canonical_doc_id,
       CAST(count(DISTINCT dst) AS BIGINT) AS cluster_size,
       (src = min(dst)) AS is_canonical
FROM reach GROUP BY src
"""


def connected_components(edges: DataFrame, node_col: str = "doc_id") -> DataFrame:
    """Min-label propagation over symmetrized edges (a, b) →
    (node, label=min node id in component). Distributed per round;
    rounds = component diameter (near-dup clusters are shallow)."""
    # Materialize the (small, post-threshold) edge list ONCE: its lineage
    # is the whole candidate-pair pipeline, and without the checkpoint
    # every propagation round re-runs that pipeline from the scan up
    # (profiled: ~4 rounds × 2 recomputes ≈ 11s at sf0.1 vs ~2s after).
    sym = edges.selectExpr("a", "b") \
        .unionAll(edges.selectExpr("b AS a", "a AS b")) \
        .localCheckpoint(eager=True)
    labels = (sym.select(F.col("a").alias(node_col)).distinct()
              .withColumn("label", F.col(node_col)))
    while True:
        neighbor_min = (
            sym.join(labels, sym.b == labels[node_col])
            .groupBy(F.col("a").alias(node_col))
            .agg(F.min("label").alias("nbr_label")))
        # checkpoint BEFORE the convergence count — the count and the
        # next round then both read the materialized result instead of
        # each re-running the join (and it truncates lineage so plan
        # size stays constant across rounds). The convergence flag is
        # computed IN the same pass (a label changes iff a strictly
        # smaller neighbor label arrived) and checkpointed alongside,
        # so the per-round convergence test is a filter-count over the
        # materialized column — round 11 removed the labels-vs-labels
        # equi-join (one node-sized shuffle per round) the old
        # new-vs-old comparison paid.
        new_labels = (
            labels.join(neighbor_min, node_col, "left")
            .select(node_col,
                    F.least("label", F.coalesce("nbr_label", "label"))
                    .alias("label"),
                    (F.col("nbr_label") < F.col("label")).alias("_chg"))
            .localCheckpoint(eager=True))
        changed = new_labels.filter("_chg").count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels


def _build_cluster_oracle() -> str:
    """Wrap the full minhash oracle as a cand_pairs CTE and append the
    recursive-CTE connected-components resolution."""
    from ecommerce_analytics_spark.operators.dedup import _MINHASH_ORACLE
    body = _MINHASH_ORACLE.strip()
    head, final_select = body.rsplit("SELECT c.doc_a", 1)
    return (
        head
        + ", cand_pairs AS (SELECT * FROM (SELECT c.doc_a"
        + final_select
        + f") WHERE est_jaccard >= {PAIR_THRESHOLD})"
        + _CLUSTER_ORACLE_TEMPLATE
    )


@query(
    "dedup_clusters",
    _build_cluster_oracle(),
    doc="N1 resolution: minhash candidate pairs (est ≥ 0.5) → connected "
        "components via distributed min-label propagation → canonical "
        "doc (min id) + cluster size + keep/drop flag. Oracle: DuckDB "
        "recursive-CTE transitive closure over the same edges.",
    tags=("dedup", "north-star", "iterative"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.plans.registry import QUERIES
    pairs = QUERIES["dedup_minhash_lsh"].spark_fn(spark, sf_dir) \
        .filter(F.col("est_jaccard") >= PAIR_THRESHOLD) \
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    labels = connected_components(pairs)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(F.col("doc_id"),
                F.col("label").alias("canonical_doc_id"),
                F.col("cluster_size"),
                (F.col("doc_id") == F.col("label")).alias("is_canonical"))
    )


_RESAMPLE_WEIGHTS = {"en": 1.0, "es": 0.5, "zh": 0.25, "de": 0.75, "fr": 0.1}

# literals CAST to DOUBLE: Spark parses bare fractional literals as
# DECIMAL (DuckDB as DOUBLE) — without the cast the output types differ
_WEIGHT_CASE = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in _RESAMPLE_WEIGHTS.items())
    + " ELSE CAST(0.0 AS DOUBLE) END")

# content-hash uniform in [0,1): first 8 hex digits of md5(doc_id)
_U_SQL = ("(" + " + ".join(
    f"CAST((instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), {d + 1}, 1)) - 1) AS BIGINT)"
    f" * {16 ** (8 - 1 - d)}" for d in range(8))
    + f") / CAST({float(2 ** 32)} AS DOUBLE)")


@query(
    "corpus_resample",
    f"""
    SELECT doc_id, lang, source,
           round({_U_SQL}, 9) AS u,
           round({_WEIGHT_CASE}, 2) AS keep_prob
    FROM documents
    WHERE {_U_SQL} < {_WEIGHT_CASE}
    """,
    doc="N3 mixture resampling: per-language keep probabilities applied "
        "via content-hash uniforms — deterministic, replayable sampling "
        "(no RNG state), the standard corpus-rebalancing op. Filter is "
        "pure column arithmetic → pushed to the scan.",
    tags=("text", "sampling", "north-star"),
)
def q_corpus_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(_U_SQL)
    keep_prob = F.expr(_WEIGHT_CASE)
    return (
        docs.filter(u < keep_prob)
        .select("doc_id", "lang", "source",
                F.round(u, 9).alias("u"),
                F.round(keep_prob, 2).alias("keep_prob"))
    )


# Temperature for the data-driven mixing variant: rates ∝ share^(τ-1),
# τ<1 upsamples rare sources relative to common ones (the multilingual
# temperature-sampling rule); normalized so the rarest language keeps 1.0
# (downsample-only — no replication).
MIX_TAU = 0.5

# pow() is transcendental and not correctly-rounded across libms, so
# the keep decision compares 1e-9 FIXED-POINT snaps of both the rate
# and the uniform (same discipline as doc_unigram_logprob's ln) — the
# grid is ~1e7 x coarser than any cross-libm ulp difference.
_RATE_FIX = "CAST(round(rate * 1000000000) AS BIGINT)"
_U_FIX = f"CAST(round(({_U_SQL}) * 1000000000) AS BIGINT)"


@query(
    "corpus_temperature_mix",
    f"""
    WITH shares AS (
      SELECT lang, count(*) AS n_lang,
             CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share
      FROM documents GROUP BY lang
    ), rates AS (
      SELECT lang, n_lang, share,
             pow(share, {MIX_TAU} - 1)
               / max(pow(share, {MIX_TAU} - 1)) OVER () AS rate
      FROM shares
    )
    SELECT d.doc_id, d.lang,
           round(r.rate, 9) AS keep_rate,
           CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT)
             AS n_kept_lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_U_FIX} < {_RATE_FIX}
    """,
    doc=f"N3 temperature-based source mixing (τ={MIX_TAU}): per-language "
        f"keep rates computed FROM the corpus (rate ∝ share^(τ-1), "
        f"rarest language keeps 1.0 — the multilingual "
        f"temperature-sampling rule), applied via the same replayable "
        f"content-hash uniforms as corpus_resample. The rate table is "
        f"one tiny aggregate (|sources| rows) broadcast back onto the "
        f"scan; pow() snapped to 1e-9 fixed point before the keep "
        f"comparison so the cut is engine-independent. Output includes "
        f"the per-language kept count so the oracle certifies the "
        f"realized mixture, not just membership.",
    tags=("text", "sampling", "north-star"),
)
def q_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shares = (docs.groupBy("lang")
              .agg(F.count(F.lit(1)).alias("n_lang"))
              # |sources| rows feeding the total, the rate table and
              # its max — checkpoint once so the documents fact is
              # scanned twice (share build + the keep join), not 5x
              # (r11 scan-discipline recipe)
              .localCheckpoint(eager=True))
    total = shares.agg(F.sum("n_lang").alias("n_total"))
    rates = (shares.crossJoin(F.broadcast(total))
             .select("lang",
                     F.pow(F.col("n_lang") / F.col("n_total"),
                           MIX_TAU - 1).alias("raw")))
    rmax = rates.agg(F.max("raw").alias("rmax"))
    rates = (rates.crossJoin(F.broadcast(rmax))
             .select("lang", (F.col("raw") / F.col("rmax")).alias("rate")))
    u_fix = F.expr(_U_FIX)
    r_fix = F.expr(_RATE_FIX)
    kept = (docs.join(F.broadcast(rates), "lang")
            .filter(u_fix < r_fix)
            .select("doc_id", "lang",
                    F.round("rate", 9).alias("keep_rate")))
    w = Window.partitionBy("lang")
    return kept.select(
        "doc_id", "lang", "keep_rate",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_kept_lang"))
