"""Population Stability Index (PSI) feature-drift monitor.

The standard production data-drift metric (credit-scoring lineage,
now the default monitor in every ML-observability stack): for a
feature binned into K buckets with actual-period share p_i and
reference-period share q_i,

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i)

with the usual reading <0.1 stable / 0.1-0.25 moderate / >0.25 major
shift. [[embedding_source_drift]] (profiling.py) covers vector drift;
this is the tabular-feature counterpart over the events stream.

Setup: the events table splits at its midpoint day (exact integer
midpoint of min/max epoch-days — both engines compute the identical
split). Reference period = first half, actual = second half. Two
features are monitored, stacked into one long (feature, bin) frame:

- ``event_type`` — categorical, bins are the types themselves;
- ``value_bin``  — $50-wide buckets of the monetary value, capped at
  bin 19 (exact integer division of BIGINT cents — no float binning).

Bins are the union observed in either period; add-one (Laplace)
smoothing handles empty-on-one-side bins, so with K observed bins

    p_i = (a_i + 1) / (Na + K),   q_i = (r_i + 1) / (Nr + K).

Cross-engine exactness (the [[numerics]] / LOG_FIX discipline,
decontam.py): every input to a float op is a single ratio of exact
BIGINTs —

    ln-term: ln( (a_i+1)(Nr+K) / ((r_i+1)(Na+K)) )   (one division)
    diff:    ((a_i+1)(Nr+K) - (r_i+1)(Na+K)) / ((Na+K)(Nr+K))

their product (two deterministic doubles) is snapped to 1e-9 fixed
point per bin, and the per-feature PSI is the associative BIGINT sum
of the snapped terms — plan shape cannot change the answer.

Integer headroom: (a_i+1)*(Nr+K) <= ~N^2; at N ~ 3e9 rows per period
that is ~9e18 — the BIGINT edge. Past that, pre-scale the counts
(PSI is shift-invariant in the shares, so dividing all counts by a
common factor before the ratio changes nothing material) or upgrade
the products to DECIMAL(38,0); ANSI mode keeps the failure loud.

Scale shape: ONE aggregation over the fact table per feature (the
stacked frame is one scan + explode-free union of two map-side
projections), a groupBy on (feature, bin, period) — compact keys —
then everything else runs on the K-row bin table. No collects, no
all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

LOG_FIX = 1_000_000_000  # 1e-9 fixed point for ln() (decontam.py idiom)

_PSI_ORACLE = f"""
WITH base AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         event_type,
         least(CAST(round(value * 100) AS BIGINT) // 5000, 19) AS vbin
  FROM events
), split AS (
  SELECT (min(d) + max(d)) // 2 AS mid FROM base
), feat AS (
  SELECT CASE WHEN b.d <= s.mid THEN 'ref' ELSE 'act' END AS period,
         f.feature, f.bin
  FROM base b CROSS JOIN split s
  CROSS JOIN LATERAL (VALUES
    ('event_type', b.event_type),
    ('value_bin', CAST(b.vbin AS VARCHAR))) AS f(feature, bin)
), counts AS (
  SELECT feature, bin,
         CAST(sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END)
              AS BIGINT) AS r,
         CAST(sum(CASE WHEN period = 'act' THEN 1 ELSE 0 END)
              AS BIGINT) AS a
  FROM feat GROUP BY feature, bin
), tot AS (
  SELECT feature,
         CAST(sum(r) AS BIGINT) AS nr, CAST(sum(a) AS BIGINT) AS na,
         CAST(count(*) AS BIGINT) AS k
  FROM counts GROUP BY feature
), terms AS (
  SELECT c.feature,
         CAST(round(
           ln(CAST((c.a + 1) * (t.nr + t.k) AS DOUBLE)
              / CAST((c.r + 1) * (t.na + t.k) AS DOUBLE))
           * (CAST((c.a + 1) * (t.nr + t.k)
                   - (c.r + 1) * (t.na + t.k) AS DOUBLE)
              / CAST((t.na + t.k) * (t.nr + t.k) AS DOUBLE))
           * {LOG_FIX}) AS BIGINT) AS term_fix
  FROM counts c JOIN tot t ON t.feature = c.feature
)
SELECT t.feature, t.k AS n_bins, t.nr AS n_ref, t.na AS n_act,
       round(CAST(sum(m.term_fix) AS DOUBLE) / {LOG_FIX}, 6) AS psi
FROM terms m JOIN tot t ON t.feature = m.feature
GROUP BY t.feature, t.k, t.nr, t.na
"""


def binned_features(events: DataFrame) -> DataFrame:
    """(d epoch-day, feature, bin) stack — shared by the batch query
    and the streaming drift monitor (streaming/psi_state.py) so both
    sides bin identically."""
    base = events.select(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
        .alias("d"),
        "event_type",
        # `div` = integer division; value >= 0 so it equals DuckDB's
        # floor-division `//` — no float binning anywhere
        F.least(F.expr("cast(round(value * 100) as bigint) div 5000"),
                F.lit(19).cast("bigint")).cast("string").alias("vbin"))
    return (base.select(
        "d",
        F.explode(F.array(
            F.struct(F.lit("event_type").alias("feature"),
                     F.col("event_type").alias("bin")),
            F.struct(F.lit("value_bin").alias("feature"),
                     F.col("vbin").alias("bin")))).alias("f"))
        .select("d", "f.feature", "f.bin"))


def psi_from_counts(counts: DataFrame) -> DataFrame:
    """PSI per feature from a (feature, bin, r, a) count table — the
    exact fixed-point formula, shared by the batch query and the
    streaming parity check."""
    tot = (counts.groupBy("feature")
           .agg(F.sum("r").cast("bigint").alias("nr"),
                F.sum("a").cast("bigint").alias("na"),
                F.count(F.lit(1)).cast("bigint").alias("k")))

    terms = (counts.join(F.broadcast(tot), "feature")
             .select(
                 "feature", "nr", "na", "k",
                 F.round(
                     F.log(((F.col("a") + 1) * (F.col("nr") + F.col("k")))
                           .cast("double")
                           / ((F.col("r") + 1) * (F.col("na") + F.col("k")))
                           .cast("double"))
                     * (((F.col("a") + 1) * (F.col("nr") + F.col("k"))
                         - (F.col("r") + 1) * (F.col("na") + F.col("k")))
                        .cast("double")
                        / ((F.col("na") + F.col("k"))
                           * (F.col("nr") + F.col("k"))).cast("double"))
                     * LOG_FIX).cast("bigint").alias("term_fix")))

    return (terms.groupBy("feature", "k", "nr", "na")
            .agg(F.round(F.sum("term_fix").cast("double") / LOG_FIX, 6)
                 .alias("psi"))
            .select(F.col("feature"), F.col("k").alias("n_bins"),
                    F.col("nr").alias("n_ref"), F.col("na").alias("n_act"),
                    F.col("psi")))


@query(
    "psi_feature_drift",
    _PSI_ORACLE,
    doc="Population Stability Index drift monitor: events split at "
        "the exact integer midpoint day into reference/actual halves; "
        "event_type (categorical) and $50-bucketed value (exact "
        "integer-cent division, capped at bin 19) each scored with "
        "add-one-smoothed PSI = sum (p-q)*ln(p/q). Every float op "
        "consumes a single ratio of exact BIGINTs and the per-bin "
        "term snaps to 1e-9 fixed point before the associative "
        "integer sum (LOG_FIX discipline). One compact "
        "(feature,bin,period) aggregation over the facts; the PSI "
        "math runs on the K-row bin table.",
    tags=("profiling", "drift", "ml", "north-star"),
)
def q_psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # Pre-aggregate to (feature, bin, d) counts and checkpoint (round
    # 11, guide §2.4): the split midpoint and the ref/act counts both
    # referenced the fact-sized feature stack, re-running the scan +
    # explode in two subtrees (events×4 in the plan census). The
    # per-day count table is features × bins × days rows — tiny at
    # any corpus size — and summing its counts by period is the same
    # integer arithmetic as counting the stacked rows directly.
    feats = binned_features(events)
    pre = (feats.groupBy("feature", "bin", "d")
           .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
           .localCheckpoint(eager=True))
    split = pre.agg(
        ((F.min("d") + F.max("d")) / 2).cast("bigint").alias("mid"))
    counts = (pre.crossJoin(F.broadcast(split))
              .groupBy("feature", "bin")
              .agg(F.sum(F.when(F.col("d") <= F.col("mid"), F.col("c"))
                         .otherwise(0)).cast("bigint").alias("r"),
                   F.sum(F.when(F.col("d") > F.col("mid"), F.col("c"))
                         .otherwise(0)).cast("bigint").alias("a")))
    return psi_from_counts(counts)
