"""Weighted sampling without replacement, per group, two-phase top-K.

The training-data curation primitive corpus_resample (Bernoulli
thinning) can't provide: draw EXACTLY K documents per language with
inclusion probability proportional to document weight (here n_chars —
"sample long documents preferentially, fixed budget per language").

Algorithm: Efraimidis–Spirakis A-ES (IPL 2006). Each row draws a
uniform u and gets key u^(1/w); the top-K keys per group are exactly
a weighted sample without replacement. Ranking by ln(u)/w is the
monotone-equivalent form that avoids pow's overflow corner. u is the
repo's standard content-hash uniform (first 8 md5 hex digits of
doc_id → integer / 2^32, shifted into (0,1)) — deterministic,
replayable, no RNG state, identical bit pattern in both engines.

Scale shape: a per-group window with only ~5 language groups is 5
reducers no matter how many executors — the classic group-skew trap.
The sampler runs TWO phases: phase 1 partitions by (lang, salt16)
(salt = low bits of the same content hash) and keeps each salt's
local top-K via one window; phase 2 re-windows over lang on the
≤ 16·K survivors per group. Any row in the true global top-K is
necessarily in its salt's local top-K, so the two-phase result is
exactly the single-phase result — the same argument as skew.py's
salted aggregation, applied to order statistics. At 100 TB phase 1
fans out across 16× more reducers and phase 2 touches ≤ 16·K·groups
rows total.

Output columns are integers/strings only (lang, doc_id, n_chars,
rk); the float sampling key never leaves the plan, so the driver's
exact value hash does not depend on last-ulp ln() agreement between
engines — only the selected SET does, which is stable for
well-separated hash uniforms (nearest-key gaps are ~2^-32-scale,
ten orders of magnitude above 1 ulp).

The DuckDB oracle runs the straightforward single-phase ranking —
certifying the salted two-phase decomposition exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.sketches import _cms_hex_sql
from ecommerce_analytics_spark.plans.registry import query

K = 25
SALTS = 16

# content-hash integer in [0, 2^32): first 8 hex digits of md5(doc_id)
# (the repo's shared hex-parse primitive — one definition, both engines)
_H_SQL = _cms_hex_sql("md5(CAST(doc_id AS STRING))")
# uniform strictly inside (0,1): (h+1)/(2^32+1) — ln() never sees 0
_U_SQL = f"(CAST({_H_SQL} + 1 AS DOUBLE) / CAST({2 ** 32 + 1} AS DOUBLE))"
# A-ES ranking key ln(u)/w, maximized; weight w = n_chars (≥1 guarded)
_KEY_SQL = f"(ln({_U_SQL}) / CAST(greatest(n_chars, 1) AS DOUBLE))"


def weighted_sample_per_group(df: DataFrame, group_col: str, k: int = K,
                              salts: int = SALTS) -> DataFrame:
    """Exact per-group weighted sample without replacement (A-ES),
    two-phase salted top-K. ``df`` needs doc_id + n_chars columns."""
    keyed = df.withColumn("_key", F.expr(_KEY_SQL)) \
              .withColumn("_salt", F.expr(f"{_H_SQL} % {salts}"))
    w1 = (Window.partitionBy(group_col, "_salt")
          .orderBy(F.desc("_key"), "doc_id"))
    local = (keyed.withColumn("_lrk", F.row_number().over(w1))
             .filter(F.col("_lrk") <= k))
    w2 = Window.partitionBy(group_col).orderBy(F.desc("_key"), "doc_id")
    return (local.withColumn("rk", F.row_number().over(w2))
            .filter(F.col("rk") <= k)
            .drop("_key", "_salt", "_lrk"))


_WS_ORACLE = f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         ln({_U_SQL}) / CAST(greatest(n_chars, 1) AS DOUBLE) AS key
  FROM documents
), ranked AS (
  SELECT lang, doc_id, n_chars,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY key DESC, doc_id) AS INT) AS rk
  FROM keyed
)
SELECT lang, doc_id, n_chars, rk FROM ranked WHERE rk <= {K}
"""


@query(
    "weighted_sample_per_lang", _WS_ORACLE,
    doc="Efraimidis–Spirakis weighted sampling without replacement: "
        "exactly 25 docs per language, inclusion ∝ n_chars, via "
        "content-hash uniforms and the ln(u)/w ranking key. Spark "
        "side runs the salted TWO-phase top-K (16 salt partitions "
        "then a ≤400-row final window per group — no 5-reducer "
        "bottleneck); oracle is the single-phase ranking. Exact "
        "decomposition, integer/string output only.",
    tags=("sampling", "window", "northstar", "skew"),
)
def q_weighted_sample_per_lang(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents") \
        .select("lang", "doc_id", "n_chars")
    return (weighted_sample_per_group(docs, "lang")
            .select("lang", "doc_id", "n_chars",
                    F.col("rk").cast("int").alias("rk")))
