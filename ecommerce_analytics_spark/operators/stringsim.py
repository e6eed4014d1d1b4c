"""Approximate string-similarity join (edit distance ≤ d).

Fuzzy entity matching — "which product names are near-duplicates of
each other" — is the string-side sibling of the embedding/MinHash
near-dup families in dedup.py. Spark has no native similarity join;
the naive formulation is a quadratic theta-join with a levenshtein
predicate, which is a cross product at plan time (a scale-killer; the
registry-wide no-cartesian invariant would reject it).

The scalable shape (Gravano et al., *Approximate String Joins in a
Database (Almost) for Free*, VLDB 2001) is positional q-gram blocking:

1. **Distinct-first.** Join the DISTINCT attribute values, not the
   rows. Real catalogs deduplicate massively (this dataset: ~64
   distinct names over 20k parts at sf0.1; a 100 TB catalog behaves
   the same) — match once per value pair, map back by equi-join.
2. **Length filter.** |len(a) − len(b)| ≤ d, else distance > d.
3. **Positional q-gram count filter.** Each edit operation destroys
   at most q of a string's (len − q + 1) q-grams, and shifts
   surviving gram positions by at most d. So if lev(a,b) ≤ d, the
   pair shares at least  max(len_a, len_b) − q + 1 − q·d  q-gram
   occurrences matching on (gram, |pos_a − pos_b| ≤ d). Counting
   DISTINCT matched (pos_a, pos_b) pairs only over-counts, so the
   candidate set stays a superset — completeness holds. The filter
   is only complete when that threshold is ≥ 1, i.e. every string is
   at least q·(d+1) chars; shorter values are routed through a tiny
   all-pairs fallback block (empty here: min name length 7 ≥ 6).
4. **Exact verify.** Built-in ``levenshtein`` (JVM, codegen) on the
   surviving candidates only.

At 100 TB the plan is: one shuffle to distinct values + counts, a
gram-explode (len − q + 1 rows per distinct value) equi-joined on the
gram string, a count-filter aggregation, and an exact verify — all
hash joins on short string/int keys, no cross product anywhere. The
DuckDB oracle runs the naive quadratic join over the distinct values,
certifying that blocking + verify equals the exhaustive semantics.

Reference tie-in: the reference has no fuzzy matching at all; its
product identity is exact StockCode equality
(data_loader.py:136-141). This operator is what its catalog would
need the moment descriptions drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

Q = 2          # q-gram order
MAX_DIST = 2   # edit-distance threshold


def similarity_join_distinct(vals: DataFrame, text_col: str,
                             q: int = Q, d: int = MAX_DIST) -> DataFrame:
    """Edit-distance-≤ d self-join over a frame of DISTINCT string
    values. ``vals`` must carry ``text_col`` plus any payload columns
    (they ride along both sides suffixed _a/_b). Returns one row per
    unordered pair (val_a < val_b) with ``edit_dist``.

    Completeness requires every value be ≥ q*(d+1) chars (the q-gram
    count-filter threshold stays ≥ 1); callers with shorter values
    must route them through an explicit short-block fallback. The
    precondition is ENFORCED at runtime (ADVICE r4): an in-plan
    ``assert_true`` on each value poisons the job with a clear error
    instead of silently dropping true pairs — a per-row JVM predicate,
    no extra action or shuffle.
    """
    min_len = q * (d + 1)
    # fused into the text column itself (a dropped side-column would
    # be pruned by Catalyst and the guard silently optimized away)
    vals = vals.withColumn(text_col, F.when(
        F.length(text_col) >= min_len, F.col(text_col)).otherwise(
        F.raise_error(F.concat(F.lit(
            f"similarity_join_distinct: value shorter than "
            f"q*(d+1)={min_len} chars breaks the Gravano count-filter "
            f"completeness bound — route short values through an "
            f"all-pairs short block: "), F.col(text_col)))))
    a = vals.select(*[F.col(c).alias(f"{c}_a") for c in vals.columns])
    b = vals.select(*[F.col(c).alias(f"{c}_b") for c in vals.columns])
    ta, tb = f"{text_col}_a", f"{text_col}_b"

    ga = a.withColumn("_g", F.explode(F.expr(
        f"transform(sequence(1, greatest(length({ta}), {q}) - {q} + 1), "
        f"i -> struct(i AS pos, substring({ta}, i, {q}) AS gram))")))
    gb = b.withColumn("_g", F.explode(F.expr(
        f"transform(sequence(1, greatest(length({tb}), {q}) - {q} + 1), "
        f"i -> struct(i AS pos, substring({tb}, i, {q}) AS gram))")))

    # Equi-join on the gram string; position band and ordering are
    # post-join filters on already-hash-matched rows.
    cand = (ga.join(gb, ga["_g.gram"] == gb["_g.gram"])
            .filter(F.col(ta) < F.col(tb))
            .filter(F.abs(F.length(ta) - F.length(tb)) <= d)
            .filter(F.abs(ga["_g.pos"] - gb["_g.pos"]) <= d)
            .select(ta, tb, ga["_g.pos"].alias("_pa"),
                    gb["_g.pos"].alias("_pb"),
                    *[c for c in a.columns if c != ta],
                    *[c for c in b.columns if c != tb])
            .distinct())

    group_cols = ([ta, tb] + [c for c in a.columns if c != ta]
                  + [c for c in b.columns if c != tb])
    counted = (cand.groupBy(*group_cols)
               .agg(F.count(F.lit(1)).alias("_shared")))
    thresh = (F.greatest(F.length(ta), F.length(tb)) - q + 1
              - F.lit(q * d))
    return (counted.filter(F.col("_shared") >= thresh)
            .withColumn("edit_dist",
                        F.levenshtein(F.col(ta), F.col(tb)))
            .filter(F.col("edit_dist") <= d)
            .drop("_shared"))


_FUZZY_ORACLE = f"""
WITH names AS (
  -- string-similarity contract (both sides): a NULL name has no
  -- grams and no edit distance — without the filter the in-plan
  -- min-length guard fires on the NULL group
  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
  FROM part WHERE p_name IS NOT NULL GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {MAX_DIST}
"""


@query(
    "fuzzy_name_match", _FUZZY_ORACLE,
    doc="Approximate string-similarity self-join over distinct part "
        "names: positional 2-gram blocking (length filter + "
        "Gravano count filter) then exact levenshtein ≤ 2 verify. "
        "The DuckDB oracle runs the naive quadratic distinct-pair "
        "join — blocked candidates + verify must equal exhaustive "
        "semantics exactly. Distinct-first keeps the 100 TB shape: "
        "one shuffle to (name, count), gram equi-join over ~64 "
        "distinct values regardless of row count.",
    tags=("stringsim", "join", "northstar"),
)
def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # NULL names excluded by contract (oracle's names CTE twin)
    names = (part.filter(F.col("p_name").isNotNull())
             .groupBy("p_name")
             .agg(F.count(F.lit(1)).cast("long").alias("n_parts")))
    pairs = similarity_join_distinct(names, "p_name")
    return pairs.select(
        F.col("p_name_a").alias("name_a"),
        F.col("p_name_b").alias("name_b"),
        F.col("edit_dist").cast("int").alias("edit_dist"),
        F.col("n_parts_a"), F.col("n_parts_b"))
