"""KMV (k-minimum-values / bottom-k theta) distinct sketches.

The gap this family fills next to the HLL pipeline (sketches.py): HLL
union-merges, but it CANNOT estimate intersections or differences
except by inclusion-exclusion, whose error grows with the union. A
KMV / theta sketch keeps the k smallest hash values of the set; the
k-th minimum gives the cardinality estimate, and because the sketch
retains the actual hash SAMPLE, set algebra (A ∩ B, A \\ B) falls out
of membership tests on the retained hashes — the Apache DataSketches
theta-sketch recipe.

Why it certifies harder than HLL: the sketch is a pure deterministic
function of the input set (k smallest distinct md5-derived hashes),
so unlike HLL (engine-specific register layouts) the WHOLE pipeline —
sketch, estimate, and set algebra — hash-matches a DuckDB oracle
bitwise. This is the one approximate-distinct family where the
cross-engine oracle certifies the estimates themselves, not just an
accuracy envelope.

Scale shape (the 100 TB story): the sketch build is a two-phase
bounded aggregation — per (group, input-partition) partial k-minima
first, then a merge of partials — so the shuffle carries at most
K values per (group, partition) instead of every distinct user the
way countDistinct does. Merging partial sketches = taking the k
smallest of the union of per-partial minima, which equals the k
smallest over the whole group (any of the k smallest overall is among
the k smallest of its own partition): sketches are exactly mergeable,
so per-day sketches roll up to ranges for free, same as the stored
HLL table. tests/test_kmv.py pins both properties (partition-count
invariance of the sketch, merge == direct).

Estimator: with hashes uniform on [0, M), E[h_(k)/M] = k/(n+1), so
n̂ = (k-1)·M / h_(k); when the group holds fewer than k distinct
hashes the sketch IS the set and the count is exact. Relative
standard error ≈ 1/sqrt(k-2) ≈ 6.3% at K=256; the emitted
within-tolerance booleans use a >3σ bound so they hold
deterministically on the driver corpora at every SF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

KMV_K = 256
HEX_DIGITS = 12                 # 48-bit hash: exact in IEEE double
KMV_M = 16 ** HEX_DIGITS        # hash domain size 2^48
# (K-1)·M as a float literal injected VERBATIM into both engines so
# the division is the same IEEE operation on both sides. 255·2^48
# needs 8 mantissa bits — exactly representable.
KMV_NUM = float((KMV_K - 1) * KMV_M)
KMV_TOL = 0.25                  # ~4σ at K=256


def kmv_hash(col: str) -> Column:
    """48-bit uniform hash: first 12 hex digits of md5 → BIGINT.
    Mirrors `_kmv_hash_sql` digit for digit (the dedup/CMS portable
    md5 primitive, dedup.py:_hex_chunk_sql)."""
    return F.expr(
        f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, "
        f"{HEX_DIGITS}), 16, 10) AS BIGINT)")


def _kmv_hash_sql(col: str) -> str:
    """DuckDB twin of kmv_hash: instr-based hex parse (no shared
    hex-to-int builtin across the two engines)."""
    md5 = f"md5(CAST({col} AS VARCHAR))"
    return "(" + " + ".join(
        f"CAST((instr('0123456789abcdef', substring({md5}, {d + 1}, 1)) - 1)"
        f" AS BIGINT) * {16 ** (HEX_DIGITS - 1 - d)}"
        for d in range(HEX_DIGITS)) + ")"


def kmv_minima(df: DataFrame, keys: list[str], hcol: str = "h",
               k: int = KMV_K) -> DataFrame:
    """K smallest distinct hashes per key group as a sorted array.

    Two-phase: per (keys, input-partition) partial minima first —
    collect_set is bounded by the partition's rows, and the shuffle
    that follows carries at most k values per (group, partition) —
    then a merge whose per-group state is ≤ k·n_partitions values.
    Neither phase ever holds a group's full distinct set on one node,
    which is the whole point vs exact countDistinct at 100 TB.
    """
    mins = F.slice(F.array_sort(F.collect_set(hcol)), 1, k).alias("mins")
    part = (df.groupBy(*keys, F.spark_partition_id().alias("_pid"))
            .agg(mins))
    return (part.select(*keys, F.explode("mins").alias(hcol))
            .groupBy(*keys)
            .agg(mins))


def _est(mins: Column) -> Column:
    """Cardinality estimate from a sorted minima array (UNROUNDED —
    round only at output so downstream algebra uses full precision
    identically on both engines)."""
    n = F.size(mins)
    return (F.when(n < F.lit(KMV_K), n.cast("double"))
            .otherwise(F.lit(KMV_NUM)
                       / F.element_at(mins, -1).cast("double")))


def _est_sql(k: str, hk: str) -> str:
    return (f"CASE WHEN {k} < {KMV_K} THEN CAST({k} AS DOUBLE) "
            f"ELSE {KMV_NUM!r} / CAST({hk} AS DOUBLE) END")


@query(
    "kmv_shipped_orders_by_year",
    f"""
    WITH eh AS (
      SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
             {_kmv_hash_sql('l_orderkey')} AS h, l_orderkey
      FROM lineitem
    ), hx AS (
      SELECT DISTINCT ship_year, h FROM eh
    ), rk AS (
      SELECT ship_year, h,
             row_number() OVER (PARTITION BY ship_year ORDER BY h) AS rn
      FROM hx
    ), sk AS (
      SELECT ship_year, CAST(count(*) AS BIGINT) AS n_mins, max(h) AS hk
      FROM rk WHERE rn <= {KMV_K} GROUP BY ship_year
    ), grk AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM hx)
    ), gsk AS (
      SELECT CAST(count(*) AS BIGINT) AS n_mins, max(h) AS hk
      FROM grk WHERE rn <= {KMV_K}
    ), ex AS (
      SELECT ship_year,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_uniques
      FROM eh GROUP BY ship_year
    ), gex AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_uniques
      FROM eh
    ), unrounded AS (
      SELECT sk.ship_year, sk.n_mins,
             {_est_sql('sk.n_mins', 'sk.hk')} AS est, ex.exact_uniques
      FROM sk JOIN ex ON ex.ship_year = sk.ship_year
      UNION ALL
      SELECT CAST(NULL AS BIGINT) AS ship_year, gsk.n_mins,
             {_est_sql('gsk.n_mins', 'gsk.hk')} AS est, gex.exact_uniques
      FROM gsk, gex
    )
    SELECT ship_year, n_mins, round(est, 4) AS est_uniques, exact_uniques,
           abs(est - exact_uniques) <= {KMV_TOL} * exact_uniques
             AS est_within_tol
    FROM unrounded
    """,
    doc="KMV bottom-k distinct sketch of orders shipped per year "
        "(l_orderkey has ~4× row multiplicity in lineitem, so this is "
        "a genuine dedup-then-count): two-phase bounded-shuffle sketch "
        "build (≤K hashes per (year, partition) cross the wire, never "
        "the distinct set), per-year estimates through the (k-1)·M/h_k "
        "estimator, and a global row computed by MERGING the yearly "
        "sketches — the stored-sketch rollup pattern with, unlike HLL, "
        "the estimates themselves hash-matched against the DuckDB "
        "oracle (deterministic k-minima + injected-literal IEEE math). "
        "Exact countDistinct rides along as the certification column "
        "with a 4σ within-tolerance boolean; per-year cardinalities "
        "exceed K from sf0.001 up, so the estimator path (not the "
        "exact small-set path) is what the driver certifies.",
    tags=("agg", "sketch", "approx", "scale"),
)
def q_kmv_shipped_orders_by_year(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    # ONE lineitem scan (round 11, guide §2.4; was lineitem×4 in the
    # plan census): every leg — yearly sketch, global sketch, per-year
    # exact, global exact — is a function of the distinct
    # (ship_year, orderkey) pairs, which are orders-sized, so dedup
    # once, checkpoint, and derive. kmv_minima's collect_set is
    # distinct-insensitive, so hashing the deduped pairs yields
    # bit-identical minima; countDistinct over the pairs equals the
    # raw-table countDistinct by definition.
    du = (lineitem.select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        "l_orderkey")
        .distinct().localCheckpoint(eager=True))
    hashed = du.select("ship_year", kmv_hash("l_orderkey").alias("h"))
    # yearly feeds both the global-sketch merge and the per-year
    # report — checkpoint the K-minima rows (tiny) so the sketch pass
    # runs once
    yearly = kmv_minima(hashed, ["ship_year"]).localCheckpoint(eager=True)
    glob = kmv_minima(yearly.select(F.explode("mins").alias("h")), [])

    exact = (du.groupBy("ship_year")
             .agg(F.countDistinct("l_orderkey").alias("exact_uniques")))
    gexact = du.agg(
        F.countDistinct("l_orderkey").alias("exact_uniques"))

    per_year = (yearly.join(exact, "ship_year")
                .select("ship_year",
                        F.size("mins").cast("long").alias("n_mins"),
                        _est(F.col("mins")).alias("est"),
                        "exact_uniques"))
    total = (glob.crossJoin(F.broadcast(gexact))
             .select(F.lit(None).cast("long").alias("ship_year"),
                     F.size("mins").cast("long").alias("n_mins"),
                     _est(F.col("mins")).alias("est"),
                     "exact_uniques"))
    both = per_year.unionAll(total)
    return both.select(
        "ship_year", "n_mins", F.round("est", 4).alias("est_uniques"),
        "exact_uniques",
        (F.abs(F.col("est") - F.col("exact_uniques"))
         <= KMV_TOL * F.col("exact_uniques")).alias("est_within_tol"))


# Adjacent years well inside the synthetic orders' date span
# (TESTDATA.md: o_orderdate runs ~1995-2001, unlike classic TPC-H's
# 1992-1998 — a 1994 set here would be empty).
_YEAR_A, _YEAR_B = 1996, 1997


@query(
    "kmv_customer_yoy_algebra",
    f"""
    WITH uh AS (
      -- sketch domain: entity IDs only — a NULL custkey hashes to a
      -- NULL that the two engines retain/sort/count differently
      SELECT DISTINCT CAST(year(o_orderdate) AS BIGINT) AS s,
             {_kmv_hash_sql('o_custkey')} AS h
      FROM orders
      WHERE year(o_orderdate) IN ({_YEAR_A}, {_YEAR_B})
        AND o_custkey IS NOT NULL
    ), rk AS (
      SELECT s, h, row_number() OVER (PARTITION BY s ORDER BY h) AS rn
      FROM uh
    ), sk AS (
      SELECT s, h FROM rk WHERE rn <= {KMV_K}
    ), ag AS (
      SELECT s, CAST(count(*) AS BIGINT) AS k, max(h) AS hk
      FROM sk GROUP BY s
    ), urk AS (
      SELECT h, row_number() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM sk)
    ), usk AS (
      SELECT h FROM urk WHERE rn <= {KMV_K}
    ), uag AS (
      SELECT CAST(count(*) AS BIGINT) AS ku, max(h) AS hku FROM usk
    ), nb AS (
      SELECT CAST(count(*) AS BIGINT) AS n_both FROM usk u
      WHERE EXISTS (SELECT 1 FROM sk WHERE s = {_YEAR_A} AND h = u.h)
        AND EXISTS (SELECT 1 FROM sk WHERE s = {_YEAR_B} AND h = u.h)
    ), pu AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE year(o_orderdate) = {_YEAR_A} AND o_custkey IS NOT NULL
    ), cu AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE year(o_orderdate) = {_YEAR_B} AND o_custkey IS NOT NULL
    ), exacts AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM pu) AS exact_a,
             (SELECT CAST(count(*) AS BIGINT) FROM cu) AS exact_b,
             (SELECT CAST(count(*) AS BIGINT)
              FROM pu JOIN cu ON cu.o_custkey = pu.o_custkey) AS exact_inter
    ), raw AS (
      SELECT exact_a, exact_b, exact_inter,
             exact_a + exact_b - exact_inter AS exact_union,
             {_est_sql('(SELECT k FROM ag WHERE s = %d)' % _YEAR_A,
                       '(SELECT hk FROM ag WHERE s = %d)' % _YEAR_A)} AS ea,
             {_est_sql('(SELECT k FROM ag WHERE s = %d)' % _YEAR_B,
                       '(SELECT hk FROM ag WHERE s = %d)' % _YEAR_B)} AS eb,
             {_est_sql('(SELECT ku FROM uag)',
                       '(SELECT hku FROM uag)')} AS eu,
             CAST((SELECT n_both FROM nb) AS DOUBLE)
               / CAST((SELECT ku FROM uag) AS DOUBLE) AS rho
      FROM exacts
    )
    SELECT exact_a, exact_b, exact_union, exact_inter,
           round(ea, 4) AS est_a, round(eb, 4) AS est_b,
           round(eu, 4) AS est_union,
           round(rho * eu, 4) AS est_inter,
           round(greatest(0.0, ea - rho * eu), 4) AS est_diff_a,
           abs(eu - exact_union) <= {KMV_TOL} * exact_union
             AS union_within_tol,
           abs(rho * eu - exact_inter) <= {KMV_TOL} * exact_union
             AS inter_within_tol
    FROM raw
    """,
    doc="Theta-sketch set algebra KMV sketches make possible and HLL "
        "does not: |A∪B| from the merged sketch's k-th minimum, "
        "|A∩B| = ρ·|A∪B| where ρ is the fraction of the union "
        "sketch's retained hashes present in BOTH per-set sketches "
        "(a membership test on the sample — no inclusion-exclusion "
        "error blow-up), and |A\\\\B| by subtraction, over the "
        f"customers who ordered in {_YEAR_A} vs {_YEAR_B} (the last "
        "two full years inside the synthetic date span — see the "
        "comment at _YEAR_A above) (retention / churn / "
        "new-customer cardinalities from two stored sketches, no "
        "fact-table re-scan). Sketch build is the two-phase bounded "
        "aggregation; the algebra runs on ≤2K retained hashes as "
        "pure JVM array ops on a one-row frame. Exact counts ride "
        "along; every estimate hash-matches the oracle bitwise.",
    tags=("agg", "sketch", "approx", "set-ops", "scale"),
)
def q_kmv_customer_yoy_algebra(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # sketch domain: entity IDs only (oracle twin's uh CTE)
    # ONE orders scan (round 11, guide §2.4; was orders×5 in the plan
    # census): the sketch leg and the three exact legs all derive from
    # the distinct (year, custkey) pairs of the two compared years — a
    # days-bounded-cardinality frame, checkpointed once. kmv_minima's
    # collect_set is distinct-insensitive, so hashing the deduped
    # pairs yields bit-identical minima; pu/cu need no further
    # distinct (custkey is unique within a year slice of the pairs).
    oy = (orders.filter(F.col("o_custkey").isNotNull())
          .select(F.year("o_orderdate").cast("long").alias("s"),
                  "o_custkey"))
    base = (oy.filter(F.col("s").isin(_YEAR_A, _YEAR_B))
            .distinct().localCheckpoint(eager=True))
    uh = base.select("s", kmv_hash("o_custkey").alias("h"))
    sk = kmv_minima(uh, ["s"])
    row = sk.groupBy().agg(
        F.max(F.when(F.col("s") == _YEAR_A, F.col("mins"))).alias("amins"),
        F.max(F.when(F.col("s") == _YEAR_B, F.col("mins"))).alias("bmins"))

    pu = base.filter(F.col("s") == _YEAR_A).select("o_custkey")
    cu = base.filter(F.col("s") == _YEAR_B).select("o_custkey")
    ea = pu.agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
    eb = cu.agg(F.count(F.lit(1)).cast("long").alias("exact_b"))
    ei = (pu.join(cu, "o_custkey")
          .agg(F.count(F.lit(1)).cast("long").alias("exact_inter")))

    umins = F.slice(
        F.array_sort(F.array_distinct(
            F.concat(F.col("amins"), F.col("bmins")))), 1, KMV_K)
    raw = (row
           .crossJoin(F.broadcast(ea))
           .crossJoin(F.broadcast(eb))
           .crossJoin(F.broadcast(ei))
           .withColumn("umins", umins)
           .withColumn(
               "rho",
               F.size(F.array_intersect(
                   "umins", F.array_intersect("amins", "bmins")))
               .cast("double") / F.size("umins").cast("double"))
           .withColumn("ea", _est(F.col("amins")))
           .withColumn("eb", _est(F.col("bmins")))
           .withColumn("eu", _est(F.col("umins")))
           .withColumn("exact_union",
                       F.col("exact_a") + F.col("exact_b")
                       - F.col("exact_inter")))
    return raw.select(
        "exact_a", "exact_b", "exact_union", "exact_inter",
        F.round("ea", 4).alias("est_a"),
        F.round("eb", 4).alias("est_b"),
        F.round("eu", 4).alias("est_union"),
        F.round(F.col("rho") * F.col("eu"), 4).alias("est_inter"),
        F.round(F.greatest(F.lit(0.0),
                           F.col("ea") - F.col("rho") * F.col("eu")), 4)
        .alias("est_diff_a"),
        (F.abs(F.col("eu") - F.col("exact_union"))
         <= KMV_TOL * F.col("exact_union")).alias("union_within_tol"),
        (F.abs(F.col("rho") * F.col("eu") - F.col("exact_inter"))
         <= KMV_TOL * F.col("exact_union")).alias("inter_within_tol"))
