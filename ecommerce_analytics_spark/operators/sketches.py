"""Mergeable-sketch aggregation (Apache DataSketches HLL via Spark SQL).

The 100 TB pattern this certifies: distinct-count rollups that must
compose ACROSS partitions, days, and re-aggregations. An exact
countDistinct over a 100 TB fact is a full shuffle of every key per
query; the sketch pipeline aggregates each day ONCE into a few-KB
binary sketch, and every later rollup (week, month, ad-hoc ranges)
is a cheap union of stored sketches — no re-scan of the fact table.
Spark exposes this natively (`hll_sketch_agg` / `hll_union_agg` /
`hll_sketch_estimate`, Datasketches HLL_4), so the whole pipeline
stays JVM-side and partially aggregable.

No DuckDB oracle: DuckDB's approx_distinct is a different HLL
implementation, so cross-engine estimate equality is impossible by
construction — this is the one operator family whose correctness
contract is statistical, not relational. Registered rows-only for the
driver; the REAL certification is tests/test_skew_approx.py:

* mergeability — union of daily sketches == one-shot sketch over the
  whole range, exact estimate equality (same algorithm, same data);
* accuracy — per-day estimate within 5% of exact countDistinct
  (HLL_4 lgK=12 standard error ≈ 1.6%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

HLL_LGK = 12  # Datasketches default; ~1.6% relative standard error
# hll_union_agg's lgMaxK defaults to 12: a union of sketches built with
# lgK > 12 would silently downsample and break the exact-mergeability
# contract in test_skew_approx.py. Keep the coupling explicit.
assert HLL_LGK <= 12, "raise hll_union_agg lgMaxK before raising HLL_LGK"

# Accuracy bound certified cross-engine by the _sketch_vs_exact
# companion below: HLL_4 lgK=12 has ~1.6% relative standard error, so
# 5% (>3 sigma) holds deterministically on the driver corpora.
HLL_REL_TOL = 0.05


def hll_uniques(col: str, lgk: int = HLL_LGK):
    """Distinct-count estimate as a single aggregate expression —
    the shared plumbing behind every HLL mode flag (hourly revenue's
    two-mode builder, the streaming twin). Partially aggregable:
    map-side partial sketches merge in the shuffle, and the estimate
    is a pure order-insensitive function of the input set, so batch
    and streaming aggregations of the same rows agree exactly."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(col, F.lit(lgk)))


def daily_user_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, sketch binary, n_events) — the stored per-day sketch table.

    This is the materialization a deployment writes: one row per
    (partition-key) day, a few KB each, computed with ONE pass over
    the day's events (map-side partial sketches merge in the shuffle).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"),
             F.count(F.lit(1)).alias("n_events"))
    )


def q_daily_unique_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count rollup (pytest surface, not registered).

    Per-day Datasketches HLL sketches of user_id (one pass, partially
    aggregable), estimated per day AND re-aggregated to a global
    estimate via sketch union — the stored-sketch pattern that replaces
    re-scanning the fact table for every distinct-count rollup at
    100 TB. The raw estimates have no cross-engine twin, so this
    surface is certified by pytest (test_skew_approx.py: mergeability +
    5%-accuracy) while the registry exposes the oracle-green
    ``daily_unique_users_sketch_vs_exact`` companion, which runs the
    same sketch aggregation skeleton and hash-matches its accuracy
    contract against DuckDB.
    """
    daily = daily_user_sketches(spark, sf_dir)
    per_day = daily.select(
        "day",
        F.hll_sketch_estimate("sketch").alias("est_unique_users"),
        "n_events")
    total = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .alias("est_unique_users"),
        F.sum("n_events").alias("n_events")).select(
        F.lit(None).cast("date").alias("day"),
        "est_unique_users", "n_events")
    return per_day.unionAll(total)


@query(
    "daily_unique_users_sketch_vs_exact",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_uniques,
           TRUE AS est_within_tol
    FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    UNION ALL
    SELECT CAST(NULL AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_uniques,
           TRUE AS est_within_tol
    FROM events
    """,
    doc="Exact-side certification companion for daily_unique_users_hll: "
        "the SAME per-day + global-rollup aggregation skeleton, with the "
        "exact countDistinct alongside the sketch estimate, and the "
        "estimate's 5%-accuracy bound emitted as a hash-matchable "
        "boolean (the oracle asserts TRUE; a drifting estimate flips it "
        "and fails the driver hash). This gives the sketch pipeline a "
        "driver-green row even though the estimate itself has no "
        "cross-engine twin — the estimate values stay in the rows-only "
        "variant above.",
    tags=("agg", "sketch", "approx", "scale"),
)
def q_daily_unique_users_sketch_vs_exact(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    within = (F.abs(F.col("est") - F.col("exact_uniques"))
              <= HLL_REL_TOL * F.col("exact_uniques"))
    daily = (
        events
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.countDistinct("user_id").alias("exact_uniques"),
             F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"))
    )
    per_day = daily.select(
        "day", "n_events", "exact_uniques",
        F.hll_sketch_estimate("sketch").alias("est"),
    ).select("day", "n_events", "exact_uniques",
             within.alias("est_within_tol"))
    total = (
        daily.agg(
            F.sum("n_events").alias("n_events"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
        # exact global distinct is NOT derivable from daily exacts
        # (users span days) — one extra aggregate over events,
        # explicitly broadcast like every other scalar crossJoin here
        .crossJoin(F.broadcast(events.agg(
            F.countDistinct("user_id").alias("exact_uniques"))))
        .select(F.lit(None).cast("string").alias("day"),
                "n_events", "exact_uniques",
                within.alias("est_within_tol"))
    )
    return per_day.unionAll(total)


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (deterministic, exactly certified)

CMS_D = 4          # hash rows
CMS_W = 512        # buckets per row
CMS_TOP_K = 20     # heavy hitters reported
CMS_P = 2147483647  # 2^31 - 1 (same field as the minhash family)
# fixed 2-universal coefficients (a, b) per row — the md5-derived
# 32-bit token hash feeds (a*x + b) % P % W
CMS_COEFFS = [(914113, 824663), (734197, 661637),
              (579281, 524287), (433781, 368869)]

_CMS_HASHES_SQL = ", ".join(
    f"CAST((({a} * hx + {b}) % {CMS_P}) % {CMS_W} AS BIGINT) AS bkt_{i}"
    for i, (a, b) in enumerate(CMS_COEFFS))


def _cms_hex_sql(col: str) -> str:
    # first 8 hex digits of md5 → BIGINT (portable instr-based parse —
    # the dedup/fingerprint primitive)
    return "(" + " + ".join(
        f"CAST((instr('0123456789abcdef', substring({col}, {d + 1}, 1)) - 1)"
        f" AS BIGINT) * {16 ** (8 - 1 - d)}" for d in range(8)) + ")"


_CMS_ORACLE = f"""
WITH tc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM documents, unnest(string_split(text, ' ')) AS u(tok)
  GROUP BY tok
), hx AS (
  SELECT tok, cnt, {_cms_hex_sql("md5(tok)")} AS hx FROM tc
), hashed AS (
  SELECT tok, cnt, {_CMS_HASHES_SQL} FROM hx
), cms AS (
  SELECT row_id, bucket, CAST(sum(cnt) AS BIGINT) AS total
  FROM (
    {" UNION ALL ".join(
        f"SELECT {i} AS row_id, bkt_{i} AS bucket, cnt FROM hashed"
        for i in range(CMS_D))}
  )
  GROUP BY row_id, bucket
), topk AS (
  SELECT tok, cnt, {", ".join(f"bkt_{i}" for i in range(CMS_D))}
  FROM hashed
  ORDER BY cnt DESC, tok
  LIMIT {CMS_TOP_K}
), est AS (
  SELECT t.tok, t.cnt,
         least({", ".join(
             f"(SELECT total FROM cms WHERE row_id = {i}"
             f" AND bucket = t.bkt_{i})" for i in range(CMS_D))})
           AS cms_estimate
  FROM topk t
)
SELECT tok AS token, cnt AS true_count,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - cnt AS BIGINT) AS overestimate
FROM est
"""


@query(
    "cms_heavy_hitters",
    _CMS_ORACLE,
    doc=f"Count-min sketch (d={CMS_D}, w={CMS_W}) over the token "
        f"stream, queried for the exact top-{CMS_TOP_K} tokens: "
        "estimate = min over rows of the (a*h+b)%P%W bucket sums, "
        "emitted next to the true count with the (always >= 0) "
        "overestimate. Everything is integer arithmetic over the "
        "shared md5 hash primitive, so the sketch contents — not just "
        "bounds — hash-match the oracle exactly. Scale story: the "
        f"sketch is {CMS_D}x{CMS_W} mergeable counters (map-side "
        "partial agg on compact (row, bucket) keys); at 100 TB you "
        "store the sketch, not the token counts, and point-query it "
        "broadcast.",
    tags=("agg", "sketch", "north-star"),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tc = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
          .groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    hashed = (tc.withColumn(
        "hx", F.expr(f"{_cms_hex_sql('md5(tok)')}"))
        .select("tok", "cnt",
                *[F.expr(f"CAST((({a} * hx + {b}) % {CMS_P}) % {CMS_W} "
                         f"AS BIGINT)").alias(f"bkt_{i}")
                  for i, (a, b) in enumerate(CMS_COEFFS)])
        .persist())
    cms = (hashed.select(F.explode(F.array(*[
        F.struct(F.lit(i).alias("row_id"),
                 F.col(f"bkt_{i}").alias("bucket"),
                 F.col("cnt").alias("cnt"))
        for i in range(CMS_D)])).alias("s"))
        .select("s.row_id", "s.bucket", "s.cnt")
        .groupBy("row_id", "bucket")
        .agg(F.sum("cnt").cast("long").alias("total")))
    topk = (hashed
            .orderBy(F.desc("cnt"), F.asc("tok"))
            .limit(CMS_TOP_K))
    # one sketch, one lookup join: the former per-row chain of CMS_D
    # broadcast joins re-planned the vocab-sized cms aggregation once
    # PER ROW-HASH (each cms_i filter is a distinct subtree, so no
    # exchange reuse — 4 full passes over the persisted token table).
    # Unpivot the CMS_TOP_K probe rows to (row_id, bucket) instead and
    # broadcast the sketch itself (≤ CMS_D x CMS_W cells by
    # construction): the inner join yields exactly CMS_D cells per
    # token (every probed bucket exists — the token's own counts are
    # in it), so min(total) over the group is the old least(t_0..t_3).
    topk_long = (topk.select("tok", "cnt", F.explode(F.array(*[
        F.struct(F.lit(i).cast("int").alias("row_id"),
                 F.col(f"bkt_{i}").alias("bucket"))
        for i in range(CMS_D)])).alias("s"))
        .select("tok", "cnt", "s.row_id", "s.bucket"))
    est = (topk_long.join(F.broadcast(cms), ["row_id", "bucket"])
           .groupBy("tok", "cnt")
           .agg(F.min("total").alias("cms_estimate")))
    return est.select(
        F.col("tok").alias("token"),
        F.col("cnt").alias("true_count"),
        F.col("cms_estimate"),
        (F.col("cms_estimate") - F.col("cnt"))
        .cast("long").alias("overestimate"))


def cms_cells(df: DataFrame, key_sql_expr: str,
              weight: str | None = None) -> DataFrame:
    """Count-min sketch state for an arbitrary key expression:
    (row_id, bucket, total) over the CMS_D x CMS_W grid. A plain
    groupBy aggregation — therefore mergeable across partitions AND
    micro-batches (the streaming twin maintains the identical state
    as a streaming aggregation; test_streaming.py certifies parity).
    ``weight`` sums a count column instead of counting rows (the
    pre-aggregated-token path the registered query uses)."""
    w = F.col(weight) if weight else F.lit(1)
    hashed = df.withColumn(
        "_hx", F.expr(_cms_hex_sql(f"md5({key_sql_expr})")))
    cells = (hashed.select(
        w.alias("_w"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row_id"),
                     F.expr(f"CAST((({a} * _hx + {b}) % {CMS_P}) "
                            f"% {CMS_W} AS BIGINT)").alias("bucket"))
            for i, (a, b) in enumerate(CMS_COEFFS)])).alias("s"))
        .select("s.row_id", "s.bucket", "_w"))
    return (cells.groupBy("row_id", "bucket")
            .agg(F.sum("_w").cast("long").alias("total")))


# ---------------------------------------------------------------------------
# CMS inner-product join-size estimation (AMS/CMS optimizer primitive)

def _cms_cells_sql(table: str, key: str) -> str:
    """DuckDB twin of cms_cells for a key column of ``table``."""
    hx = _cms_hex_sql(f"md5(CAST({key} AS STRING))")
    branches = " UNION ALL ".join(
        f"SELECT {i} AS row_id, "
        f"CAST((({a} * hx + {b}) % {CMS_P}) % {CMS_W} AS BIGINT) "
        f"AS bucket, cnt FROM hx_{table}"
        for i, (a, b) in enumerate(CMS_COEFFS))
    return (f"hx_{table} AS (SELECT {hx} AS hx, "
            f"CAST(count(*) AS BIGINT) AS cnt FROM {table} "
            f"GROUP BY {key}), "
            f"cms_{table} AS (SELECT row_id, bucket, "
            f"CAST(sum(cnt) AS BIGINT) AS total FROM ({branches}) "
            f"GROUP BY row_id, bucket)")


_CMS_JOINSIZE_ORACLE = f"""
WITH {_cms_cells_sql("orders", "o_custkey")},
{_cms_cells_sql("customer", "c_custkey")},
prod AS (
  SELECT a.row_id,
         CAST(sum(a.total * b.total) AS BIGINT) AS inner_product
  FROM cms_orders a JOIN cms_customer b
    ON a.row_id = b.row_id AND a.bucket = b.bucket
  GROUP BY a.row_id
),
est AS (SELECT CAST(min(inner_product) AS BIGINT) AS est_join_size
        FROM prod),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_join_size
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT est_join_size, exact_join_size,
       (est_join_size >= exact_join_size) AS never_underestimates
FROM est, exact
"""


@query(
    "cms_join_size_estimate",
    _CMS_JOINSIZE_ORACLE,
    doc="Join-cardinality estimation from sketches alone: |A JOIN B| "
        "on a key equals the inner product of the two key-frequency "
        "vectors, estimated as min over CMS rows of the cell-wise "
        "product sum (AMS/CMS estimator — never underestimates, "
        "since hash collisions only add mass). Built entirely from "
        f"the {CMS_D}x{CMS_W} integer grids the cms_cells operator "
        "maintains, so the ESTIMATE ITSELF hash-matches the oracle, "
        "alongside the exact join size and the one-sided-error "
        "boolean. At 100 TB this is how an optimizer sizes a join "
        "without touching either table: two stored 2048-cell "
        "sketches, one broadcast-joined product.",
    tags=("sketch", "join", "scale"),
)
def q_cms_join_size_estimate(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = cms_cells(orders, "CAST(o_custkey AS STRING)")
    b = cms_cells(customer, "CAST(c_custkey AS STRING)")
    bb = (b.withColumnRenamed("total", "total_b")
          .withColumnRenamed("row_id", "row_b")
          .withColumnRenamed("bucket", "bucket_b"))
    prod = (a.join(F.broadcast(bb),
                   (a.row_id == bb.row_b) & (a.bucket == bb.bucket_b))
            .groupBy("row_id")
            .agg(F.sum(F.col("total") * F.col("total_b"))
                 .cast("long").alias("inner_product")))
    est = prod.agg(F.min("inner_product").cast("long")
                   .alias("est_join_size"))
    exact = (orders.join(customer,
                         orders.o_custkey == customer.c_custkey)
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("exact_join_size")))
    return (est.crossJoin(F.broadcast(exact))
            .select("est_join_size", "exact_join_size",
                    (F.col("est_join_size") >= F.col("exact_join_size"))
                    .alias("never_underestimates")))


# ---------------------------------------------------------------------------
# HLL set algebra: day-over-day audience overlap from STORED sketches

# Overlap is estimated through inclusion-exclusion over three HLL
# estimates (A, B, A∪B), so its absolute error compounds to ~3× the
# single-sketch relative error — bounded against the EXACT union size.
HLL_OVERLAP_TOL = 3 * HLL_REL_TOL


@query(
    "user_day_overlap_hll",
    """
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), cnt AS (
      SELECT day, CAST(count(*) AS BIGINT) AS c FROM du GROUP BY day
    ), ov AS (
      SELECT a.day AS day, CAST(count(*) AS BIGINT) AS exact_overlap
      FROM du a JOIN du b
        ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
      GROUP BY a.day
    )
    SELECT strftime(c1.day, '%Y-%m-%d') AS day,
           c1.c AS exact_a, c2.c AS exact_b,
           COALESCE(ov.exact_overlap, 0) AS exact_overlap,
           TRUE AS est_within_tol
    FROM cnt c1
    JOIN cnt c2 ON c2.day = c1.day + INTERVAL 1 DAY
    LEFT JOIN ov ON ov.day = c1.day
    """,
    doc="HLL set algebra over the STORED per-day sketch table: "
        "|A∩B| ≈ est(A) + est(B) − est(A∪B) for every consecutive-day "
        "pair, where est(A∪B) comes from the scalar hll_union of the "
        "two stored sketches — no re-scan of the fact table, the "
        "audience-overlap question answered from kilobytes. Follows "
        "the sketch_vs_exact certification pattern: exact per-day "
        "uniques and exact overlap (one distinct-users shuffle + a "
        "self-join on (user, day+1)) hash-match the oracle, and the "
        "inclusion-exclusion estimate's 3-sketch error bound vs the "
        "exact union is a hash-matched boolean.",
    tags=("agg", "sketch", "approx", "join", "scale"),
)
def q_user_day_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # ONE fact scan (round 11, guide §2.4; was events×6 in the plan
    # census): the distinct (day, user) pairs — the shared input of
    # every leg — are checkpointed once; the exact counts, the
    # consecutive-day self-join AND the HLL sketches all re-derive
    # from the materialized pairs. An HLL sketch is a pure function of
    # the distinct input set (duplicate insertions cannot move a
    # register), so sketching the deduped pairs yields the identical
    # estimates the stored per-day sketch table (daily_user_sketches)
    # produces from raw events.
    du = (events.select(F.to_date("ts").alias("day"), "user_id")
          .distinct().localCheckpoint(eager=True))
    cnt = du.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ov = (du.alias("a")
          .join(du.alias("b"),
                (F.col("b.user_id") == F.col("a.user_id"))
                & (F.col("b.day") == F.date_add(F.col("a.day"), 1)))
          .groupBy(F.col("a.day").alias("day"))
          .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap")))
    sk = du.groupBy("day").agg(
        F.hll_sketch_agg("user_id", F.lit(HLL_LGK)).alias("sketch"))

    c1, c2 = cnt.alias("c1"), cnt.alias("c2")
    s1, s2 = sk.alias("s1"), sk.alias("s2")
    paired = (
        c1.join(c2, F.col("c2.day") == F.date_add(F.col("c1.day"), 1))
        .join(ov.alias("ov"), F.col("ov.day") == F.col("c1.day"), "left")
        .join(s1, F.col("s1.day") == F.col("c1.day"))
        .join(s2, F.col("s2.day") == F.date_add(F.col("c1.day"), 1))
        .select(
            F.date_format(F.col("c1.day"), "yyyy-MM-dd").alias("day"),
            F.col("c1.c").alias("exact_a"),
            F.col("c2.c").alias("exact_b"),
            F.coalesce(F.col("ov.exact_overlap"), F.lit(0))
            .alias("exact_overlap"),
            F.hll_sketch_estimate(F.col("s1.sketch")).alias("est_a"),
            F.hll_sketch_estimate(F.col("s2.sketch")).alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union(F.col("s1.sketch"), F.col("s2.sketch")))
            .alias("est_u")))
    exact_union = (F.col("exact_a") + F.col("exact_b")
                   - F.col("exact_overlap"))
    est_overlap = F.col("est_a") + F.col("est_b") - F.col("est_u")
    return paired.select(
        "day", "exact_a", "exact_b", "exact_overlap",
        (F.abs(est_overlap - F.col("exact_overlap"))
         <= HLL_OVERLAP_TOL * exact_union).alias("est_within_tol"))
