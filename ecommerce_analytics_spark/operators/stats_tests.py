"""Exact distributional test statistics: KS, CUSUM changepoint, chi².

Data pipelines gate on distribution drift ("did weekend traffic change
shape?", "when did the metric shift?", "are these factors
independent?"). The classic test statistics are all ratios of integer
counting statistics, so the engine computes them EXACTLY — the
ordering / argmax decisions happen on integers, and only the reported
statistic divides to a rounded double:

* ``ks_weekend_vs_weekday`` — two-sample Kolmogorov-Smirnov D between
  weekend and weekday purchase values: D = max |n_b·cumA − n_a·cumB|
  / (n_a·n_b) over the merged support, the max taken on the exact
  integer numerator;
* ``revenue_changepoint_cusum`` — offline CUSUM changepoint of daily
  revenue: t* = argmax_t |n·S_t − t·S_n| on exact integer cents,
  with the split means before/after;
* ``chi2_event_type_weekend`` — chi² independence of event_type ×
  weekend with each cell's (n·o − r·c)²/(n·r·c) term quantized to
  1e-9 fixed point BEFORE the sum (float SUM order is unspecified in
  both engines; integer sums are exact).

Scale shape: each test reduces the fact table map-locally to a
bounded-cardinality statistic table (distinct cent values, days,
type×flag cells) in ONE aggregation; the window/argmax runs over that
tiny table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

_DEC = "decimal(38,0)"
CHI2_FIX = 1_000_000_000

# weekend: ISO day-of-week 6/7 (Sat/Sun). Spark's weekday() is 0=Mon.
_KS_ORACLE = """
WITH vals AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         (isodow(ts) >= 6) AS wk
  FROM events WHERE event_type = 'purchase'
), by_val AS (
  SELECT cents,
         CAST(sum(CASE WHEN wk THEN 1 ELSE 0 END) AS HUGEINT) AS a,
         CAST(sum(CASE WHEN wk THEN 0 ELSE 1 END) AS HUGEINT) AS b
  FROM vals GROUP BY cents
), cum AS (
  SELECT cents,
         sum(a) OVER (ORDER BY cents) AS ca,
         sum(b) OVER (ORDER BY cents) AS cb,
         (SELECT sum(a) FROM by_val) AS na,
         (SELECT sum(b) FROM by_val) AS nb
  FROM by_val
), dev AS (
  SELECT cents, abs(nb * ca - na * cb) AS d_num, na, nb FROM cum
)
SELECT CAST(na AS BIGINT) AS n_weekend, CAST(nb AS BIGINT) AS n_weekday,
       CAST(max(d_num) AS BIGINT) AS d_num,
       round(CAST(max(d_num) AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 8) AS ks_d,
       CAST(min(cents) FILTER (
           WHERE d_num = (SELECT max(d_num) FROM dev)) AS BIGINT)
         AS at_cents
FROM dev GROUP BY na, nb
"""


@query(
    "ks_weekend_vs_weekday",
    _KS_ORACLE,
    doc="Two-sample Kolmogorov-Smirnov D between weekend and weekday "
        "purchase-value distributions. The merged ECDF gap is the "
        "exact integer |n_b*cumA - n_a*cumB| (cross-multiplied to "
        "avoid any division before the max), maximized over the "
        "distinct-cents support with the argmax value reported "
        "(min cents on ties). One map-side-combined aggregation to "
        "the distinct-value table, one tiny ordered window over it.",
    tags=("eval", "stats", "window"),
)
def q_ks_weekend_vs_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    vals = (events.filter(F.col("event_type") == "purchase")
            .select(F.round(F.col("value") * 100).cast("bigint")
                    .alias("cents"),
                    (F.weekday("ts") >= 5).alias("wk")))
    # Checkpoint the per-cents counts (≤ distinct purchase values —
    # small): tot, the cumulative window and the max-deviation scan
    # re-derive from materialized rows instead of re-running the fact
    # aggregation in four subtrees (guide §2.4, the
    # revenue_changepoint_cusum recipe).
    by_val = (vals.groupBy("cents")
              .agg(F.sum(F.when(F.col("wk"), 1).otherwise(0))
                   .cast(_DEC).alias("a"),
                   F.sum(F.when(F.col("wk"), 0).otherwise(1))
                   .cast(_DEC).alias("b"))
              .localCheckpoint(eager=True))
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0)
    tot = by_val.groupBy().agg(F.sum("a").alias("na"),
                               F.sum("b").alias("nb"))
    cum = (by_val
           .select("cents",
                   F.sum("a").over(w).alias("ca"),
                   F.sum("b").over(w).alias("cb"))
           .join(F.broadcast(tot)))
    dev = cum.select(
        "cents", "na", "nb",
        F.abs(F.col("nb") * F.col("ca")
              - F.col("na") * F.col("cb")).alias("d_num"))
    mx = dev.groupBy().agg(F.max("d_num").alias("mx"))
    return (dev.join(F.broadcast(mx))
            .groupBy("na", "nb", "mx")
            .agg(F.min(F.when(F.col("d_num") == F.col("mx"),
                              F.col("cents"))).alias("at"))
            .select(F.col("na").cast("long").alias("n_weekend"),
                    F.col("nb").cast("long").alias("n_weekday"),
                    F.col("mx").cast("long").alias("d_num"),
                    F.round(F.col("mx").cast("double")
                            / (F.col("na").cast("double")
                               * F.col("nb").cast("double")), 8)
                    .alias("ks_d"),
                    F.col("at").cast("long").alias("at_cents")))


_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), cum AS (
  SELECT day, x,
         CAST(row_number() OVER (ORDER BY day) AS HUGEINT) AS t,
         sum(x) OVER (ORDER BY day) AS s,
         (SELECT CAST(count(*) AS HUGEINT) FROM daily) AS n,
         (SELECT sum(x) FROM daily) AS sn
  FROM daily
), dev AS (
  SELECT day, t, s, n, sn, abs(n * s - t * sn) AS d FROM cum
), best AS (
  SELECT min(day) AS cp_day FROM dev
  WHERE d = (SELECT max(d) FROM dev)
)
SELECT CAST(d.n AS BIGINT) AS n_days,
       strftime(b.cp_day, '%Y-%m-%d') AS changepoint_day,
       CAST(max(d.d) AS BIGINT) AS cusum_num,
       round(CAST(max(d.d) AS DOUBLE)
             / (CAST(d.n AS DOUBLE) * 100.0), 6) AS cusum_stat,
       round(CAST(max(CASE WHEN d.day <= b.cp_day THEN d.s END)
                  AS DOUBLE)
             / CAST(max(CASE WHEN d.day <= b.cp_day THEN d.t END)
                    AS DOUBLE) / 100.0, 6) AS mean_before,
       round(CAST(d.sn - max(CASE WHEN d.day <= b.cp_day THEN d.s END)
                  AS DOUBLE)
             / CAST(d.n - max(CASE WHEN d.day <= b.cp_day THEN d.t END)
                    AS DOUBLE) / 100.0, 6) AS mean_after
FROM dev d, best b
GROUP BY d.n, d.sn, b.cp_day
"""


@query(
    "revenue_changepoint_cusum",
    _CUSUM_ORACLE,
    doc="Offline CUSUM changepoint of daily purchase revenue: the "
        "split day t* maximizing |n*S_t - t*S_n| (the unnormalized "
        "max-deviation-from-trend statistic), decided entirely on "
        "exact integer cents (ties -> earliest day), with the exact "
        "mean revenue before/after the split. One daily aggregation; "
        "the cumulative window and argmax run over the tiny series.",
    tags=("timeseries", "stats", "window"),
)
def q_revenue_changepoint_cusum(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # The CUSUM statistic references `daily` via tot + cum, and `dev`
    # (daily + a window) via mx + best + the final join — without a
    # cut, the fact-table day aggregation re-executes in SIX subtrees
    # (guide §2.4; measured in the plan census as events×6). The daily
    # frame is ≤ #days rows, so the attribution.py recipe applies:
    # checkpoint the small reduced frame once and let every statistic
    # subtree re-derive from ~hundreds of materialized rows. One fact
    # scan at any corpus size.
    daily = (events.filter(F.col("event_type") == "purchase")
             .groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .cast(_DEC).alias("x"))
             .localCheckpoint(eager=True))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = daily.groupBy().agg(F.count(F.lit(1)).cast(_DEC).alias("n"),
                              F.sum("x").alias("sn"))
    cum = (daily.select(
        "day", "x",
        F.row_number().over(Window.orderBy("day")).cast(_DEC)
        .alias("t"),
        F.sum("x").over(w).alias("s"))
        .join(F.broadcast(tot)))
    dev = cum.select(
        "day", "t", "s", "n", "sn",
        F.abs(F.col("n") * F.col("s") - F.col("t") * F.col("sn"))
        .alias("d"))
    mx = dev.groupBy().agg(F.max("d").alias("mxd"))
    best = (dev.join(F.broadcast(mx))
            .filter(F.col("d") == F.col("mxd"))
            .groupBy().agg(F.min("day").alias("cp_day")))
    joined = dev.join(F.broadcast(best))
    pre_s = F.max(F.when(F.col("day") <= F.col("cp_day"), F.col("s")))
    pre_t = F.max(F.when(F.col("day") <= F.col("cp_day"), F.col("t")))
    return (joined.groupBy("n", "sn", "cp_day")
            .agg(F.max("d").alias("mxd"),
                 pre_s.alias("ps"), pre_t.alias("pt"))
            .select(F.col("n").cast("long").alias("n_days"),
                    F.date_format("cp_day", "yyyy-MM-dd")
                    .alias("changepoint_day"),
                    F.col("mxd").cast("long").alias("cusum_num"),
                    F.round(F.col("mxd").cast("double")
                            / (F.col("n").cast("double") * 100.0), 6)
                    .alias("cusum_stat"),
                    F.round(F.col("ps").cast("double")
                            / F.col("pt").cast("double") / 100.0, 6)
                    .alias("mean_before"),
                    F.round((F.col("sn") - F.col("ps")).cast("double")
                            / (F.col("n") - F.col("pt")).cast("double")
                            / 100.0, 6).alias("mean_after")))


_CHI2_ORACLE = f"""
WITH cells AS (
  SELECT event_type, (isodow(ts) >= 6) AS wk,
         CAST(count(*) AS HUGEINT) AS o
  FROM events GROUP BY 1, 2
), margins AS (
  SELECT c.event_type, c.wk, c.o,
         sum(c.o) OVER (PARTITION BY c.event_type) AS r,
         sum(c.o) OVER (PARTITION BY c.wk) AS col_n,
         sum(c.o) OVER () AS n
  FROM cells c
), terms AS (
  SELECT CAST(round(
           CAST((n * o - r * col_n) AS DOUBLE)
           * CAST((n * o - r * col_n) AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
              * CAST(col_n AS DOUBLE)) * {CHI2_FIX}) AS HUGEINT)
           AS term_fix,
         n
  FROM margins
), dims AS (
  SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT wk) AS BIGINT) AS n_cols
  FROM cells
)
SELECT CAST(t.n AS BIGINT) AS n_events,
       (d.n_rows - 1) * (d.n_cols - 1) AS dof,
       round(CAST(sum(t.term_fix) AS DOUBLE) / {CHI2_FIX}, 6) AS chi2
FROM terms t, dims d
GROUP BY t.n, d.n_rows, d.n_cols
"""


@query(
    "chi2_event_type_weekend",
    _CHI2_ORACLE,
    doc="Chi-square independence test of event_type x weekend: each "
        "cell's (n*o - r*c)^2 / (n*r*c) term — the n-scaled "
        "observed-vs-expected form that never forms a fractional "
        "expected count — is quantized to 1e-9 fixed point BEFORE "
        "summing (float SUM accumulation order is unspecified in both "
        "engines; integer sums are exact). One counting aggregation "
        "to R*C cells; margins via windows over that tiny table.",
    tags=("eval", "stats", "agg"),
)
def q_chi2_event_type_weekend(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cells = (events
             .groupBy("event_type", (F.weekday("ts") >= 5).alias("wk"))
             .agg(F.count(F.lit(1)).cast(_DEC).alias("o")))
    margins = cells.select(
        "event_type", "wk", "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("wk")).alias("col_n"),
        F.sum("o").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding,
                Window.unboundedFollowing)).alias("n"))
    num = (F.col("n") * F.col("o")
           - F.col("r") * F.col("col_n")).cast("double")
    term = F.round(
        num * num / (F.col("n").cast("double") * F.col("r").cast("double")
                     * F.col("col_n").cast("double")) * CHI2_FIX) \
        .cast(_DEC)
    terms = margins.select(term.alias("term_fix"), "n")
    dims = cells.groupBy().agg(
        F.countDistinct("event_type").cast("long").alias("n_rows"),
        F.countDistinct("wk").cast("long").alias("n_cols"))
    return (terms.join(F.broadcast(dims))
            .groupBy("n", "n_rows", "n_cols")
            .agg(F.sum("term_fix").alias("sfix"))
            .select(F.col("n").cast("long").alias("n_events"),
                    ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
                    .alias("dof"),
                    F.round(F.col("sfix").cast("double") / CHI2_FIX, 6)
                    .alias("chi2")))


_MW_ORACLE = """
WITH vals AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         (isodow(ts) >= 6) AS wk
  FROM events WHERE event_type = 'purchase'
), by_val AS (
  SELECT cents,
         CAST(sum(CASE WHEN wk THEN 1 ELSE 0 END) AS HUGEINT) AS a,
         CAST(sum(CASE WHEN wk THEN 0 ELSE 1 END) AS HUGEINT) AS b
  FROM vals GROUP BY cents
), cum AS (
  SELECT cents, a, b, a + b AS t,
         sum(a + b) OVER (ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) - (a + b) AS cb
  FROM by_val
), agg AS (
  SELECT (SELECT sum(a) FROM by_val) AS na,
         (SELECT sum(b) FROM by_val) AS nb,
         sum(a * (2 * cb + t + 1)) AS r2a,
         sum(t * t * t - t) AS ties
  FROM cum
)
SELECT CAST(na AS BIGINT) AS n_weekend, CAST(nb AS BIGINT) AS n_weekday,
       CAST(r2a - na * (na + 1) AS BIGINT) AS u2_weekend,
       round((CAST(r2a - na * (na + 1) AS DOUBLE)
              - CAST(na * nb AS DOUBLE))
             / (2.0 * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                           / 12.0
                           * (CAST(na + nb + 1 AS DOUBLE)
                              - CAST(ties AS DOUBLE)
                                / (CAST(na + nb AS DOUBLE)
                                   * CAST(na + nb - 1 AS DOUBLE))))),
             6) AS z,
       round(1.0 - CAST(r2a - na * (na + 1) AS DOUBLE)
                   / CAST(na * nb AS DOUBLE), 6) AS rank_biserial
FROM agg
"""


@query(
    "mannwhitney_weekend_value",
    _MW_ORACLE,
    doc="Mann-Whitney U rank test of weekend vs weekday purchase "
        "values — the nonparametric location-shift companion of the "
        "KS shape test. Doubled midranks (2*avgrank = 2*cum_before "
        "+ t + 1) keep the tied-rank sum an exact integer, so 2U is "
        "decided entirely on integers; the tie-corrected normal "
        "z and the rank-biserial effect size (1 - 2U/(na*nb)) are "
        "the only float divisions, written identically on both "
        "engines. Same scale shape as the KS test: one "
        "map-side-combined reduction to the distinct-cents table, "
        "one ordered window over that tiny support.",
    tags=("eval", "stats", "window"),
)
def q_mannwhitney_weekend_value(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    vals = (events.filter(F.col("event_type") == "purchase")
            .select(F.round(F.col("value") * 100).cast("bigint")
                    .alias("cents"),
                    (F.weekday("ts") >= 5).alias("wk")))
    by_val = (vals.groupBy("cents")
              .agg(F.sum(F.when(F.col("wk"), 1).otherwise(0))
                   .cast(_DEC).alias("a"),
                   F.sum(F.when(F.col("wk"), 0).otherwise(1))
                   .cast(_DEC).alias("b")))
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0)
    t = F.col("a") + F.col("b")
    cum = by_val.select(
        "a", "b", t.alias("t"),
        (F.sum(F.col("a") + F.col("b")).over(w) - t).alias("cb"))
    agg = cum.groupBy().agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb"),
        F.sum(F.col("a") * (2 * F.col("cb") + F.col("t") + 1))
        .alias("r2a"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("ties"))
    na, nb = F.col("na"), F.col("nb")
    u2 = F.col("r2a") - na * (na + 1)
    u2d = u2.cast("double")
    nad, nbd = na.cast("double"), nb.cast("double")
    var = (nad * nbd / 12.0
           * ((na + nb + 1).cast("double")
              - F.col("ties").cast("double")
                / ((na + nb).cast("double")
                   * (na + nb - 1).cast("double"))))
    return agg.select(
        na.cast("long").alias("n_weekend"),
        nb.cast("long").alias("n_weekday"),
        u2.cast("long").alias("u2_weekend"),
        F.round((u2d - (na * nb).cast("double"))
                / (2.0 * F.sqrt(var)), 6).alias("z"),
        F.round(1.0 - u2d / (na * nb).cast("double"), 6)
        .alias("rank_biserial"))


ENT_FIX = 1_000_000_000

_ENTROPY_ORACLE = f"""
WITH cats AS (
  SELECT 'events' AS tbl, 'event_type' AS col,
         event_type AS val FROM events
  UNION ALL
  SELECT 'documents', 'lang', lang FROM documents
  UNION ALL
  SELECT 'documents', 'source', source FROM documents
), counts AS (
  SELECT tbl, col, val, CAST(count(*) AS HUGEINT) AS c
  FROM cats GROUP BY tbl, col, val
), tot AS (
  SELECT tbl, col, CAST(sum(c) AS HUGEINT) AS n,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM counts GROUP BY tbl, col
), terms AS (
  SELECT c.tbl, c.col, t.n, t.n_distinct,
         CAST(round(
           -(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
             * log2(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
             * {ENT_FIX}) AS HUGEINT) AS term_fix
  FROM counts c JOIN tot t ON t.tbl = c.tbl AND t.col = c.col
)
SELECT tbl, col, CAST(n AS BIGINT) AS n, n_distinct,
       round(CAST(sum(term_fix) AS DOUBLE) / {ENT_FIX}, 6) AS entropy,
       CASE WHEN n_distinct = 1 THEN 0.0
            ELSE round(CAST(sum(term_fix) AS DOUBLE) / {ENT_FIX}
                       / log2(CAST(n_distinct AS DOUBLE)), 6)
       END AS norm_entropy
FROM terms GROUP BY tbl, col, n, n_distinct
"""


@query(
    "column_entropy_profile",
    _ENTROPY_ORACLE,
    doc="Shannon-entropy profile of the categorical columns "
        "(events.event_type, documents.lang/source): per-column "
        "distinct count, entropy in bits and entropy normalized by "
        "log2(n_distinct) — the standard skew-at-a-glance data-audit "
        "stat (norm_entropy ~1 = uniform, ~0 = one dominant value). "
        "Each -p*log2(p) term is quantized to 1e-9 fixed point "
        "before summing (exact integer sum; the log2 transcendental "
        "follows the PMI round-6 precedent). One counting "
        "aggregation per column, unioned map-locally.",
    tags=("stats", "agg", "profiling"),
)
def q_column_entropy_profile(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    cats = (events.select(F.lit("events").alias("tbl"),
                          F.lit("event_type").alias("col"),
                          F.col("event_type").alias("val"))
            .unionAll(docs.select(F.lit("documents").alias("tbl"),
                                  F.lit("lang").alias("col"),
                                  F.col("lang").alias("val")))
            .unionAll(docs.select(F.lit("documents").alias("tbl"),
                                  F.lit("source").alias("col"),
                                  F.col("source").alias("val"))))
    counts = (cats.groupBy("tbl", "col", "val")
              .agg(F.count(F.lit(1)).cast(_DEC).alias("c")))
    tot = (counts.groupBy("tbl", "col")
           .agg(F.sum("c").alias("n"),
                F.count(F.lit(1)).cast("long").alias("n_distinct")))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    terms = (counts.join(tot, ["tbl", "col"])
             .select("tbl", "col", "n", "n_distinct",
                     F.round(-p * F.log2(p) * ENT_FIX).cast(_DEC)
                     .alias("term_fix")))
    ent = F.sum("term_fix").cast("double") / ENT_FIX
    return (terms.groupBy("tbl", "col", "n", "n_distinct")
            .agg(F.round(ent, 6).alias("entropy"),
                 F.when(F.col("n_distinct") == 1, F.lit(0.0))
                 .otherwise(
                     F.round(ent / F.log2(F.col("n_distinct")
                                          .cast("double")), 6))
                 .alias("norm_entropy"))
            .select("tbl", "col", F.col("n").cast("long").alias("n"),
                    "n_distinct", "entropy", "norm_entropy"))


_BENFORD_ORACLE = f"""
WITH pos AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase' AND round(value * 100) > 0
), digits AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS HUGEINT) AS n_obs
  FROM pos GROUP BY 1
), spine AS (
  SELECT unnest(generate_series(1, 9)) AS digit
), filled AS (
  SELECT s.digit, coalesce(d.n_obs, 0) AS n_obs,
         (SELECT sum(n_obs) FROM digits) AS n
  FROM spine s LEFT JOIN digits d ON d.digit = s.digit
), scored AS (
  SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
         CAST(n AS BIGINT) AS n,
         round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6)
           AS obs_share,
         round(log2(1.0 + 1.0 / digit) / log2(10.0), 6) AS benford_p,
         CAST(round(abs(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
                        - log2(1.0 + 1.0 / digit) / log2(10.0))
                    * {ENT_FIX}) AS HUGEINT) AS dev_fix
  FROM filled
)
SELECT digit, n_obs, obs_share, benford_p,
       round(CAST((SELECT sum(dev_fix) FROM scored) AS DOUBLE)
             / 9.0 / {ENT_FIX}, 6) AS mad
FROM scored
"""


@query(
    "benford_first_digit",
    _BENFORD_ORACLE,
    doc="Benford's-law conformity audit of purchase amounts: observed "
        "first-significant-digit shares (digit via integer-cents "
        "string prefix — no float log tricks) vs the Benford "
        "expectation log10(1+1/d), plus the standard MAD conformity "
        "statistic (mean |obs - expected| over the 9 digits; "
        "Nigrini's close-conformity threshold is 0.006). Per-digit "
        "deviations quantize to fixed point before the mean. One "
        "9-key counting aggregation — nothing grows with data.",
    tags=("stats", "agg", "profiling"),
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    digits = (events
              .filter((F.col("event_type") == "purchase") & (cents > 0))
              .select(F.substring(cents.cast("string"), 1, 1)
                      .cast("long").alias("digit"))
              .groupBy("digit")
              .agg(F.count(F.lit(1)).cast(_DEC).alias("n_obs"))
              # ≤ 9 rows feeding four statistic subtrees (total, fill,
              # deviation, MAD) — checkpoint once so the events fact
              # is scanned once, not 4x (r11 scan-discipline recipe)
              .localCheckpoint(eager=True))
    spine = spark.range(1, 10).select(F.col("id").alias("digit"))
    tot = digits.groupBy().agg(F.sum("n_obs").alias("n"))
    filled = (spine.join(digits, "digit", "left")
              .join(F.broadcast(tot))
              .select("digit",
                      F.coalesce("n_obs", F.lit(0).cast(_DEC))
                      .alias("n_obs"), "n"))
    share = F.col("n_obs").cast("double") / F.col("n").cast("double")
    bp = (F.log2(1.0 + 1.0 / F.col("digit").cast("double"))
          / F.log2(F.lit(10.0)))
    scored = filled.select(
        "digit",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(share, 6).alias("obs_share"),
        F.round(bp, 6).alias("benford_p"),
        F.round(F.abs(share - bp) * ENT_FIX).cast(_DEC).alias("dev_fix"))
    mad = scored.groupBy().agg(
        F.round(F.sum("dev_fix").cast("double") / 9.0 / ENT_FIX, 6)
        .alias("mad"))
    return (scored.join(F.broadcast(mad))
            .select("digit", "n_obs", "obs_share", "benford_p", "mad"))


CUSUM_CAL = 7  # calibration window (days) for the online detector

_CUSUM_ONLINE_ORACLE = f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(round(value * 100) AS BIGINT)) AS x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(ts AS DATE)) AS rn
  FROM events GROUP BY 1, 2
), cal0 AS (
  SELECT event_type, x FROM daily WHERE rn <= {CUSUM_CAL}
), calsum AS (
  SELECT event_type, CAST(sum(x) AS HUGEINT) AS s7
  FROM cal0 GROUP BY event_type
), cal1 AS (
  SELECT c.event_type, s.s7,
         CAST(2 * max(abs({CUSUM_CAL} * c.x - s.s7)) AS HUGEINT) AS h
  FROM cal0 c JOIN calsum s ON s.event_type = c.event_type
  GROUP BY c.event_type, s.s7
), det AS (
  SELECT c.event_type, CAST({CUSUM_CAL} AS BIGINT) AS rn,
         CAST(0 AS HUGEINT) AS sp, CAST(0 AS HUGEINT) AS sm,
         c.s7, c.h
  FROM cal1 c
  UNION ALL
  SELECT d.event_type, d.rn,
         greatest(CAST(0 AS HUGEINT),
                  t.sp + ({CUSUM_CAL} * d.x - t.s7)) AS sp,
         greatest(CAST(0 AS HUGEINT),
                  t.sm - ({CUSUM_CAL} * d.x - t.s7)) AS sm,
         t.s7, t.h
  FROM daily d
  JOIN det t ON d.event_type = t.event_type AND d.rn = t.rn + 1
)
SELECT t.event_type, strftime(d.day, '%Y-%m-%d') AS day,
       CAST(d.x AS DOUBLE) / 100.0 AS rev,
       CAST(t.sp AS BIGINT) AS sp_scaled,
       CAST(t.sm AS BIGINT) AS sm_scaled,
       CAST(t.h AS BIGINT) AS h_scaled,
       (t.sp > t.h OR t.sm > t.h) AS alarm
FROM det t JOIN daily d
  ON d.event_type = t.event_type AND d.rn = t.rn
WHERE t.rn > {CUSUM_CAL}
"""


@query(
    "cusum_online_daily",
    _CUSUM_ONLINE_ORACLE,
    doc=f"ONLINE two-sided CUSUM drift detector over daily revenue "
        f"per event type (the streamable counterpart of the offline "
        f"revenue_changepoint_cusum): self-calibrates on the first "
        f"{CUSUM_CAL} days (target = calibration mean, threshold h = "
        f"2x the max calibration deviation), then runs "
        f"S+ = max(0, S+ + D), S- = max(0, S- - D) with "
        f"D = {CUSUM_CAL}*x - sum(cal) — everything scaled by the "
        f"window length so the entire recurrence is EXACT INTEGER "
        f"cents, no mean division ever happens, and the iterates "
        f"hash-match the recursive-CTE oracle bitwise. alarm = "
        f"either side exceeds h. streaming/cusum_state.py runs the "
        f"identical recurrence as keyed day-close state "
        f"(tests/test_streaming_cusum.py pins stream==batch parity). "
        f"One daily aggregation; the recurrence runs over the tiny "
        f"per-type series.",
    tags=("timeseries", "stats", "state", "stream-parity"),
)
def q_cusum_online_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    daily = (events
             .groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("x")))

    # imported at BUILD time (driver side) and captured in the UDF
    # closure: workers of an external driver don't have this package
    # importable, so the UDF body must not import it
    from ecommerce_analytics_spark.streaming.cusum_state import (
        make_cusum_recurrence,
    )
    cusum_calibrate, cusum_step = make_cusum_recurrence()

    def detect(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day").reset_index(drop=True)
        if len(pdf) <= CUSUM_CAL:
            return pd.DataFrame(columns=[
                "event_type", "day", "rev", "sp_scaled", "sm_scaled",
                "h_scaled", "alarm"])
        xs = [int(v) for v in pdf["x"]]
        s7, h = cusum_calibrate(xs[:CUSUM_CAL])
        sp = sm = 0
        out = []
        for t in range(CUSUM_CAL, len(xs)):
            sp, sm = cusum_step(sp, sm, xs[t], s7)
            out.append((pdf["event_type"][t],
                        pdf["day"][t].strftime("%Y-%m-%d"),
                        float(xs[t]) / 100.0, sp, sm, h,
                        sp > h or sm > h))
        return pd.DataFrame(out, columns=[
            "event_type", "day", "rev", "sp_scaled", "sm_scaled",
            "h_scaled", "alarm"])

    return (daily.groupBy("event_type")
            .applyInPandas(detect,
                           "event_type string, day string, rev double, "
                           "sp_scaled long, sm_scaled long, "
                           "h_scaled long, alarm boolean"))
