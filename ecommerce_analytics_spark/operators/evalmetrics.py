"""Exact evaluation / concentration / serial-correlation metrics.

A training-data pipeline doesn't stop at producing scores — it has to
EVALUATE them. This module adds the standard evaluation surfaces as
engine queries, each under the integer-exactness discipline (integer
sufficient statistics, one rounded IEEE division at the very end) so
the cross-engine hash gate certifies them bitwise:

* ``langid_stopword_auc`` — exact ROC-AUC (Mann-Whitney with tie
  handling) of the stopword-density score as an English detector;
* ``quality_score_calibration`` — the reliability table behind a
  calibration plot for the same detector;
* ``customer_revenue_gini`` — Gini coefficient + Lorenz deciles of
  per-customer purchase revenue (concentration / skew profiling —
  the statistic behind "do 10% of customers drive 90% of revenue",
  and the duplication-skew audit for a corpus);
* ``daily_revenue_acf`` — autocorrelation function of the dense daily
  revenue series at lags 1..14 (the seasonality evidence the
  forecast family (timeseries.py, C5) assumes).

AUC is computed from grouped score counts, not per-row ranks: group by
score, running count of negatives below, then
``AUC = sum(n_pos * (2*neg_below + n_neg)) / (2 * P * N)`` — the
tie-corrected Mann-Whitney U. Only compact (score, counts) rows
shuffle; the per-doc scoring is map-local, so the plan survives any
corpus size. The score itself is ``floor(n_stopwords * 1e6 /
n_tokens)`` — the floor is exact in IEEE for counts < ~2e10 per token
(integer-ratio quantization), making tie groups engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import cents, cents_sql
from ecommerce_analytics_spark.operators.text import STOPWORDS
from ecommerce_analytics_spark.plans.registry import query

_DEC = "decimal(38,0)"
SCORE_FIX = 1_000_000

_SW = ", ".join(f"'{w}'" for w in STOPWORDS)

# shared scorer CTE: integer-quantized stopword density + binary label
_FEAT_CTE = f"""feat AS (
  SELECT doc_id, (lang = 'en') AS is_pos,
         CAST(floor(
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ({_SW}))) AS DOUBLE)
           * {SCORE_FIX} / len(string_split(text, ' '))) AS BIGINT) AS s
  FROM documents
)"""

_AUC_ORACLE = f"""
WITH {_FEAT_CTE}, by_s AS (
  SELECT s,
         CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS HUGEINT) AS np,
         CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS HUGEINT) AS nn
  FROM feat GROUP BY s
), cum AS (
  SELECT s, np, nn,
         coalesce(sum(nn) OVER (ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           CAST(0 AS HUGEINT)) AS neg_below
  FROM by_s
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nn) AS BIGINT) AS n_neg,
       round(CAST(sum(np * (2 * neg_below + nn)) AS DOUBLE)
             / (2.0 * CAST(sum(np) AS DOUBLE)
                * CAST(sum(nn) AS DOUBLE)), 8) AS auc,
       round(CAST(sum(np * (2 * neg_below + nn)) AS DOUBLE)
             / (CAST(sum(np) AS DOUBLE) * CAST(sum(nn) AS DOUBLE))
             - 1.0, 8) AS gini_coef
FROM cum
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    n_sw = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    s = F.floor(n_sw.cast("double") * SCORE_FIX / F.size(tokens))
    return docs.select(
        "doc_id", (F.col("lang") == "en").alias("is_pos"),
        s.cast("long").alias("s"))


@query(
    "langid_stopword_auc",
    _AUC_ORACLE,
    doc="Exact ROC-AUC (tie-corrected Mann-Whitney) of the stopword-"
        "density score as an English detector, plus the equivalent "
        "classifier Gini (2*AUC-1). Computed from grouped score counts "
        "— per-doc scoring is map-local, only (score, n_pos, n_neg) "
        "rows shuffle, the running negative count is one tiny window "
        "over distinct scores — so the plan is corpus-size-proof. "
        "Integer numerator (sum of pos*(2*neg_below+neg) products in "
        "decimal(38,0)/HUGEINT), one rounded IEEE division at the end.",
    tags=("ml", "eval", "text", "north-star"),
)
def q_langid_stopword_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    by_s = (_scored(spark, sf_dir)
            .groupBy("s")
            .agg(F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
                 .cast(_DEC).alias("np"),
                 F.sum(F.when(F.col("is_pos"), 0).otherwise(1))
                 .cast(_DEC).alias("nn")))
    w = (Window.orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = by_s.select(
        "np", "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0).cast(_DEC))
        .alias("neg_below"))
    num = F.sum(F.col("np") * (2 * F.col("neg_below") + F.col("nn"))) \
           .cast("double")
    pos = F.sum("np").cast("double")
    neg = F.sum("nn").cast("double")
    return cum.groupBy().agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.round(num / (2.0 * pos * neg), 8).alias("auc"),
        F.round(num / (pos * neg) - 1.0, 8).alias("gini_coef"))


_CALIB_ORACLE = f"""
WITH {_FEAT_CTE}
SELECT CAST(s // 100000 AS BIGINT) AS score_bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       round(CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS pos_rate,
       round(CAST(sum(s) AS DOUBLE) / count(*) / {SCORE_FIX}, 6)
         AS mean_score
FROM feat
GROUP BY 1
"""


@query(
    "quality_score_calibration",
    _CALIB_ORACLE,
    doc="Reliability table (calibration-plot input) for the stopword-"
        "density English detector: decile score bins vs empirical "
        "positive rate and mean score. One map-local scoring pass + "
        "one 11-key aggregation — nothing about the plan changes with "
        "corpus size.",
    tags=("ml", "eval", "text"),
)
def q_quality_score_calibration(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    scored = _scored(spark, sf_dir)
    return (scored
            .groupBy(F.floor(F.col("s") / 100000).cast("long")
                     .alias("score_bin"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
                 .alias("n_pos"),
                 F.round(F.sum(F.when(F.col("is_pos"), 1).otherwise(0))
                         .cast("double") / F.count(F.lit(1)), 6)
                 .alias("pos_rate"),
                 F.round(F.sum("s").cast("double") / F.count(F.lit(1))
                         / SCORE_FIX, 6).alias("mean_score")))


_GINI_ORACLE = f"""
WITH rev AS (
  SELECT user_id, CAST(sum({cents_sql("value")}) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), ranked AS (
  SELECT x,
         row_number() OVER (ORDER BY x, user_id) AS i,
         ntile(10) OVER (ORDER BY x, user_id) AS decile
  FROM rev
), tot AS (
  SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s,
         CAST(sum(CAST(i AS HUGEINT) * x) AS HUGEINT) AS ix
  FROM ranked
), by_dec AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(x) AS BIGINT) AS revenue_cents
  FROM ranked GROUP BY decile
)
SELECT d.decile, d.n_customers, d.revenue_cents,
       round(CAST(sum(d.revenue_cents) OVER (ORDER BY d.decile)
                  AS DOUBLE) / CAST(t.s AS DOUBLE), 6) AS cum_share,
       round(CAST(2 * t.ix - (t.n + 1) * t.s AS DOUBLE)
             / (CAST(t.n AS DOUBLE) * CAST(t.s AS DOUBLE)), 8)
         AS gini_coef
FROM by_dec d, tot t
"""


@query(
    "customer_revenue_gini",
    _GINI_ORACLE,
    doc="Revenue concentration: exact Gini coefficient "
        "((2*sum(i*x_i) - (n+1)*S) / (n*S) over ascending-sorted "
        "integer cents, tie-robust) + the Lorenz-curve deciles "
        "(cumulative revenue share per customer decile). One "
        "customer aggregation, one global sort shared by row_number "
        "and ntile, integer accumulators in decimal(38,0)/HUGEINT. "
        "The same query profiles duplication skew when x is "
        "per-cluster duplicate counts.",
    tags=("agg", "eval", "window"),
)
def q_customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    rev = (events.filter(F.col("event_type") == "purchase")
           .groupBy("user_id")
           .agg(F.sum(cents("value")).alias("x")))
    w = Window.orderBy("x", "user_id")
    ranked = rev.select(
        "x", F.row_number().over(w).alias("i"),
        F.ntile(10).over(w).alias("decile"))
    tot = ranked.groupBy().agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").cast(_DEC).alias("s"),
        F.sum(F.col("i").cast(_DEC) * F.col("x")).alias("ix"))
    by_dec = (ranked.groupBy("decile")
              .agg(F.count(F.lit(1)).alias("n_customers"),
                   F.sum("x").alias("revenue_cents")))
    wd = Window.orderBy("decile") \
               .rowsBetween(Window.unboundedPreceding, 0)
    return (by_dec.join(F.broadcast(tot))
            .select("decile", "n_customers", "revenue_cents",
                    F.round(F.sum("revenue_cents").over(wd)
                            .cast("double") / F.col("s").cast("double"),
                            6).alias("cum_share"),
                    F.round((2 * F.col("ix")
                             - (F.col("n") + 1) * F.col("s"))
                            .cast("double")
                            / (F.col("n").cast("double")
                               * F.col("s").cast("double")), 8)
                    .alias("gini_coef")))


ACF_MAX_LAG = 14

_ACF_ORACLE = f"""
WITH daily0 AS (
  SELECT date_trunc('day', ts) AS d,
         CAST(sum({cents_sql("value")}) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), bounds AS (
  SELECT min(d) AS lo, max(d) AS hi FROM daily0
), daily AS (
  SELECT s.d, coalesce(h.x, 0) AS x
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d
        FROM bounds) s
  LEFT JOIN daily0 h ON s.d = h.d
), pairs AS (
  SELECT g.lag, CAST(a.x AS HUGEINT) AS x, CAST(b.x AS HUGEINT) AS y
  FROM (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag) g
  JOIN daily a ON true
  JOIN daily b ON b.d = a.d + to_days(CAST(g.lag AS INTEGER))
), st AS (
  SELECT lag, CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS acf
FROM st
"""


@query(
    "daily_revenue_acf",
    _ACF_ORACLE,
    doc="Autocorrelation function of the dense (gap-zero-filled) daily "
        "revenue series at lags 1..14 — exact Pearson r per lag from "
        "integer sufficient statistics (n*Sxy - Sx*Sy numerators in "
        "decimal(38,0)/HUGEINT, one rounded IEEE division each). The "
        "weekly-seasonality evidence the C5 forecast family assumes. "
        "The daily series is one row per day regardless of event "
        "volume, so the lag self-join is a broadcast of a tiny series; "
        "only the first aggregation touches data.",
    tags=("timeseries", "eval", "window"),
)
def q_daily_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily0 = (events.filter(F.col("event_type") == "purchase")
              .groupBy(F.date_trunc("day", "ts").alias("d"))
              .agg(F.sum(cents("value")).alias("x"))
              # day-sized; feeds the spine bounds, the fill join, and
              # both lag sides — checkpoint once so the events fact is
              # scanned once, not 4x (r11 scan-discipline recipe)
              .localCheckpoint(eager=True))
    spine = (daily0.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
             .select(F.explode(F.sequence(
                 "lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")))
    daily = (spine.join(daily0, "d", "left")
             .select("d", F.coalesce("x", F.lit(0)).alias("x")))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (a.crossJoin(F.broadcast(lags))
             .join(F.broadcast(b),
                   F.col("b.d") == F.expr(
                       "a.d + make_interval(0, 0, 0, lag, 0, 0, 0)"))
             .select("lag", F.col("a.x").cast(_DEC).alias("x"),
                     F.col("b.x").cast(_DEC).alias("y")))
    st = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    return st.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        F.round((F.col("n") * F.col("sxy")
                 - F.col("sx") * F.col("sy")).cast("double")
                / F.sqrt((F.col("n") * F.col("sxx")
                          - F.col("sx") * F.col("sx")).cast("double")
                         * (F.col("n") * F.col("syy")
                            - F.col("sy") * F.col("sy")).cast("double")),
                6).alias("acf"))
