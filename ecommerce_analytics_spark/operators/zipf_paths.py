"""Corpus Zipf exponent and top user journey paths.

``zipf_vocab_exponent`` — the classic corpus-statistics diagnostic
(Zipf 1949): regress ln(frequency) on ln(rank) over the full
vocabulary; natural corpora give a slope near -1, and a synthetic or
heavily-filtered corpus announces itself by deviating. Ranking uses a
TOTAL order (count DESC, word) so tied frequencies rank
deterministically; both logs are one ln() of an exact BIGINT snapped
to 1e-9 fixed point, and the OLS moments run in exact
DECIMAL(38,0)/HUGEINT (the [[price_elasticity_by_brand]] discipline)
— slope and intercept are single divisions of exact integers.

``top_event_paths`` — path mining, the sequence-analytics staple
([[event_transition_matrix]] is the order-1 view; this is the literal
top-k journeys): per (user, day), the first 5 event types in (ts,
event_id) order joined with '>' into a path string, counted across
all journeys, top 50 with a total (count DESC, path) tie-break.

Scale shape: Zipf is one token-count shuffle then a vocab-sized
window + one scalar moment aggregate. Paths are one keyed window +
one (user, day) aggregation + one path-count aggregation +
TakeOrderedAndProject. No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

LOG_FIX = 1_000_000_000
_DEC = "decimal(38,0)"

_ZIPF_ORACLE = f"""
WITH words AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
), ranked AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY c DESC, tok)
                            AS DOUBLE)) * {LOG_FIX}) AS BIGINT) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)) * {LOG_FIX}) AS BIGINT) AS y
  FROM words
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_words,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / {LOG_FIX}, 6) AS intercept_ln_freq
FROM m
"""


@query(
    "zipf_vocab_exponent",
    _ZIPF_ORACLE,
    doc="Zipf's-law fit over the corpus vocabulary: OLS slope of "
        "ln(frequency) on ln(rank), rank by the total "
        "(count DESC, word) order so ties are deterministic. Logs "
        "snap to 1e-9 fixed point; moments in exact DECIMAL(38,0)/"
        "HUGEINT; slope/intercept single exact-integer divisions. "
        "One token-count shuffle, a vocab-sized ranking window, one "
        "scalar moment aggregate.",
    tags=("text", "stats", "north-star"),
)
def q_zipf_vocab_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (docs.select(F.explode(F.split("text", " ")).alias("tok"))
             .groupBy("tok")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
    w = Window.orderBy(F.col("c").desc(), "tok")
    ranked = words.select(
        F.round(F.log(F.row_number().over(w).cast("double"))
                * LOG_FIX).cast("bigint").alias("x"),
        F.round(F.log(F.col("c").cast("double"))
                * LOG_FIX).cast("bigint").alias("y"))
    m = ranked.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("x").cast(_DEC)).cast(_DEC).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).cast(_DEC).alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("y")).cast(_DEC).alias("sxy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x")).cast(_DEC).alias("sxx"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slope = num.cast("double") / den.cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_words"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy").cast("double")
                 - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double") / LOG_FIX, 6)
        .alias("intercept_ln_freq"))


PATH_LEN = 5
PATH_TOP_K = 50

_PATHS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
), paths AS (
  SELECT user_id, day,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM seq WHERE rn <= {PATH_LEN}
  GROUP BY user_id, day
)
SELECT path, CAST(count(*) AS BIGINT) AS n_journeys
FROM paths GROUP BY path
ORDER BY n_journeys DESC, path
LIMIT {PATH_TOP_K}
"""


@query(
    "top_event_paths",
    _PATHS_ORACLE,
    doc=f"Journey path mining: per (user, day), the first {PATH_LEN} "
        f"event types in (ts, event_id) order joined into a '>' path "
        f"string; top {PATH_TOP_K} paths by journey count with a "
        f"total (count DESC, path) tie-break, so the LIMIT set is "
        f"engine-deterministic. One keyed window + (user, day) "
        f"aggregation + path count + TakeOrderedAndProject.",
    tags=("funnel", "window", "agg"),
)
def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = (events.select("user_id", F.to_date("ts").alias("day"),
                         "event_type", "ts", "event_id")
           .withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= PATH_LEN))
    paths = (seq.groupBy("user_id", "day")
             .agg(F.concat_ws(">", F.transform(
                 F.sort_array(F.collect_list(F.struct("rn", "event_type"))),
                 lambda s: s["event_type"])).alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_journeys"))
            .orderBy(F.col("n_journeys").desc(), "path")
            .limit(PATH_TOP_K))


# ---------------------------------------------------------------------------
# Heaps' law: vocabulary growth V(n) ~ K * n^beta

_HEAPS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, i AS pos, t[i] AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL unnest(generate_series(1, len(t))) AS u(i)
), firsts AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS new_words
  FROM (SELECT tok, doc_id,
               row_number() OVER (PARTITION BY tok
                                  ORDER BY doc_id, pos) AS rn
        FROM toks)
  WHERE rn = 1 GROUP BY doc_id
), per_doc AS (
  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         coalesce(any_value(f.new_words), 0) AS new_words
  FROM toks t LEFT JOIN firsts f ON f.doc_id = t.doc_id
  GROUP BY t.doc_id
), cum AS (
  SELECT doc_id,
         CAST(sum(n_toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum_toks,
         CAST(sum(new_words) OVER (ORDER BY doc_id) AS BIGINT) AS cum_vocab
  FROM per_doc
), pts AS (
  SELECT CAST(round(ln(CAST(cum_toks AS DOUBLE)) * {LOG_FIX}) AS BIGINT)
           AS x,
         CAST(round(ln(CAST(cum_vocab AS DOUBLE)) * {LOG_FIX}) AS BIGINT)
           AS y
  FROM cum
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_docs,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta,
       round((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / {LOG_FIX}, 6) AS intercept_ln_vocab
FROM m
"""


@query(
    "heaps_vocab_growth",
    _HEAPS_ORACLE,
    doc="Heaps'-law fit — Zipf's companion: cumulative vocabulary "
        "size vs cumulative token count across the doc_id-ordered "
        "corpus (first occurrence of each token attributed to its "
        "minimal (doc_id, pos)), then the OLS slope of ln(V) on ln(n) "
        "— natural corpora give beta in (0.4, 0.8). Running sums are "
        "exact-integer windows over the doc-count series; logs snap "
        "to 1e-9 fixed point; moments in DECIMAL(38,0)/HUGEINT; "
        "slope/intercept single exact-integer divisions. One token "
        "shuffle for first-occurrence marks, one per-doc count, "
        "windows on the docs series.",
    tags=("text", "stats", "north-star"),
)
def q_heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id",
                        F.posexplode(F.split("text", " "))
                        .alias("pos0", "tok"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok"))
    w_first = Window.partitionBy("tok").orderBy("doc_id", "pos")
    firsts = (toks.withColumn("rn", F.row_number().over(w_first))
              .filter(F.col("rn") == 1)
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("bigint").alias("new_words")))
    per_doc = (toks.groupBy("doc_id")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_toks"))
               .join(firsts, "doc_id", "left")
               .select("doc_id", "n_toks",
                       F.coalesce("new_words", F.lit(0))
                       .cast("bigint").alias("new_words")))
    w_cum = (Window.orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = per_doc.select(
        F.sum("n_toks").over(w_cum).cast("bigint").alias("cum_toks"),
        F.sum("new_words").over(w_cum).cast("bigint").alias("cum_vocab"))
    pts = cum.select(
        F.round(F.log(F.col("cum_toks").cast("double")) * LOG_FIX)
        .cast("bigint").alias("x"),
        F.round(F.log(F.col("cum_vocab").cast("double")) * LOG_FIX)
        .cast("bigint").alias("y"))
    m = pts.agg(
        F.count(F.lit(1)).cast(_DEC).alias("n"),
        F.sum(F.col("x").cast(_DEC)).cast(_DEC).alias("sx"),
        F.sum(F.col("y").cast(_DEC)).cast(_DEC).alias("sy"),
        F.sum(F.col("x").cast(_DEC) * F.col("y")).cast(_DEC).alias("sxy"),
        F.sum(F.col("x").cast(_DEC) * F.col("x")).cast(_DEC).alias("sxx"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slope = num.cast("double") / den.cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round((F.col("sy").cast("double")
                 - slope * F.col("sx").cast("double"))
                / F.col("n").cast("double") / LOG_FIX, 6)
        .alias("intercept_ln_vocab"))
