"""Z-order (Morton) data layout for multi-dimensional file skipping.

Min/max data skipping only prunes on the column a table is sorted by;
a 100 TB fact queried by BOTH part and supplier needs a layout where
every file covers a compact rectangle in (partkey, suppkey) space.
Z-ordering delivers that: range-normalize each dimension to a common
16-bit domain, interleave the bits into one Morton code,
range-partition by it, and every output file's min/max envelope is
tight on both dimensions — the trick behind Delta/Iceberg's OPTIMIZE
ZORDER, built here from pure column arithmetic (shifts/masks/ors —
whole-stage-codegen JVM expressions, no UDF).

Normalization is NOT optional: dimensions with unequal bit widths
(suppkey spans 4 bits at small SF while partkey spans 11) otherwise
collapse the interleave into a plain sort on the wider key. The
per-dimension max comes from one single-row aggregate broadcast back
— the same scalar-stats shape bm25 uses. All integer arithmetic is
exact (``div`` in Spark, ``//`` in DuckDB), so the oracle certifies
the codes bit-for-bit.

``write_zordered`` is the deployment API: repartitionByRange on the
Morton key + sortWithinPartitions, then a plain parquet write — at
100 TB this is one sampled-boundary range exchange and the write,
nothing else. The registered query certifies the arithmetic: per
Z-bucket (top-6 Morton bits, 64 buckets at every SF thanks to the
normalization) row counts, min/max rectangles on BOTH source
dimensions, and a full BIGINT Morton checksum.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

MORTON_BITS = 16          # bits per dimension (32-bit Morton code)
ZBUCKET_SHIFT = 2 * MORTON_BITS - 6   # top-6 Morton bits → 64 buckets
_NORM_MAX = (1 << MORTON_BITS) - 1    # 65535


def idiv(a: Column, b: Column) -> Column:
    """Exact integer floor division for non-negative longs using only
    exact ops (pmod + exact double division of a multiple)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def normalize16(key: Column, max_col: Column) -> Column:
    """Range-normalize a non-negative integer key to [0, 65535] given
    its column max (broadcast scalar): key * 65535 div max."""
    return idiv(key.cast("long") * _NORM_MAX,
                F.greatest(max_col.cast("long"), F.lit(1)))


def morton_key(a: Column, b: Column, bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative integer columns
    (a's bit i lands at 2i+1, b's at 2i). Pure bitwise column
    arithmetic — codegen-friendly, no UDF, deterministic everywhere."""
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    parts = []
    for i in range(bits):
        parts.append(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(Column.bitwiseOR, parts)


def zorder_keys(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Attach a ``morton`` column: per-dim maxes via one broadcast
    single-row aggregate, 16-bit normalization, bit interleave."""
    stats = df.agg(F.max(col_a).cast("long").alias("_max_a"),
                   F.max(col_b).cast("long").alias("_max_b"))
    return (df.join(F.broadcast(stats))
            .withColumn("morton", morton_key(
                normalize16(F.col(col_a), F.col("_max_a")),
                normalize16(F.col(col_b), F.col("_max_b"))))
            .drop("_max_a", "_max_b"))


def write_zordered(df: DataFrame, col_a: str, col_b: str, path: str,
                   n_files: int) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-ordered on
    (col_a, col_b): one range exchange on the Morton key, local sort,
    plain write. Readers filtering on EITHER dimension skip most
    files via parquet min/max stats."""
    (zorder_keys(df, col_a, col_b)
     .repartitionByRange(n_files, "morton")
     .sortWithinPartitions("morton")
     .drop("morton")
     .write.mode("overwrite").parquet(path))


def _morton_sql(a: str, b: str, bits: int = MORTON_BITS) -> str:
    # NB: DuckDB/Postgres give all bitwise operators EQUAL precedence
    # (left-associative), so every term is fully parenthesized.
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((({a} & {mask}) >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"(((({b} & {mask}) >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"


_ZORDER_ORACLE = f"""
WITH stats AS (
  SELECT CAST(max(l_partkey) AS BIGINT) AS max_p,
         CAST(max(l_suppkey) AS BIGINT) AS max_s
  FROM lineitem
), norm AS (
  SELECT l_partkey, l_suppkey,
         (l_partkey * {_NORM_MAX}) // greatest(max_p, 1) AS np,
         (l_suppkey * {_NORM_MAX}) // greatest(max_s, 1) AS ns
  FROM lineitem, stats
), z AS (
  SELECT l_partkey, l_suppkey,
         CAST({_morton_sql("np", "ns")} AS BIGINT) AS morton
  FROM norm
)
SELECT CAST(morton >> {ZBUCKET_SHIFT} AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_partkey) AS BIGINT) AS min_part,
       CAST(max(l_partkey) AS BIGINT) AS max_part,
       CAST(min(l_suppkey) AS BIGINT) AS min_supp,
       CAST(max(l_suppkey) AS BIGINT) AS max_supp,
       CAST(sum(morton) AS BIGINT) AS morton_checksum
FROM z GROUP BY zbucket
"""


@query(
    "zorder_bucket_profile",
    _ZORDER_ORACLE,
    doc=f"Z-order layout profile: (l_partkey, l_suppkey) range-"
        f"normalized to {MORTON_BITS} bits each and Morton-interleaved "
        "— pure shift/mask/or column arithmetic — rolled up into 64 "
        "Z-buckets with per-bucket counts, min/max rectangles on BOTH "
        "dimensions, and a full BIGINT Morton checksum. Certifies the "
        "exact codes the write_zordered layout API range-partitions "
        "by. One broadcast scalar-stats aggregate + one map-side-"
        "combined exchange on 64 bucket keys.",
    tags=("layout", "north-star"),
)
def q_zorder_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    z = zorder_keys(li.select("l_partkey", "l_suppkey"),
                    "l_partkey", "l_suppkey")
    return (z.groupBy(F.shiftright("morton", ZBUCKET_SHIFT)
                      .cast("long").alias("zbucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("l_partkey").cast("long").alias("min_part"),
                 F.max("l_partkey").cast("long").alias("max_part"),
                 F.min("l_suppkey").cast("long").alias("min_supp"),
                 F.max("l_suppkey").cast("long").alias("max_supp"),
                 F.sum("morton").cast("long").alias("morton_checksum")))


@query(
    "lake_schema_evolution_rollup",
    """
    WITH ev AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01', date_trunc('day', ts)) % 2
               AS epoch,
             CAST(length(props) AS BIGINT) AS quality_score
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(CASE WHEN epoch = 1 THEN 1 END) AS BIGINT)
             AS n_scored,
           CAST(sum(CASE WHEN epoch = 1 THEN quality_score END) AS BIGINT)
             AS score_sum
    FROM ev GROUP BY event_type
    """,
    doc="Schema evolution across lake partitions, certified end to "
        "end: even-day events are written WITHOUT the quality_score "
        "column (the historical layout), odd-day events WITH it (the "
        "evolved layout), into epoch= partition directories of one "
        "table. The unified read uses mergeSchema + partition "
        "discovery, so historical rows surface NULL for the new "
        "column and the rollup counts scored vs total per event type "
        "— the exact upgrade path a 100 TB lake takes when a pipeline "
        "adds a column (no rewrite of old partitions; the footer "
        "union is per-file metadata work). The oracle recomputes the "
        "same rollup straight from the source table, so the "
        "write→evolve→merge-read roundtrip must be lossless to "
        "hash-match.",
    tags=("io", "lake", "schema-evolution", "scale"),
)
def q_lake_schema_evolution_rollup(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    import os

    from ecommerce_analytics_spark.io import run_tmpdir

    events = load_table(spark, sf_dir, "events")
    day_epoch = (F.datediff(F.date_trunc("day", "ts"),
                            F.lit("1970-01-01").cast("date")) % 2)
    base = events.withColumn("_epoch", day_epoch)
    root = run_tmpdir(prefix="lake_evo_")
    table = os.path.join(root, "events_evolved")
    # historical layout: no quality_score column
    (base.filter(F.col("_epoch") == 0)
     .select("event_id", "event_type")
     .write.mode("overwrite").parquet(os.path.join(table, "epoch=0")))
    # evolved layout: quality_score added (deterministic stand-in)
    (base.filter(F.col("_epoch") == 1)
     .select("event_id", "event_type",
             F.length("props").cast("long").alias("quality_score"))
     .write.mode("overwrite").parquet(os.path.join(table, "epoch=1")))

    merged = (spark.read.option("mergeSchema", "true")
              .option("basePath", table).parquet(table))
    return (merged.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.count("quality_score").cast("long").alias("n_scored"),
                 F.sum("quality_score").cast("long").alias("score_sum")))
