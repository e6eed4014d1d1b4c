"""Customer segmentation — RFM features + KMeans (C3, README.md:59).

Feature build is pure DataFrame aggregation (one shuffle on custkey);
KMeans runs on the compact per-customer table (rows = customers, not
transactions), so at 100 TB the iterative part touches ~millions of
rows, not the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.numerics import money_sum, money_sum_sql
from ecommerce_analytics_spark.plans.registry import query

K_SEGMENTS = 4
SEED = 42


def rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency (days since last order), Frequency (order count),
    Monetary (total spend) per customer.

    Feature contract (oracle twin): an RFM row needs a customer and a
    dated order — a NULL custkey isn't a segmentable entity, and an
    undated order would make recency NULL, which the VectorAssembler →
    KMeans chain downstream rejects outright. No-op on clean data."""
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_custkey").isNotNull()
                      & F.col("o_orderdate").isNotNull()))
    max_date = orders.agg(F.max("o_orderdate").alias("d"))
    return (
        orders.crossJoin(F.broadcast(max_date))
        .groupBy(F.col("o_custkey").alias("customer_id"))
        .agg(
            F.datediff(F.any_value("d"), F.max("o_orderdate"))
            .cast("double").alias("recency_days"),
            F.count(F.lit(1)).cast("double").alias("frequency"),
            money_sum("o_totalprice").alias("monetary"),
        )
    )


@query(
    "rfm_features",
    f"""
    WITH rfm_orders AS (
      SELECT * FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), md AS (SELECT max(o_orderdate) AS d FROM rfm_orders)
    SELECT o_custkey AS customer_id,
           CAST(date_diff('day', max(o_orderdate), any_value(md.d)) AS DOUBLE)
             AS recency_days,
           CAST(count(*) AS DOUBLE) AS frequency,
           {money_sum_sql('o_totalprice')} AS monetary
    FROM rfm_orders CROSS JOIN md
    GROUP BY o_custkey
    """,
    doc="C3 feature build: RFM per customer — the input to KMeans "
        "segmentation, itself oracle-checked.",
    tags=("ml", "agg", "tier-c"),
)
def q_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_features(spark, sf_dir)


def q_rfm_kmeans_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 behavioral clustering (pytest surface, not registered).

    Standardized RFM → KMeans k=K_SEGMENTS seed=SEED (pyspark.ml).
    Output: customer_id, segment, plus features for audit.
    Deterministic under the fixed seed. Cluster assignments have no SQL
    twin, so the raw assignment listing is a pytest surface
    (tests/test_ml.py: segment count + assignment stability under
    repartition); the registry exposes the oracle-green
    ``rfm_kmeans_quality`` companion, which runs this full fit
    internally and hash-matches its quality contract (inertia-ratio
    ceiling, exact customer count from the oracle-checked RFM build).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    # monetary coalesces to 0.0 — and the OUTPUT projection reports
    # that coalesced value too (ADVICE r7 #4): a customer whose dated
    # orders all carry NULL prices has NULL total spend in
    # rfm_features (correct, oracle-matched), but VectorAssembler
    # (handleInvalid='error') rejects NULL features outright — zero
    # spend is the right clustering interpretation of "no priced
    # orders", and the segment listing reports the feature vector the
    # model actually clustered on (monetary=0.0, not NULL), pinned by
    # tests/test_ml.py. recency/frequency are non-null by construction
    # (dated orders only; count never null).
    feats = rfm_features(spark, sf_dir).withColumn(
        "monetary", F.coalesce(F.col("monetary"), F.lit(0.0)))
    assembled = VectorAssembler(
        inputCols=["recency_days", "frequency", "monetary"],
        outputCol="rfm_raw").transform(feats)
    # cache + compact before the iterative fit: KMeans re-evaluates
    # its input (here: the whole orders shuffle + scaler transform)
    # once per iteration — see ivfpq._coarse_quantizer
    scaled = (StandardScaler(inputCol="rfm_raw", outputCol="rfm",
                             withMean=True, withStd=True)
              .fit(assembled).transform(assembled)
              .coalesce(8).cache())
    model = KMeans(k=K_SEGMENTS, seed=SEED, featuresCol="rfm",
                   predictionCol="segment").fit(scaled)
    # eager localCheckpoint: the per-customer result is bounded, and
    # cutting the lineage lets the fit cache be released instead of
    # leaking one cached feature table per invocation
    out = (model.transform(scaled)
           .select("customer_id", "recency_days", "frequency",
                   "monetary", F.col("segment").cast("int")
                   .alias("segment"))
           .localCheckpoint(eager=True))
    scaled.unpersist()
    return out


# Conservative inertia ceiling for the quality companion below: KMeans
# k=4 on standardized RFM explains far more variance than this at
# every driver SF (measured ratio ~0.2-0.45); a broken fit (collapsed
# clusters, unscaled features, wrong assignment join) pushes the
# within/total ratio toward 1.
INERTIA_RATIO_MAX = 0.9


@query(
    "rfm_kmeans_quality",
    f"""
    SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST({K_SEGMENTS} AS INTEGER) AS k,
           count(DISTINCT o_custkey) >= {K_SEGMENTS}
             AS all_segments_populated,
           TRUE AS inertia_ratio_ok
    FROM orders
    WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    """,
    doc=f"Driver-certifiable companion for rfm_kmeans_segments "
        f"(docs/SCALE.md pattern 3): the clustering itself can't "
        f"hash-match a SQL oracle, but its contract can — every "
        f"customer assigned, all {K_SEGMENTS} segments non-empty, and "
        f"within-cluster SSE < {INERTIA_RATIO_MAX} x total SSE on the "
        f"standardized features (computed IN Spark from the actual "
        f"assignments; a degenerate fit pushes the ratio toward 1). "
        f"The oracle pins the customer count exactly and asserts the "
        f"booleans.",
    tags=("ml", "tier-c"),
)
def q_rfm_kmeans_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_feats = rfm_features(spark, sf_dir).count()
    if n_feats < K_SEGMENTS:
        # fewer valid customers than clusters (the degenerate tail of
        # the empty-orders class): K_SEGMENTS segments cannot all be
        # populated and the inertia contract holds vacuously —
        # mirrors the oracle's count >= K_SEGMENTS boolean exactly
        return spark.createDataFrame(
            [(n_feats, K_SEGMENTS, False, True)],
            "n_customers bigint, k int, all_segments_populated boolean, "
            "inertia_ratio_ok boolean")
    segs = q_rfm_kmeans_segments(spark, sf_dir)
    stats = segs.agg(
        *[x for c in ("recency_days", "frequency", "monetary")
          for x in (F.avg(c).alias(f"m_{c}"),
                    F.stddev_samp(c).alias(f"s_{c}"))])

    def zscore(c):
        # a CONSTANT feature (stddev 0) standardizes to 0 everywhere —
        # the bare division would be an ANSI DIVIDE_BY_ZERO crash on a
        # degenerate-but-nonempty corpus (e.g. every customer with
        # exactly one order makes frequency constant)
        return F.when(F.col(f"s_{c}") != 0,
                      (F.col(c) - F.col(f"m_{c}")) / F.col(f"s_{c}")) \
            .otherwise(F.lit(0.0))

    z = segs.crossJoin(F.broadcast(stats)).select(
        "segment",
        *[zscore(c).alias(f"z_{c}")
          for c in ("recency_days", "frequency", "monetary")])
    # within-SSE per segment: sum(z^2) - (sum z)^2 / n, summed over dims
    per_seg = z.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        *[x for c in ("recency_days", "frequency", "monetary")
          for x in (F.sum(F.col(f"z_{c}") ** 2).alias(f"ss_{c}"),
                    F.sum(f"z_{c}").alias(f"s_{c}"))])
    within = per_seg.select(
        "n",
        sum((F.col(f"ss_{c}") - F.col(f"s_{c}") ** 2 / F.col("n"))
            for c in ("recency_days", "frequency", "monetary")).alias("w"))
    return within.agg(
        F.sum("n").alias("n_customers"),
        F.count(F.lit(1)).cast("int").alias("k"),
        (F.count(F.lit(1)) == K_SEGMENTS).alias("all_segments_populated"),
        # total SSE of sample-standardized columns is exactly
        # 3 * (n_customers - 1)
        (F.sum("w") / (F.lit(3.0) * (F.sum("n") - 1))
         < INERTIA_RATIO_MAX).alias("inertia_ratio_ok"))
