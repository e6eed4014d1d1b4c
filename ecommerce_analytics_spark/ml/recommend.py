"""ALS collaborative-filtering recommendations (C4, README.md:60).

The co-occurrence/cosine variant lives in operators/joins.py
(oracle-checked); this is the latent-factor variant the reference's
requirements name. Implicit-preference ALS over (customer, part,
quantity) interactions, fixed seed, top-5 per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

SEED = 42
RANK = 8
TOP_N = 5


def _interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, item, rating) interaction matrix. Contract (oracle
    twin): MLlib ALS hard-rejects NULL users and NULL/NaN ratings
    ("Ratings MUST NOT be Null or NaN"), so an interaction needs a
    customer and a quantity."""
    lineitem = (load_table(spark, sf_dir, "lineitem")
                .filter(F.col("l_quantity").isNotNull()))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_custkey").isNotNull()))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").cast("int").alias("user"),
                 F.col("l_partkey").cast("int").alias("item"))
        .agg(F.sum("l_quantity").cast("float").alias("rating"))
    )


def q_als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 ALS (implicit, rank=RANK, seed=SEED) — pytest surface, not
    registered.

    Latent-factor top-TOP_N products per customer. Interactions
    aggregate the fact table down to (user, item) before the iterative
    solve — at 100 TB ALS touches the compact interaction matrix only.
    Latent factors have no SQL twin, so the raw recommendation listing
    is a pytest surface (tests/test_ml.py); the registry exposes the
    oracle-green ``als_recommendations_shape`` companion, which runs
    this full solve internally and hash-matches its contract (exact
    user count from the interaction join, exactly top-N per user,
    finite scores).
    """
    from pyspark.ml.recommendation import ALS

    interactions = _interactions(spark, sf_dir)
    als = ALS(rank=RANK, seed=SEED, implicitPrefs=True, maxIter=8,
              userCol="user", itemCol="item", ratingCol="rating",
              coldStartStrategy="drop")
    model = als.fit(interactions)
    recs = model.recommendForAllUsers(TOP_N)
    return recs.select(
        F.col("user").alias("customer_id"),
        F.explode("recommendations").alias("rec"),
    ).select(
        "customer_id",
        F.col("rec.item").alias("product_id"),
        F.round(F.col("rec.rating").cast("double"), 6).alias("score"),
    )


@query(
    "als_recommendations_shape",
    f"""
    WITH u AS (
      SELECT count(DISTINCT o.o_custkey) AS n_users
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey IS NOT NULL AND l.l_quantity IS NOT NULL
    )
    SELECT CAST(n_users AS BIGINT) AS n_users,
           CAST({TOP_N} AS INTEGER) AS k,
           CAST(n_users * {TOP_N} AS BIGINT) AS n_pairs,
           TRUE AS scores_valid
    FROM u
    """,
    doc=f"Driver-certifiable companion for als_recommendations "
        f"(docs/SCALE.md pattern 3): the latent-factor output can't "
        f"hash-match a SQL oracle, but its CONTRACT can — every "
        f"interacting customer gets exactly top-{TOP_N} "
        f"recommendations with finite positive-round scores. The "
        f"oracle pins the user count from the interaction join "
        f"exactly and asserts the shape/validity booleans; a broken "
        f"solve (dropped users, NaN factors, wrong k) flips them.",
    tags=("ml", "tier-c"),
)
def q_als_recommendations_shape(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    if _interactions(spark, sf_dir).isEmpty():
        # empty interaction matrix (e.g. an empty orders partition):
        # ALS cannot fit and the contract holds vacuously — the
        # oracle's aggregate over zero rows emits exactly this row.
        # An explicit isEmpty probe, not exception-message matching
        # (MLlib error text is not a stable API).
        return spark.createDataFrame(
            [(0, TOP_N, 0, True)],
            "n_users bigint, k int, n_pairs bigint, scores_valid boolean")
    recs = q_als_recommendations(spark, sf_dir)
    per_user = (recs.groupBy("customer_id")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.min("score").alias("lo"),
                     F.max(F.abs("score")).alias("hi")))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.max("n").cast("int").alias("k"),
        F.sum("n").alias("n_pairs"),
        ((F.min("n") == TOP_N) & (F.max("n") == TOP_N)
         & F.min(~F.isnan("lo") & ~F.isnan("hi"))
         & (F.max("hi") < F.lit(1e6))).alias("scores_valid"))
