"""2-D skyline (Pareto frontier) query.

"Which parts are not dominated on (price, size)" — cheaper-or-equal
AND bigger-or-equal with at least one strict — is the classic skyline
operator (Börzsönyi et al., ICDE 2001). The direct relational
formulation is a quadratic NOT EXISTS anti-theta-join: a cross
product at plan time, a scale-killer on anything big.

For two dimensions the frontier has a monotone structure that turns
it into one aggregation plus a window over DISTINCT prices:

1. collapse rows to (price → max_size): one hash shuffle, partial
   aggregation map-side;
2. over distinct prices ordered ascending, ``best_below`` =
   running max of max_size over STRICTLY cheaper prices (rows frame
   ending at -1). A price survives iff best_below < its max_size —
   i.e. no cheaper part is at least as big;
3. map back: a part is on the skyline iff its price survives AND its
   size equals that price's max_size (same-price smaller rows are
   dominated by the max-size row; equal (price, size) duplicates are
   mutually non-dominating and all survive).

The window in step 2 is a single-partition sort — but over the
DISTINCT price values only, which is the price-domain cardinality
(bounded; ~thousands), not the row count. At 100 TB the plan is one
shuffle over the fact, a driver-scale frontier, and a broadcast join
back. The DuckDB oracle runs the exhaustive NOT EXISTS dominance
predicate (DuckDB plans it as an IEJoin), certifying the monotone
reformulation equals the quadratic semantics exactly.

The reference has no skyline capability; this extends the top-k /
ranking family (SURVEY §2.5) to multi-objective ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Rows of ``df`` not dominated on (minimize ↓, maximize ↑)."""
    stats = (df.groupBy(minimize)
             .agg(F.max(maximize).alias("_mx")))
    w = (Window.orderBy(minimize)
         .rowsBetween(Window.unboundedPreceding, -1))
    frontier = (stats
                .withColumn("_best_below", F.max("_mx").over(w))
                .filter(F.col("_best_below").isNull()
                        | (F.col("_best_below") < F.col("_mx")))
                .select(minimize, "_mx"))
    return (df.join(F.broadcast(frontier), on=minimize)
            .filter(F.col(maximize) == F.col("_mx"))
            .drop("_mx"))


_SKYLINE_ORACLE = """
WITH pts AS (
  -- skyline contract (both sides): dominance is defined only for
  -- points with BOTH coordinates — a NULL price/size row neither
  -- dominates nor is dominated under three-valued logic (it would
  -- vacuously "survive" the NOT EXISTS while poisoning the monotone
  -- reformulation's running max), so it is not a point at all
  SELECT p_partkey, p_name, p_retailprice, p_size FROM part
  WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
)
SELECT a.p_partkey, a.p_name, a.p_retailprice, a.p_size
FROM pts a
WHERE NOT EXISTS (
  SELECT 1 FROM pts b
  WHERE b.p_retailprice <= a.p_retailprice
    AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
"""


@query(
    "part_skyline", _SKYLINE_ORACLE,
    doc="Pareto frontier of parts on (p_retailprice ↓, p_size ↑): "
        "one (price → max_size) aggregation + a running-max window "
        "over distinct prices + broadcast join back — vs the DuckDB "
        "oracle's exhaustive quadratic NOT EXISTS dominance check. "
        "Monotone O(n log n) reformulation == naive semantics.",
    tags=("skyline", "window", "agg"),
)
def q_part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # dimension contract — the oracle's pts CTE twin
    pts = part.filter(F.col("p_retailprice").isNotNull()
                      & F.col("p_size").isNotNull())
    return skyline_2d(
        pts.select("p_partkey", "p_name", "p_retailprice", "p_size"),
        minimize="p_retailprice", maximize="p_size")
