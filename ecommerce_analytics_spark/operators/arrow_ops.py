"""mapInArrow surface — Arrow-native batch compute without pandas.

Completes the engine's Python-extension matrix: scalar pandas UDFs
and mapInPandas (multimodal/blobs.py), applyInPandas state passes
(timeseries EWMA, streaming LTV), Python UDTFs (udtf_ops.py), Python
DataSources (sources/) — and here ``DataFrame.mapInArrow``, the
lowest-overhead batch hook: the executor hands raw
``pyarrow.RecordBatch``es to Python with no pandas conversion on
either side, the right surface for numeric kernels that want a
zero-copy numpy view (SIMD batch scoring, codec bridges, model
inference).

Demonstrated as an Arrow twin of the int8 retrieval stage: the
candidate (query, neighbor) pairs' INTEGER dot products are computed
with one einsum over a zero-copy (batch × 64) int32 view per
RecordBatch. Integer arithmetic is associativity-free, so the Arrow
kernel's output is bit-identical to the JVM fold in
similarity.q_knn_int8 — the registered query shares that query's
oracle verbatim and hash-matches it, certifying the mapInArrow path
end to end (schema contract, list-column layout, batch iteration).

Scale shape: identical to knn_int8 (broadcast query side, candidates
never shuffled before scoring); the Arrow stage is map-only. The JVM
zip_with fold remains the default plan — this surface exists for
kernels codegen can't express (the multimodal codec bridge is the
real consumer); keeping it oracle-certified here means that bridge
rests on proven plumbing.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.operators.similarity import (
    TOP_K, int8_candidate_pairs,
)
from ecommerce_analytics_spark.plans.registry import QUERIES, query

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

EMB_DIM = 64


def arrow_int_dot(pairs: DataFrame) -> DataFrame:
    """(…, q_qv, c_qv) → (…, dot_q): exact int64 dot per row, computed
    batch-at-a-time over zero-copy numpy views of the Arrow buffers."""
    import pyarrow as pa

    keep = [c for c in pairs.columns if c not in ("q_qv", "c_qv")]
    fields = ", ".join(f"{c} {t}" for c, t in pairs.dtypes
                       if c not in ("q_qv", "c_qv"))
    out_schema = f"{fields}, dot_q bigint"

    def score(batches: "Iterator[pa.RecordBatch]") \
            -> "Iterator[pa.RecordBatch]":
        import numpy as np
        for b in batches:
            q = np.asarray(b.column("q_qv").flatten(),
                           dtype=np.int64).reshape(-1, EMB_DIM)
            c = np.asarray(b.column("c_qv").flatten(),
                           dtype=np.int64).reshape(-1, EMB_DIM)
            dots = np.einsum("ij,ij->i", q, c)
            cols = [b.column(k) for k in keep]
            yield pa.RecordBatch.from_arrays(
                cols + [pa.array(dots, type=pa.int64())],
                names=keep + ["dot_q"])

    return pairs.mapInArrow(score, out_schema)


@query(
    "knn_int8_arrow",
    None,  # oracle assigned below — shared verbatim with knn_int8
    doc=f"mapInArrow twin of knn_int8: identical quantize + broadcast "
        f"candidate join, but the integer dot products run in an "
        f"Arrow batch kernel (zero-copy numpy einsum) instead of the "
        f"JVM zip_with fold. Integer arithmetic makes the two paths "
        f"bit-identical, so this query hash-matches the SAME oracle "
        f"as knn_int8 — certifying the RecordBatch extension surface "
        f"itself. Top-{TOP_K} per query.",
    tags=("similarity", "extension", "north-star"),
)
def q_knn_int8_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = arrow_int_dot(int8_candidate_pairs(spark, sf_dir))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_q"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id", "neighbor_label",
                    "dot_q", "rank"))


# share knn_int8's oracle verbatim (module import order guarantees
# similarity.py registered first)
QUERIES["knn_int8_arrow"].oracle = QUERIES["knn_int8"].oracle
