"""Streaming admission against the persisted dedup index (N1 twin).

The nightly shape (dedup_index.py) admits a batch against stored index
artifacts; the streaming shape admits documents AS THEY ARRIVE. Each
micro-batch runs the identical ``admit_incoming`` plan against the
Parquet index via ``foreachBatch`` — the batch/stream parity argument
is structural: admission is per-document against a FROZEN index
generation (no incoming×incoming comparisons), so micro-batch
boundaries cannot change any verdict. The parity test
(tests/test_incremental_admit.py) asserts it row-for-row anyway.

Scale shape: per micro-batch, only the batch's shingles are computed
and shuffled; the index side is a Parquet scan pruned to the probed
``band=`` partitions. State lives in the store, not in Spark —
restarts are free (the checkpoint tracks only source offsets) and
index generations roll by pointing at a new path, the same blue/green
pattern a deployed gate uses.

Idempotent replay: the sink is hive-partitioned by ``batch_id`` and
each micro-batch writes with DYNAMIC partition overwrite — a batch
replayed after a failure between sink write and checkpoint commit
overwrites its own partition instead of appending duplicate verdict
rows, which combined with deterministic admission gives effective
exactly-once into the Parquet sink (the standard foreachBatch
idempotent-write recipe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ecommerce_analytics_spark.operators.dedup_index import (
    admit_against_stored,
)


def streaming_incremental_admit(spark: SparkSession, incoming: DataFrame,
                                index_path: str, checkpoint: str,
                                out_path: str) -> StreamingQuery:
    """Admit a streaming ``incoming`` (doc_id, text) source against the
    stored index; append per-doc verdict rows to a Parquet sink at
    ``out_path`` (swap the writer for kafka/delta in a deployment —
    the foreachBatch body is sink-agnostic)."""

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        (admit_against_stored(spark, batch_df, index_path)
         .withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(out_path))

    return (incoming.writeStream
            .foreachBatch(admit_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .start())
