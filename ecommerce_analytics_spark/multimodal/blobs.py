"""Multimodal column plumbing (SURVEY §2.10 N4).

Images/audio/video ride through the engine as opaque ``binary``
columns with a typed metadata struct; decode / feature-extract runs as
Arrow-batched ``mapInPandas`` over the blob column. The container has
no codec libraries, so the decode step is a deterministic md5-derived
FAKE behind ``decode_real`` (NotImplementedError) — the Spark-side
contract (schema, batch iteration, partition pruning on metadata, UDF
closure pickling) is real and oracle-checked, and swapping in PIL/
ffmpeg touches only the one marked function.

The synthetic stand-in blob is the document text encoded UTF-8 (the
driver tables carry no binary column).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

DECODED_SCHEMA = ("doc_id long, n_bytes long, width int, height int, "
                  "n_frames int")


def decode_real(blob: bytes) -> tuple[int, int, int]:
    """Real decoder hook (image/audio/video → dims/frames).

    Not implemented in this container (no PIL/ffmpeg); replace this
    single function to enable real decoding — the distributed plumbing
    around it does not change.
    """
    raise NotImplementedError("codec libraries not available in v1 image")


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched fake decode over the blob column.

    Deterministic md5-derived dimensions stand in for the real decoder
    so the full pipeline (batch shapes, schema, downstream joins) is
    testable — and reproducible in the SQL oracle.
    """

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs_col = pdf["blob"]
            digests = [hashlib.md5(b).hexdigest() for b in blobs_col]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in blobs_col],
                "width": [16 + int(d[0], 16) for d in digests],
                "height": [16 + int(d[1], 16) for d in digests],
                "n_frames": [1 + int(d[2], 16) % 8 for d in digests],
            })

    return blobs.select("doc_id", "blob").mapInPandas(
        fake_decode, schema=DECODED_SCHEMA)


_DECODE_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(16 + instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1
            AS INTEGER) AS width,
       CAST(16 + instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1
            AS INTEGER) AS height,
       CAST(1 + (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) % 8
            AS INTEGER) AS n_frames
FROM documents
"""


@query(
    "multimodal_decode_features",
    _DECODE_ORACLE,
    doc="N4 decode plumbing: binary column → mapInPandas (Arrow batches) "
        "→ typed feature rows. The fake decoder's md5-derived output is "
        "reproduced by the SQL oracle, certifying schema, batch shape, "
        "and values of the distributed path; decode_real() is the one "
        "marked swap-in point for actual codecs.",
    tags=("multimodal", "pandas-udf", "north-star"),
)
def q_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_features(with_blob(docs))


FRAME_STRIDE = 2

_FRAME_FP_SQL = "(" + " + ".join(
    f"CAST((instr('0123456789abcdef', substring(md5(text || ':' || CAST(s AS STRING)), {d + 1}, 1)) - 1) AS BIGINT)"
    f" * {16 ** (8 - 1 - d)}" for d in range(8)) + ")"

_FRAME_SAMPLE_ORACLE = f"""
WITH dec AS (
  SELECT doc_id, text,
         1 + (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) % 8
           AS n_frames
  FROM documents
)
SELECT doc_id, CAST(s AS INTEGER) AS frame_idx,
       CAST(n_frames AS INTEGER) AS n_frames,
       {_FRAME_FP_SQL} AS frame_fp
FROM dec, unnest(generate_series(1, n_frames, {FRAME_STRIDE})) AS u(s)
"""


@query(
    "multimodal_frame_sample",
    _FRAME_SAMPLE_ORACLE,
    doc=f"N4 frame sampling: every blob fans out to its sampled frames "
        f"(stride {FRAME_STRIDE} over the decoded frame count) through "
        "the same Arrow mapInPandas surface — the 1→N batch shape video "
        "pipelines need (a real decoder emits pixel tensors here; the "
        "deterministic fake emits md5-derived frame fingerprints the "
        "SQL oracle reproduces, certifying the fan-out row set exactly). "
        "decode_real() remains the single swap-in point.",
    tags=("multimodal", "pandas-udf", "north-star"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = with_blob(docs)

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [],
                   "frame_fp": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                d = hashlib.md5(blob).hexdigest()
                nf = 1 + int(d[2], 16) % 8
                for idx in range(1, nf + 1, FRAME_STRIDE):
                    fp = int(hashlib.md5(
                        blob + b":" + str(idx).encode()).hexdigest()[:8], 16)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["n_frames"].append(nf)
                    out["frame_fp"].append(fp)
            yield pd.DataFrame(out)

    return blobs.select("doc_id", "blob").mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx int, n_frames int, frame_fp long")


@query(
    "multimodal_blob_stats",
    """
    SELECT meta_source AS source,
           CAST(count(*) AS BIGINT) AS n_blobs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
    FROM (SELECT source AS meta_source, text FROM documents)
    GROUP BY meta_source
    """,
    doc="N4 blob governance rollup: bytes per source over the binary "
        "column + metadata struct — the partition-planning stats a "
        "100 TB multimodal lake is laid out by.",
    tags=("multimodal", "agg", "north-star"),
)
def q_multimodal_blob_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = with_blob(docs)
    return blobs.groupBy(F.col("meta.source").alias("source")).agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(F.octet_length("blob")).alias("total_bytes"),
        F.max(F.octet_length("blob")).cast("long").alias("max_bytes"),
    )


CHUNK_BYTES = 64
MAX_CHUNKS = 8

_FRAME_DEDUP_ORACLE = f"""
WITH f AS (
  SELECT doc_id, s AS chunk_idx,
         md5(substring(text, {CHUNK_BYTES} * (s - 1) + 1,
                       {CHUNK_BYTES})) AS fp
  FROM documents,
       unnest(generate_series(1, {MAX_CHUNKS})) AS u(s)
  WHERE len(text) >= {CHUNK_BYTES} * s
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_chunks
FROM f a
JOIN f b ON a.fp = b.fp AND a.chunk_idx = b.chunk_idx
        AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


@query(
    "multimodal_frame_dedup",
    _FRAME_DEDUP_ORACLE,
    doc=f"N4 x N1 composition - binary near-dup detection on the blob "
        f"column by fixed-size chunk hashing (the rsync/storage-dedup "
        f"algorithm; with a real codec the chunk hash becomes a "
        f"per-frame perceptual hash, same plan): blobs pair up per "
        f"shared md5 of an aligned full {CHUNK_BYTES}-byte chunk "
        f"(first {MAX_CHUNKS} chunks), counting shared chunks - so "
        f"prefix-sharing near-duplicates surface even when the whole "
        f"blob differs. Engine side chunks the BINARY column; the "
        f"oracle chunks the text twin (byte == char on this ASCII "
        f"corpus - a non-ASCII corpus would only misalign the ORACLE, "
        f"the binary path is the production-correct semantics). One "
        f"mapInPandas-free byte fan-out, one (fp, idx) equi-join "
        f"bucket discipline, one pair aggregation - no all-pairs.",
    tags=("multimodal", "dedup", "north-star"),
)
def q_multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = with_blob(docs).select("doc_id", "blob")
    chunks = (blobs
              .select("doc_id", F.explode(F.sequence(
                  F.lit(1), F.lit(MAX_CHUNKS))).alias("chunk_idx"),
                  F.col("blob"))
              .filter(F.octet_length("blob")
                      >= CHUNK_BYTES * F.col("chunk_idx"))
              .select("doc_id", "chunk_idx",
                      F.md5(F.expr(
                          f"substring(blob, {CHUNK_BYTES} * (chunk_idx - 1)"
                          f" + 1, {CHUNK_BYTES})")).alias("fp")))
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).cast("bigint")
                 .alias("n_shared_chunks")))
