"""Right-answer referee for multimodal_frame_dedup: a plain-Python
chunk-hash recompute over the raw bytes must produce the identical
pair set, and every pair must share at least one aligned 64-byte
block verbatim."""

from __future__ import annotations

import collections

import duckdb


def test_frame_dedup_matches_plain_chunking(spark, sf_dir):
    from ecommerce_analytics_spark.multimodal.blobs import (
        CHUNK_BYTES, MAX_CHUNKS)
    from ecommerce_analytics_spark.plans.registry import query_map

    got = {(r["doc_a"], r["doc_b"]): r["n_shared_chunks"] for r in
           query_map()["multimodal_frame_dedup"](spark, sf_dir).collect()}

    docs = dict(duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall())
    index = collections.defaultdict(list)
    for d, t in docs.items():
        b = t.encode()
        for i in range(MAX_CHUNKS):
            chunk = b[i * CHUNK_BYTES:(i + 1) * CHUNK_BYTES]
            if len(chunk) == CHUNK_BYTES:
                index[(i, chunk)].append(d)

    exp: collections.Counter = collections.Counter()
    for ds in index.values():
        ds = sorted(set(ds))
        for i, x in enumerate(ds):
            for y in ds[i + 1:]:
                exp[(x, y)] += 1

    assert got == dict(exp)
    assert len(got) > 0
    # every pair shares an aligned block verbatim
    for (x, y) in got:
        bx, by = docs[x].encode(), docs[y].encode()
        assert any(bx[i * CHUNK_BYTES:(i + 1) * CHUNK_BYTES]
                   == by[i * CHUNK_BYTES:(i + 1) * CHUNK_BYTES]
                   and len(bx[i * CHUNK_BYTES:(i + 1) * CHUNK_BYTES])
                   == CHUNK_BYTES
                   for i in range(MAX_CHUNKS))
