"""Scale-up generator for the empirical scaling study (SCALING.md).

Builds a k×-scaled copy of a driver SF directory by self-union with
key offsetting — the same way TPC-H scale factors grow: every key
space (orders, parts, suppliers, customers, docs, vectors) grows
k×, so per-key densities (lines per order, docs per shingle bucket,
vectors per cell) stay CONSTANT. A naive self-union without content
perturbation would instead create k exact copies of every document
and vector — near-dup and ANN candidate generation would then see
k²-growing pair counts by construction, measuring the synthetic
artifact rather than the operator. Therefore:

- ``documents.text`` is passed through a per-copy alphabet rotation
  (``translate``): every token/shingle differs across copies, length
  and structure stats are preserved, within-copy duplicate structure
  is replicated exactly once per copy;
- ``embeddings.embedding`` is rolled by ``copy`` positions — a
  coordinate permutation (norm- and distribution-preserving) that
  relocates each copy's neighborhoods;
- all integer keys are offset by ``copy * (max_key + 1)``.

Only the four tables the heavy families read are scaled
(lineitem, orders, documents, embeddings); remaining tables are
symlinked unscaled (dims are broadcast sides — their size is not the
scaling variable).

Usage::

    python tools/gen_scale.py /root/testdata/sf0.1 /tmp/scale_sf0.5 5
"""

from __future__ import annotations

import os
import pathlib
import string
import sys

REPO = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, REPO)

ALL_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")


def _rot_alphabet(i: int) -> tuple[str, str]:
    # Copies < 26: plain rotation (bit-identical to the r8 generator, so
    # the committed sf1.0 artifacts stay reproducible).  Copies >= 26: a
    # SEEDED full permutation of each case — the driver texts are
    # effectively lowercase-only, so any lowercase transform repeating
    # every 26 copies makes copies 0/26/52/78 exact text duplicates at
    # k=100 (measured: 370k/500k dup rows at sf10 — a synthetic dedup
    # artifact, not corpus structure).  A per-copy random permutation is
    # unique w.o.p. for any feasible k, preserves length/structure/token
    # boundaries, and keeps within-copy duplicate structure intact.
    import random

    low = string.ascii_lowercase
    up = string.ascii_uppercase
    if i < 26:
        r = i % 26
        return (low + up, low[r:] + low[:r] + up[r:] + up[:r])
    rng = random.Random(0xC0FFEE + i)
    pl, pu = list(low), list(up)
    rng.shuffle(pl)
    rng.shuffle(pu)
    return (low + up, "".join(pl) + "".join(pu))


def scale_dir(src: str, out: str, k: int) -> None:
    # roll_embedding's composite transform (coordinate roll i % 64,
    # full negation for i >= 64) is unique only for k <= 128: copy 128
    # would repeat copy 0's transform exactly, silently reintroducing
    # the duplicate-vector artifact the composite exists to kill. Fail
    # loudly instead of generating synthetic near-dup pairs at sf20+.
    if k > 128:
        raise ValueError(
            f"scale_dir supports at most 128 copies (got k={k}): "
            f"roll_embedding's roll+negate composite repeats at i>=128 "
            f"— extend the per-copy orthogonal transform family first")
    from pyspark.sql import functions as F

    from ecommerce_analytics_spark.io import load_table
    from ecommerce_analytics_spark.session import get_spark

    spark = get_spark("gen_scale", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    os.makedirs(out, exist_ok=True)

    def offset(col, step):
        def f(df, i):
            return df.withColumn(col, F.col(col) + F.lit(i * step))
        return f

    # GEN_SCALE_TABLES=documents,embeddings restricts which tables are
    # scaled (the rest are symlinked unscaled) — the sf10 probe only
    # needs the ANN/dedup corpora, not 60M lineitems.
    only = os.environ.get("GEN_SCALE_TABLES")
    only_set = set(t.strip() for t in only.split(",")) if only else None

    def copies(name, *transforms):
        if only_set is not None and name not in only_set:
            return
        base = load_table(spark, src, name)
        parts = []
        for i in range(k):
            df = base
            for t in transforms:
                df = t(df, i)
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # write ts-typed frames back in the driver's physical shape
        # (nanos-as-long) is unnecessary — load_table handles both; we
        # write plain timestamps.
        u.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    mx = {}
    for tbl, col in (("orders", "o_orderkey"), ("orders", "o_custkey"),
                     ("part", "p_partkey"), ("supplier", "s_suppkey"),
                     ("documents", "doc_id"), ("embeddings", "vec_id")):
        mx[col] = load_table(spark, src, tbl).agg(
            F.max(col)).first()[0] + 1

    copies("orders",
           offset("o_orderkey", mx["o_orderkey"]),
           offset("o_custkey", mx["o_custkey"]))
    copies("lineitem",
           offset("l_orderkey", mx["o_orderkey"]),
           offset("l_partkey", mx["p_partkey"]),
           offset("l_suppkey", mx["s_suppkey"]))

    def perturb_text(df, i):
        src_a, dst_a = _rot_alphabet(i)
        return df.withColumn("text", F.translate("text", src_a, dst_a))

    copies("documents", offset("doc_id", mx["doc_id"]), perturb_text)

    # events scaling is OPT-IN ONLY (GEN_SCALE_TABLES must name it):
    # the default scaled dirs were generated and certified without it,
    # and the committed sf1.0 sweep artifacts must stay reproducible.
    # Key spaces (user_id, event_id) offset per copy — 10× events means
    # 10× users at the same per-user density and time range, which is
    # how a real event stream grows (more keys, not denser sessions) —
    # exactly the axis keyed streaming state must be O(keys) in.
    if only_set is not None and "events" in only_set:
        ev = load_table(spark, src, "events")
        ev_mx = ev.agg(F.max("event_id"), F.max("user_id")).first()
        copies("events",
               offset("event_id", ev_mx[0] + 1),
               offset("user_id", ev_mx[1] + 1))

    def roll_embedding(df, i):
        # Per-copy ORTHOGONAL transform: coordinate roll (i % 64)
        # composed with FULL negation for copies >= 64. Both pieces are
        # orthogonal, so within-copy cosine structure is preserved
        # exactly, while the composite is unique for k up to 128 copies
        # — a bare roll repeats every 64, duplicating entire vector
        # sets across copies at sf10. Negation must be of EVERY
        # coordinate: a first-coordinate-only flip leaves copy i at
        # cosine ~ 1 - 2/dim ~ 0.97 from copy i-64 (measured: 31x
        # near-dup pair inflation at sf10), where full negation puts
        # them antipodal (cos -1) — maximally far, no synthetic pairs.
        r = i % 64
        e = F.col("embedding")
        if r != 0:
            e = F.concat(F.slice(e, r + 1, 64 - r), F.slice(e, 1, r))
        if i >= 64:
            elem_t = df.schema["embedding"].dataType.elementType \
                .simpleString()
            e = F.transform(
                e, lambda x: (x * F.lit(-1.0)).cast(elem_t))
        if r == 0 and i < 64:
            return df
        return df.withColumn("embedding", e)

    # label is a BLOCKING key (embedding_neardup pairs within label
    # blocks): leaving it unscaled makes blocks grow k× and pair counts
    # k² — the synthetic quadratic artifact this generator exists to
    # avoid (found when the sf1.0 sweep stalled ~100× on that query).
    # Offset it like every other key so per-block density stays flat,
    # matching how a real corpus grows (more cells, not denser ones).
    n_labels = load_table(spark, src, "embeddings").agg(
        F.max("label")).first()[0] + 1
    copies("embeddings", offset("vec_id", mx["vec_id"]),
           offset("label", n_labels), roll_embedding)

    for name in ALL_TABLES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{name}.parquet"), dst)


if __name__ == "__main__":
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale_dir(src, out, k)
    print(f"scaled {src} ×{k} → {out}")
