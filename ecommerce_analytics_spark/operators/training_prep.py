"""Training-set preparation operators (north-star extensions).

Three pipeline stages every large-scale LLM data build runs between
"corpus is clean" and "tokens hit the trainer", none previously in
the registry:

- ``pack_sequences`` — GPT-style sequence packing: documents are
  concatenated in a deterministic order and split into fixed-length
  training sequences (SEQ_LEN tokens); each document's span of pack
  ids falls out of a running token offset. One window cumsum
  PARTITIONED BY source (a pack never crosses a source shard), so at
  100 TB every shard packs independently — no global sort, one
  exchange on the partition key.
- ``semantic_dedup`` — SemDeDup (Abbas et al. 2023): cluster by
  nearest centroid, and within each cluster drop every member that
  has a ≥``SEM_THRESH``-cosine neighbor closer to the centroid (the
  kept vector is the cluster-representative). Fixed corpus centroids
  (vec_id < N_CENTROIDS, the knn_ivf convention) keep the whole
  procedure deterministic and SQL-expressible, so the oracle checks
  it EXACTLY — the trained-KMeans variant swaps the centroid table
  and keeps the identical plan (similarity.q_knn_ivf_kmeans shows
  that swap). Candidate pairs come from a cell equi-join — blocked,
  never all-pairs, the published algorithm's own scale story.
- ``pii_redact`` — PII scrubbing: emails / phone numbers / IPv4
  addresses counted and replaced with typed placeholder tokens.
  Map-only (zero shuffles), pure JVM regex — the shape that runs at
  scan speed on 100 TB. The synthetic corpus contains no PII, so the
  query plants deterministic PII in a doc_id-keyed subset (the
  injected-positives pattern the dedup family uses) and both engines
  scrub the same augmented text; the redacted output is certified by
  md5, the counts by integers.

The synthetic embeddings corpus has no true near-dups, so
``semantic_dedup`` injects ×2-scaled copies (cosine-invariant — same
direction, same cell, cos≈1 with the original) as certified positives,
exactly like embedding_neardup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.operators.corpus_quality import (
    GOPHER_PASS_COND, gopher_feat_ctes, gopher_features,
)
from ecommerce_analytics_spark.operators.dedup_resolve import _U_SQL
from ecommerce_analytics_spark.operators.similarity import (
    N_CENTROIDS, _cos_sql, _dot_sql, dot, norm,
)
from ecommerce_analytics_spark.plans.registry import query

SEQ_LEN = 2048        # training sequence length (tokens)
SEM_THRESH = 0.999    # SemDeDup within-cluster cosine threshold
SEM_COPY_MOD = 40     # vec_id % 40 == 0 gets an injected ×2 copy
# Cell-size cap (the SemDeDup paper's own scale recipe): the cell
# count grows with the corpus, max(N_CENTROIDS, n // SEM_CELL_CAP),
# so within-cell pair work stays ~linear in n. With fixed cells the
# round-8 sf1.0 sweep measured the within-cell join going quadratic
# (8 cells × 2.5k members = 50M pair folds; ≥45× the sf0.1 time).
# Identity at every driver SF (n ≤ 2k ⇒ 8 cells, unchanged results).
SEM_CELL_CAP = 256
# Above this cell count the nearest-centroid ASSIGNMENT itself goes
# hierarchical (vector → nearest super-centroid → nearest centroid
# within that super-cell, supers = first ceil(sqrt(cells)) centroids).
# Round-9 sf10 probe measured the flat assignment crossJoin going
# quadratic (n × n/256 centroid dots: 15s → 286s for 10× vectors,
# while the within-cell pair join stayed linear); two-level search
# bounds it at ~2·n·sqrt(cells) dots. 96 > the 78 cells at sf1.0, so
# every committed-SF result (sf0.001…sf1.0) is bit-identical; the
# DuckDB oracle mirrors the same deterministic two-level rule, so the
# certified parity holds in both regimes.
SEM_FLAT_MAX_CELLS = 96

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_tok
  FROM t
)
SELECT doc_id, source, n_tokens, start_tok,
       CAST(start_tok // {SEQ_LEN} AS BIGINT) AS pack_first,
       CAST((start_tok + greatest(n_tokens, 1) - 1) // {SEQ_LEN}
            AS BIGINT) AS pack_last,
       CAST((start_tok + greatest(n_tokens, 1) - 1) // {SEQ_LEN}
            - start_tok // {SEQ_LEN} + 1 AS BIGINT) AS n_packs
FROM c
"""


@query(
    "pack_sequences",
    _PACK_ORACLE,
    doc=f"GPT-style sequence packing: concatenate documents per source "
        f"shard in doc_id order and split into {SEQ_LEN}-token training "
        f"sequences; each doc's (pack_first, pack_last) span falls out "
        f"of a running token offset. ONE window cumsum partitioned by "
        f"source — shards pack independently and in parallel (no "
        f"global sort); integer token offsets make every engine agree "
        f"exactly. The trainer-side reader groups by pack id to emit "
        f"fixed-length sequences.",
    tags=("text", "window", "north-star", "scale"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    toks = docs.select(
        "doc_id", "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"))
    packed = toks.withColumn(
        "start_tok",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"))
    return (packed
            .withColumn("pack_first",
                        F.expr(f"start_tok div {SEQ_LEN}"))
            .withColumn("pack_last", F.expr(
                f"(start_tok + greatest(n_tokens, 1) - 1) div {SEQ_LEN}"))
            .withColumn("n_packs",
                        F.col("pack_last") - F.col("pack_first") + 1)
            .select("doc_id", "source", "n_tokens", "start_tok",
                    "pack_first", "pack_last", "n_packs"))


_SEM_ORACLE = f"""
WITH corpus AS MATERIALIZED (
  SELECT vec_id, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
  FROM (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + 1000000 AS vec_id,
           list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
             AS embedding
    FROM embeddings WHERE vec_id % {SEM_COPY_MOD} = 0
  )
), cent AS MATERIALIZED (
  SELECT vec_id AS cell_id, embedding AS c_emb,
         sqrt({_dot_sql('embedding', 'embedding')}) AS c_nrm
  FROM embeddings
  WHERE vec_id < (SELECT greatest({N_CENTROIDS},
                                  count(*) // {SEM_CELL_CAP})
                  FROM embeddings)
), params AS MATERIALIZED (
  SELECT greatest({N_CENTROIDS}, count(*) // {SEM_CELL_CAP}) AS n_cells,
         CAST(ceil(sqrt(greatest({N_CENTROIDS},
                                 count(*) // {SEM_CELL_CAP})))
              AS BIGINT) AS n_super
  FROM embeddings
), sup AS MATERIALIZED (
  SELECT cell_id AS super_id, c_emb AS s_emb, c_nrm AS s_nrm
  FROM cent WHERE cell_id < (SELECT n_super FROM params)
-- Regime gating happens on the INPUT side (an empty MATERIALIZED CTE
-- in the inactive regime), not as a WHERE under a populated cross
-- join: DuckDB does not constant-fold the scalar-subquery predicate
-- before executing the join, so at sf10 the dead flat branch was a
-- 205k-vector x 800-centroid cross join of 128-double embeddings
-- (~300 GB through the window sort) that overflowed a 79 GB spill
-- disk. Empty-input joins cost nothing in either regime.
), cent_flat AS MATERIALIZED (
  SELECT * FROM cent
  WHERE (SELECT n_cells FROM params) <= {SEM_FLAT_MAX_CELLS}
), sup_hier AS MATERIALIZED (
  SELECT * FROM sup
  WHERE (SELECT n_cells FROM params) > {SEM_FLAT_MAX_CELLS}
), cent2super AS MATERIALIZED (
  -- super centroids PIN to their own super-cell (no cosine routing):
  -- guarantees every super-cell is non-empty structurally, so the
  -- vec2super->cent2super inner join can never drop a vector — the
  -- FP edge where cos(s,s)=dot/(nrm*nrm) is not bit-wise maximal
  -- (or ties a smaller super_id) would otherwise empty super s and
  -- vanish its vectors from the output. Same rule in both engines.
  SELECT cell_id, c_emb, c_nrm, cell_id AS super_id
  FROM cent WHERE cell_id < (SELECT n_super FROM params)
  UNION ALL
  SELECT cell_id, c_emb, c_nrm, super_id FROM (
    SELECT cent.cell_id, cent.c_emb, cent.c_nrm, sup.super_id,
           row_number() OVER (
             PARTITION BY cent.cell_id
             ORDER BY ({_dot_sql('cent.c_emb', 'sup.s_emb')}
                       / (cent.c_nrm * sup.s_nrm)) DESC,
                      sup.super_id
           ) AS rn
    FROM cent CROSS JOIN sup_hier sup
    WHERE cent.cell_id >= (SELECT n_super FROM params)
  ) WHERE rn = 1
), vec2super AS MATERIALIZED (
  SELECT vec_id, embedding, nrm, super_id FROM (
    SELECT c.vec_id, c.embedding, c.nrm, sup.super_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY ({_dot_sql('c.embedding', 'sup.s_emb')}
                       / (c.nrm * sup.s_nrm)) DESC,
                      sup.super_id
           ) AS rn
    FROM corpus c CROSS JOIN sup_hier sup
  ) WHERE rn = 1
), assigned AS MATERIALIZED (
  SELECT vec_id, embedding, nrm, cell_id, cent_cos FROM (
    SELECT c.vec_id, c.embedding, c.nrm, cent.cell_id,
           ({_dot_sql('c.embedding', 'cent.c_emb')}
            / (c.nrm * cent.c_nrm)) AS cent_cos,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY ({_dot_sql('c.embedding', 'cent.c_emb')}
                       / (c.nrm * cent.c_nrm)) DESC,
                      cent.cell_id
           ) AS rn
    FROM corpus c CROSS JOIN cent_flat cent
  ) WHERE rn = 1
  UNION ALL
  SELECT vec_id, embedding, nrm, cell_id, cent_cos FROM (
    SELECT v.vec_id, v.embedding, v.nrm, m.cell_id,
           ({_dot_sql('v.embedding', 'm.c_emb')}
            / (v.nrm * m.c_nrm)) AS cent_cos,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY ({_dot_sql('v.embedding', 'm.c_emb')}
                       / (v.nrm * m.c_nrm)) DESC,
                      m.cell_id
           ) AS rn
    FROM vec2super v JOIN cent2super m USING (super_id)
  ) WHERE rn = 1
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
   AND (a.cent_cos > b.cent_cos
        OR (a.cent_cos = b.cent_cos AND a.vec_id < b.vec_id))
  WHERE ({_dot_sql('a.embedding', 'b.embedding')}
         / (a.nrm * b.nrm)) >= {SEM_THRESH}
)
SELECT s.vec_id, CAST(s.cell_id AS INTEGER) AS cell_id,
       round(s.cent_cos, 9) AS cent_cos,
       d.vec_id IS NULL AS kept
FROM assigned s LEFT JOIN dropped d ON s.vec_id = d.vec_id
"""


@query(
    "semantic_dedup",
    _SEM_ORACLE,
    doc=f"SemDeDup (Abbas et al. 2023): assign every vector to its "
        f"max-cosine centroid cell, then within each cell drop every "
        f"member with a >= {SEM_THRESH}-cosine neighbor closer to the "
        f"centroid (ties to the smaller vec_id) — one representative "
        f"per semantic cluster survives. Fixed corpus centroids keep "
        f"it deterministic/oracle-exact; candidate pairs are a cell "
        f"equi-join (blocked, never all-pairs), and above "
        f"{SEM_FLAT_MAX_CELLS} cells the centroid assignment itself "
        f"goes two-level (nearest super-centroid, then nearest "
        f"centroid within the super-cell — both engines run the same "
        f"deterministic rule), bounding assignment at "
        f"~2·n·sqrt(cells) dots instead of the measured-quadratic "
        f"n·cells. Injected ×2-scaled copies land in the original's "
        f"cell with cos≈1 and equal centroid distance, so the "
        f"smaller-id original is kept and the copy dropped — "
        f"certified positives. At 100 TB: swap the centroid CTE for "
        f"the trained-KMeans table (knn_ivf_kmeans), the paper's own "
        f"recipe.",
    tags=("dedup", "similarity", "north-star"),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    copies = (
        emb.filter(F.col("vec_id") % SEM_COPY_MOD == 0)
        .select((F.col("vec_id") + 1000000).alias("vec_id"),
                F.transform("embedding",
                            lambda x: x * F.lit(2.0).cast("float"))
                .alias("embedding"))
    )
    corpus = emb.select("vec_id", "embedding").unionAll(copies)
    n_cells = max(N_CENTROIDS, emb.count() // SEM_CELL_CAP)
    cents = (emb.filter(F.col("vec_id") < n_cells)
             .select(F.col("vec_id").alias("cell_id"),
                     F.col("embedding").alias("c_emb"),
                     norm(F.col("embedding")).alias("c_nrm")))
    cent_cos = (dot(F.col("embedding"), F.col("c_emb"))
                / (norm(F.col("embedding")) * F.col("c_nrm")))
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cent_cos"), F.asc("cell_id"))
    if n_cells <= SEM_FLAT_MAX_CELLS:
        assigned = (
            corpus.crossJoin(F.broadcast(cents))
            .select("vec_id", "embedding", "cell_id",
                    cent_cos.alias("cent_cos"))
            .withColumn("rn", F.row_number().over(w_assign))
            .filter(F.col("rn") == 1)
            .drop("rn")
            # norms precomputed once per vector for the pair join (the
            # embedding_neardup optimization — one fold instead of
            # three)
            .withColumn("nrm", norm(F.col("embedding")))
        )
    else:
        # Two-level nearest-centroid search (see SEM_FLAT_MAX_CELLS):
        # supers = first ceil(sqrt(cells)) centroids; each centroid
        # and each vector routes to its max-cosine super, then the
        # vector takes the max-cosine centroid WITHIN that super-cell.
        # ~2·n·sqrt(cells) dots instead of n·cells; the oracle SQL
        # runs the identical deterministic rule (same tie-breaks), so
        # parity is exact in this regime too.
        import math
        n_super = int(math.ceil(math.sqrt(n_cells)))
        supers = (cents.filter(F.col("cell_id") < n_super)
                  .select(F.col("cell_id").alias("super_id"),
                          F.col("c_emb").alias("s_emb"),
                          F.col("c_nrm").alias("s_nrm")))
        c2s_cos = (dot(F.col("c_emb"), F.col("s_emb"))
                   / (F.col("c_nrm") * F.col("s_nrm")))
        w_c2s = Window.partitionBy("cell_id").orderBy(
            F.desc("c2s_cos"), F.asc("super_id"))
        # super centroids PIN to their own super-cell (ADVICE r9):
        # structural non-emptiness of every super-cell, so the inner
        # join below can never drop a vector — without the pin, an FP
        # edge where cos(s,s) is not bit-maximal (or ties a smaller
        # super_id) would leave super s empty and its vectors would
        # silently vanish. The oracle SQL runs the identical pin.
        cent2super = (
            cents.filter(F.col("cell_id") < n_super)
            .select("cell_id", "c_emb", "c_nrm",
                    F.col("cell_id").alias("super_id"))
            .unionByName(
                cents.filter(F.col("cell_id") >= n_super)
                .crossJoin(F.broadcast(supers))
                .select("cell_id", "c_emb", "c_nrm", "super_id",
                        c2s_cos.alias("c2s_cos"))
                .withColumn("rn", F.row_number().over(w_c2s))
                .filter(F.col("rn") == 1)
                .select("cell_id", "c_emb", "c_nrm", "super_id")))
        v2s_cos = (dot(F.col("embedding"), F.col("s_emb"))
                   / (F.col("nrm") * F.col("s_nrm")))
        w_v2s = Window.partitionBy("vec_id").orderBy(
            F.desc("v2s_cos"), F.asc("super_id"))
        vec2super = (
            corpus.withColumn("nrm", norm(F.col("embedding")))
            .crossJoin(F.broadcast(supers))
            .select("vec_id", "embedding", "nrm", "super_id",
                    v2s_cos.alias("v2s_cos"))
            .withColumn("rn", F.row_number().over(w_v2s))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "nrm", "super_id"))
        in_super_cos = (dot(F.col("embedding"), F.col("c_emb"))
                        / (F.col("nrm") * F.col("c_nrm")))
        assigned = (
            vec2super.join(F.broadcast(cent2super), "super_id")
            .select("vec_id", "embedding", "nrm", "cell_id",
                    in_super_cos.alias("cent_cos"))
            .withColumn("rn", F.row_number().over(w_assign))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )
    # persist(): `assigned` — the expensive centroid-assignment pass
    # (~n·cells or ~2·n·√cells dots) — is referenced THREE times (both
    # sides of the in-cell dominance self-join plus the final kept
    # join); without the cache each reference re-runs the whole
    # assignment including its corpus scans (embeddings×9 in the plan
    # census). Lazy persist (the pagerank precedent, graph.py) keeps
    # plan-only callers executing nothing; the cached frame is
    # vec_id/cell/cos plus the embedding row — corpus-sized but
    # narrow, and strictly cheaper than two recomputations at any
    # scale (guide §5).
    assigned = assigned.persist()
    a = assigned.alias("a")
    b = assigned.alias("b")
    pair_cos = (dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.nrm") * F.col("b.nrm")))
    dominated = (
        a.join(b, (F.col("a.cell_id") == F.col("b.cell_id"))
               & (F.col("a.vec_id") != F.col("b.vec_id"))
               & ((F.col("a.cent_cos") > F.col("b.cent_cos"))
                  | ((F.col("a.cent_cos") == F.col("b.cent_cos"))
                     & (F.col("a.vec_id") < F.col("b.vec_id")))))
        .filter(pair_cos >= SEM_THRESH)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        assigned.join(dominated, "vec_id", "left")
        .select("vec_id", F.col("cell_id").cast("int").alias("cell_id"),
                F.round("cent_cos", 9).alias("cent_cos"),
                F.coalesce(~F.col("dropped"), F.lit(True)).alias("kept"))
    )


# Patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \\d and \\b only.
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_PHONE = r"\b\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_AUGMENT_SQL = """
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                      || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR),
                                           4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST(doc_id % 100 AS VARCHAR)
                 ELSE '' END AS text
  FROM documents
"""

_PII_ORACLE = f"""
WITH aug AS ({_PII_AUGMENT_SQL}),
scrubbed AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
           AS n_emails,
         CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
           AS n_phones,
         CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT)
           AS n_ips,
         regexp_replace(regexp_replace(regexp_replace(
             text, '{PII_EMAIL}', '<EMAIL>', 'g'),
             '{PII_PHONE}', '<PHONE>', 'g'),
             '{PII_IPV4}', '<IP>', 'g') AS redacted
  FROM aug
)
SELECT doc_id, n_emails, n_phones, n_ips,
       n_emails + n_phones + n_ips > 0 AS had_pii,
       md5(redacted) AS redacted_md5
FROM scrubbed
"""


@query(
    "pii_redact",
    _PII_ORACLE,
    doc="PII scrubbing: emails, phone numbers, and IPv4 addresses "
        "counted (regexp_count) and replaced with typed placeholders "
        "(regexp_replace) — map-only, zero shuffles, JVM-side regex at "
        "scan speed; the plan a 100 TB redaction pass must have. The "
        "corpus has no real PII, so deterministic PII is planted in "
        "doc_id-keyed subsets (the injected-positives discipline) and "
        "both engines scrub identical augmented text; redacted output "
        "certified by md5, patterns restricted to the Java-regex ∩ RE2 "
        "dialect so the engines agree by construction.",
    tags=("text", "quality", "north-star", "scale"),
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.lit(" contact user"),
                            F.col("doc_id").cast("string"),
                            F.lit("@example.com now")))
            .otherwise(""),
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.lit(" call 555-"),
                            F.lpad((F.col("doc_id") % 10000).cast("string"),
                                   4, "0")))
            .otherwise(""),
            F.when(F.col("doc_id") % 13 == 0,
                   F.concat(F.lit(" from 10.0."),
                            (F.col("doc_id") % 256).cast("string"),
                            F.lit("."),
                            (F.col("doc_id") % 100).cast("string")))
            .otherwise(""),
        ).alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>"),
        PII_IPV4, "<IP>")
    counted = aug.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("bigint")
        .alias("n_emails"),
        F.regexp_count("text", F.lit(PII_PHONE)).cast("bigint")
        .alias("n_phones"),
        F.regexp_count("text", F.lit(PII_IPV4)).cast("bigint")
        .alias("n_ips"),
        redacted.alias("redacted"))
    return counted.select(
        "doc_id", "n_emails", "n_phones", "n_ips",
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips") > 0)
        .alias("had_pii"),
        F.md5("redacted").alias("redacted_md5"))


# Per-source document cap (the C4/RefinedWeb per-domain quota): at web
# scale a handful of domains dominate the crawl; capping each domain's
# contribution is the standard anti-domination gate. Priority inside a
# source is the deterministic content-hash uniform the resampling
# family already uses (dedup_resolve._U_SQL) — replayable, no RNG
# state, and independent of ingestion order.
SOURCE_QUOTA = 100

_QUOTA_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         round({_U_SQL}, 9) AS u,
         CAST(row_number() OVER (
             PARTITION BY source ORDER BY {_U_SQL}, doc_id
         ) AS BIGINT) AS quota_rank
  FROM documents
)
SELECT doc_id, source, u, quota_rank
FROM ranked WHERE quota_rank <= {SOURCE_QUOTA}
"""


@query(
    "source_quota_sample",
    _QUOTA_ORACLE,
    doc=f"Per-source quota cap (C4/RefinedWeb anti-domination gate): "
        f"keep at most {SOURCE_QUOTA} documents per source, "
        f"prioritized by the deterministic content-hash uniform — "
        f"replayable and ingestion-order-independent. One window "
        f"row_number partitioned by source: shards rank "
        f"independently, no global sort; at 100 TB the rank is a "
        f"per-domain top-K (TakeOrdered per key), never a global "
        f"shuffle of the corpus.",
    tags=("text", "sampling", "north-star", "scale"),
)
def q_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(_U_SQL)
    w = Window.partitionBy("source").orderBy(u.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", F.round(u, 9).alias("u"),
                    F.row_number().over(w).cast("bigint")
                    .alias("quota_rank"))
        .filter(F.col("quota_rank") <= SOURCE_QUOTA)
    )


# ---- full-pipeline composition -------------------------------------
#
# Every stage above (and the gate/dedup/resample families) is
# oracle-certified in isolation; a real deployment RUNS THEM CHAINED.
# This query certifies the composition end-to-end: quality gate →
# exact dedup → per-source quota → sequence packing, one DataFrame
# plan, one matching chained-CTE oracle — so a user of the engine can
# run the whole pretraining prep as a single lazy query and the
# driver hash covers every stage boundary (the place bugs hide:
# a stage reading the wrong survivor set, a rank computed before a
# filter, an offset computed over dropped docs).
PIPE_COPY_MOD = 50  # doc_id % 50 == 0 gets an injected verbatim copy


_PIPELINE_ORACLE = f"""
WITH aug_docs AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + 80000000 AS doc_id, text, lang, source
  FROM documents WHERE doc_id % {PIPE_COPY_MOD} = 0
), {gopher_feat_ctes("aug_docs")},
gated AS (
  SELECT d.doc_id, d.text, d.source, f.n_tokens
  FROM aug_docs d JOIN feat f ON d.doc_id = f.doc_id
  WHERE {GOPHER_PASS_COND}
), deduped AS (
  SELECT doc_id, source, n_tokens
  FROM (SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
        FROM gated)
  WHERE doc_id = keeper
), quota AS (
  SELECT doc_id, source, n_tokens
  FROM (SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY {_U_SQL}, doc_id) AS rnk
        FROM deduped)
  WHERE rnk <= {SOURCE_QUOTA}
)
SELECT doc_id, source, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS start_tok,
       CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         // {SEQ_LEN} AS BIGINT) AS pack_first
FROM quota
"""


@query(
    "pretrain_pipeline",
    _PIPELINE_ORACLE,
    doc=f"END-TO-END pretraining prep as ONE lazy plan: Gopher quality "
        f"gate → exact dedup (md5, keep min doc_id; injected verbatim "
        f"copies %{PIPE_COPY_MOD} certify the stage binds) → "
        f"per-source quota ({SOURCE_QUOTA}, content-hash priority) → "
        f"{SEQ_LEN}-token sequence packing over the survivors. Each "
        f"stage is oracle-certified alone; this row certifies the "
        f"COMPOSITION — every stage boundary (survivor sets, rank-"
        f"after-filter, offsets over kept docs only) is inside the "
        f"driver hash. Plan: map-only gate, one md5 window, one "
        f"source window for quota+pack (same key — Catalyst shares "
        f"the exchange).",
    tags=("text", "quality", "dedup", "sampling", "north-star", "scale"),
)
def q_pretrain_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text", "lang", "source")
    aug = docs.unionAll(
        docs.filter(F.col("doc_id") % PIPE_COPY_MOD == 0)
        .select((F.col("doc_id") + 80000000).alias("doc_id"),
                "text", "lang", "source"))
    # gopher_features is a pure projection, so the payload columns
    # ride along (keep=) instead of re-scanning the corpus and
    # self-joining on doc_id to reattach them — removes two scans and
    # a fact-sized shuffle join (documents×4 in the plan census;
    # round 11, guide §2.4).
    gated = (gopher_features(aug, keep=("text", "source"))
             .filter(F.col("passes_gopher"))
             .select("doc_id", "text", "source", "n_tokens"))
    # Duplicate-delivery multiplicity (r11 hostile catch): the
    # oracle's aug_docs ⋈ feat ON doc_id pairs every delivered copy
    # with every feature row, so k at-least-once deliveries of one doc
    # contribute k² identical rows to the gate output — the pure
    # projection keeps only k. Count deliveries with a window on
    # (md5(text), doc_id) — satisfied by the dedup window's md5
    # exchange, so it costs a sort, not a shuffle — and explode the
    # extra k−1 copies after the dedup filter (copies are identical,
    # so the gate and keeper decisions commute with the multiply).
    # Clean data has k = 1 and the explode is the identity.
    # (the hash is materialized ONCE as a named column and the count
    # window stacks ABOVE the keeper filter: both windows then
    # partition by the same attribute, so the (_h, doc_id) clustering
    # is satisfied by the existing _h hash partitioning — one sort, no
    # third exchange, the certified 2-exchange shape survives. With
    # inline md5(text) in both specs, Catalyst extracts each window's
    # partition expression into its own projected alias and cannot see
    # the partitionings are equal. Counting after the filter is the
    # same k, since exactly the keeper doc's copies pass it.)
    w_h = Window.partitionBy("_h")
    w_k = Window.partitionBy("_h", "doc_id")
    deduped = (gated
               .withColumn("_h", F.md5("text"))
               .withColumn("keeper", F.min("doc_id").over(w_h))
               .filter(F.col("doc_id") == F.col("keeper"))
               .withColumn("_k", F.count(F.lit(1)).over(w_k))
               .select("doc_id", "source", "n_tokens",
                       F.explode(F.expr("sequence(1, _k)")).alias("_i"))
               .select("doc_id", "source", "n_tokens"))
    w_q = Window.partitionBy("source").orderBy(
        F.expr(_U_SQL).asc(), F.col("doc_id").asc())
    quota = (deduped
             .withColumn("rnk", F.row_number().over(w_q))
             .filter(F.col("rnk") <= SOURCE_QUOTA)
             .select("doc_id", "source", "n_tokens"))
    w_p = (Window.partitionBy("source").orderBy("doc_id")
           .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum("n_tokens").over(w_p), F.lit(0)).cast("bigint")
    return (quota
            .select("doc_id", "source", "n_tokens",
                    start.alias("start_tok"))
            .withColumn("pack_first", F.expr(f"start_tok div {SEQ_LEN}")))
