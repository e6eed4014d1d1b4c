"""Multi-round BPE merge training as a certified iterative query.

[[bpe_merge_candidates]] (training_prep.py) ranks ONE round of
candidate pairs; this trains an actual merge list — the first
{K} merges of the classic byte-pair-encoding trainer (Sennrich et al.
2016; the HuggingFace/GPT-2 `BPE.train` loop) over the corpus
word-count table:

  repeat K times:
    1. count adjacent symbol pairs, weighted by word frequency;
    2. pick the argmax pair (total tie-break: count DESC, left,
       right);
    3. rewrite every word, merging non-overlapping occurrences of
       the pair LEFT-TO-RIGHT (the reference greedy semantics).

The novel certification problem is step 3: the left-to-right greedy
rewrite looks sequential, but it is exactly relational — for a merge
pair (l, r) with l <> r, matches can never overlap, so ALL matches
merge; for l == r, matches overlap only inside maximal runs of the
symbol, where greedy selects every SECOND match from the run start
(offset parity). Runs are gaps-and-islands (pos - row_number), so
each round is: one adjacency self-join, one argmax, one island
window, one anti-join rewrite, one renumber window — no fold, no UDF,
no Python. Every value is an exact integer or string, so the K-round
result hash-matches the oracle (the same rounds unrolled as generated
CTEs) with no float discipline needed at all.

A word at position p is consumed by a merge at p-1 and replaced by a
merge at p; the two can never conflict (consecutive selected matches
would force l = r, where parity spaces selections >= 2 apart).

Scale shape: the corpus is reduced ONCE to the word-frequency table
(the only fact-sized shuffle); all K rounds run on the
vocabulary-sized symbol table (|words| x avg word length rows),
re-partitioned only by word — compact keys. Each round
localCheckpoints the rewritten symbol table ([[dedup_clusters_star]]
idiom): K nested rounds of joins+windows would otherwise stack into
one mega-plan. At a 100 TB corpus the vocab table is still
vocabulary-sized; the trainer's cost is K x (a few shuffles of ~|V|
rows) regardless of corpus size — exactly why production BPE trainers
operate on word counts, not raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

BPE_ROUNDS = 4


def _oracle() -> str:
    cte = """
WITH words AS MATERIALIZED (
  SELECT tok AS word, CAST(count(*) AS BIGINT) AS w
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
), s0 AS MATERIALIZED (
  SELECT word, w, i AS pos, chars[i] AS sym
  FROM (SELECT word, w, string_split(word, '') AS chars FROM words),
       LATERAL unnest(generate_series(1, len(chars))) AS t(i)
)"""
    for k in range(1, BPE_ROUNDS + 1):
        p = f"s{k - 1}"
        cte += f""", m{k} AS MATERIALIZED (
  SELECT a.sym AS l, b.sym AS r, CAST(sum(a.w) AS BIGINT) AS c
  FROM {p} a JOIN {p} b ON b.word = a.word AND b.pos = a.pos + 1
  GROUP BY a.sym, b.sym
  ORDER BY c DESC, l, r LIMIT 1
), runsa{k} AS MATERIALIZED (
  SELECT s.word, s.pos,
         s.pos - row_number() OVER (PARTITION BY s.word
                                    ORDER BY s.pos) AS grp
  FROM {p} s JOIN m{k} m ON s.sym = m.l
), runs{k} AS MATERIALIZED (
  SELECT word, pos, min(pos) OVER (PARTITION BY word, grp) AS run_min
  FROM runsa{k}
), sel{k} AS MATERIALIZED (
  SELECT a.word, a.w, a.pos
  FROM {p} a
  JOIN {p} b ON b.word = a.word AND b.pos = a.pos + 1
  JOIN m{k} m ON a.sym = m.l AND b.sym = m.r
  JOIN runs{k} rr ON rr.word = a.word AND rr.pos = a.pos
  WHERE m.l <> m.r OR (a.pos - rr.run_min) % 2 = 0
), s{k} AS MATERIALIZED (
  SELECT word, w,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, sym
  FROM (
    SELECT sl.word, sl.w, sl.pos, m.l || m.r AS sym
    FROM sel{k} sl CROSS JOIN m{k} m
    UNION ALL
    SELECT s.word, s.w, s.pos, s.sym
    FROM {p} s
    LEFT JOIN sel{k} x1 ON x1.word = s.word AND x1.pos = s.pos
    LEFT JOIN sel{k} x2 ON x2.word = s.word AND x2.pos = s.pos - 1
    WHERE x1.pos IS NULL AND x2.pos IS NULL
  )
)"""
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, c AS pair_count FROM m{k}"
        for k in range(1, BPE_ROUNDS + 1))
    return cte + "\n" + unions


def _rewrite_round(s: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE round: returns (merge row, rewritten symbol table).

    ONE window chain per round (round 11). ``pos`` is dense by
    construction (posexplode at init, row_number renumber every
    round), so the (word, pos+1) adjacency self-join IS lead() over
    the (word, pos) window — the pair count, the match test, the
    island parity, the consumed-by-left-neighbor test, and the
    renumber all ride a single hash(word) exchange as window
    functions. The previous formulation spent two adjacency
    self-joins plus two anti-joins per round (≈7 exchanges of the
    symbol table); this shape exchanges it once for the argmax count
    and once for the window chain. Selection semantics are identical:
    a row is selected iff (sym, next sym) equals the argmax pair and
    — for l==r, where matches can overlap inside symbol runs —
    greedy keeps every second match from the run start (islands via
    running count of run-member rows; run_min over (word, grp) rides
    the same word partitioning). A row is dropped iff its LEFT
    neighbor was selected (lag), replaced iff itself selected; the
    two never conflict (module docstring)."""
    w_pos = Window.partitionBy("word").orderBy("pos")
    t = s.withColumn("nsym", F.lead("sym").over(w_pos))
    pairs = (t.filter(F.col("nsym").isNotNull())
             .groupBy(F.col("sym").alias("l"), F.col("nsym").alias("r"))
             .agg(F.sum("w").cast("bigint").alias("c")))
    best = pairs.orderBy(F.col("c").desc(), "l", "r").limit(1)

    u = t.crossJoin(F.broadcast(best))
    is_l = F.col("sym") == F.col("l")
    run_cnt = F.sum(F.when(is_l, 1).otherwise(0)).over(
        w_pos.rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("grp", F.when(is_l, F.col("pos") - run_cnt))
    run_min = F.min("pos").over(Window.partitionBy("word", "grp"))
    u = u.withColumn(
        "sel",
        F.coalesce(
            is_l & (F.col("nsym") == F.col("r"))
            & ((F.col("l") != F.col("r"))
               | ((F.col("pos") - run_min) % 2 == 0)),
            F.lit(False)))
    nxt = (u.withColumn("consumed",
                        F.coalesce(F.lag("sel").over(w_pos),
                                   F.lit(False)))
           .filter(~F.col("consumed"))
           .select("word", "w", "pos",
                   F.when(F.col("sel"), F.concat("l", "r"))
                   .otherwise(F.col("sym")).alias("sym"))
           .withColumn("pos", F.row_number().over(w_pos))
           .select("word", "w", "pos", "sym"))
    return best, nxt


@query(
    "bpe_train_merges",
    _oracle(),
    doc=f"The first {BPE_ROUNDS} merges of the classic BPE trainer "
        f"(Sennrich et al. 2016) over the corpus word-count table: "
        f"per round, weighted adjacent-pair argmax (total tie-break "
        f"count DESC, left, right) then the LEFT-TO-RIGHT greedy "
        f"rewrite expressed relationally — overlaps exist only for "
        f"l==r inside symbol runs, where greedy = even offsets from "
        f"the run start (gaps-and-islands), so the rewrite is one "
        f"island window + anti-join + renumber, no fold, no UDF. All "
        f"integers and strings: the {BPE_ROUNDS}-round merge list "
        f"hash-matches the unrolled-CTE oracle exactly. The corpus "
        f"reduces once to word counts; every round runs on the "
        f"vocabulary-sized symbol table.",
    tags=("text", "iterative", "ml", "north-star"),
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (docs.select(F.explode(F.split("text", " ")).alias("word"))
             .groupBy("word")
             .agg(F.count(F.lit(1)).cast("bigint").alias("w")))
    s = (words.select("word", "w",
                      F.posexplode(F.split("word", "")).alias("p0", "sym"))
         .select("word", "w", (F.col("p0") + 1).alias("pos"), "sym")
         .localCheckpoint(eager=True))

    merges = []
    for k in range(1, BPE_ROUNDS + 1):
        best, nxt = _rewrite_round(s)
        merges.append(best.select(
            F.lit(k).cast("int").alias("round"),
            F.col("l").alias("left_sym"), F.col("r").alias("right_sym"),
            F.concat("l", "r").alias("merged"),
            F.col("c").alias("pair_count")))
        if k < BPE_ROUNDS:
            prev = s
            s = nxt.localCheckpoint(eager=True)
            prev.unpersist()

    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out
