"""Markov-chain multi-touch attribution (removal effect).

The data-driven attribution model (Anderl et al. 2014; the
ChannelAttribution package; GA4's "data-driven attribution"):
journeys are per-(user, day) event-type paths truncated at the first
purchase; a first-order Markov chain is fit on the transition counts;
each channel's credit is its REMOVAL EFFECT — how much the
START→conversion probability drops when the channel's node is deleted
(edges into it redirect to NULL, edges out of it vanish):

    effect(c) = (p_full - p_removed(c)) / p_full
    share(c)  = effect(c) / sum_c effect(c)

[[event_transition_matrix]] fits the chain; this puts it to its
canonical use. Channels = the non-purchase event types; 'purchase'
becomes the absorbing CONV state, journeys without one absorb in
NULL.

Conversion probability is the K-step truncated reach probability
(K = {K}): v0 = [CONV: 1], v_{{t+1}}(i) = sum_j P(i,j) * v_t(j). The
chain has cycles, so the infinite-horizon value is a linear solve;
the K-step truncation is the declared metric — both engines compute
the identical recursion, and at K=16 journeys this short are
numerically converged anyway.

Cross-engine exactness ([[product_pagerank]]'s fixed-point integer
discipline): probabilities never materialize as floats —

    v_fix^{{t+1}}(i) = sum_j ( c_ij * v_fix^t(j) ) div c_i

(BIGINT counts c_ij, out-degree totals c_i, integer division,
associative integer sums), absorbing states pinned at FIX / 0. The
removal effect is one more integer op, effect_fix = ((p_full_fix -
p_rem_fix) * FIX) div p_full_fix, and shares divide effect_fix by the
associative BIGINT sum of effect_fixes — every float in the output is
a SINGLE division of exact integers. Truncation error <= 1e-9 per
edge-step, far below any attribution use. Removal effects are
NONNEGATIVE BY CONSTRUCTION: removing a channel reroutes its outgoing
mass to NULL (an absorbing non-conversion state), and the truncated-
horizon value recursion is monotone in the transition weights, so
p_rem_fix <= p_full_fix at every node and iteration. This matters for
cross-engine exactness — effect_fix uses DuckDB `//` (floor division)
on the oracle side and Spark `div` (truncation toward zero), which
agree only for nonnegative numerators; the monotonicity argument is
what guarantees both engines stay on the agreeing branch. If the model
ever changes to one where negative effects are possible (e.g. removed
mass redistributed pro-rata instead of to NULL), the division must be
rewritten to a shared rounding rule (compute on abs, re-sign).

All removal variants run in ONE plan: the transition table is stacked
with a variant key ('full' + one per removed channel — a channels+1
fan-out of a channels^2-row table), and the K iterations join on
(variant, node). Scale shape: ONE fact-sized shuffle (user-day
journey windowing), one transition count aggregation; everything
after runs on the ~variants x channels^2 matrix rows. No collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

ATTR_ITERS = 16
ATTR_FIX = 1_000_000_000  # 1e-9 fixed point


def _idiv(a, b):
    """Exact BIGINT ``a div b`` for a >= 0, b > 0, at any magnitude.

    Works in DECIMAL(38,0) end to end: subtract the exact remainder
    (pmod), then divide the exact multiple — the quotient is an
    integer at every scale, so the decimal divide is exact. The naive
    BIGINT form ``((a - pmod(a, b)) / b)`` runs the division in
    DOUBLE, which rounds the numerator once it passes 2^53 and can
    land one ULP below the true quotient (off-by-one after the bigint
    truncation). That regime needs numerators ≳ 9e15 — unreachable at
    test SFs but routine on a 100 TB event log — and is pinned by
    tests/test_attribution.py::test_idiv_overflow_regime_golden
    (VERDICT r7 #2). Module-level so the test drives the exact
    production expression.

    Cost adjudication (VERDICT r7 #6, sf0.1 local[32], interleaved
    A/B after warm-up, min-of-7): decimal form 1.966s vs the old
    BIGINT-via-double form 1.928s on markov_attribution end to end —
    ~2%, inside run-to-run noise (medians 2.07s both). The r7 driver
    delta on this row (1.593 -> 2.446s) was contended-host inflation,
    not the decimal fold; no confinement of decimal to the accumulate
    step is warranted at a 2% price for exactness."""
    ad = a.cast("decimal(38,0)")
    bd = b.cast("decimal(38,0)")
    return ((ad - F.pmod(ad, bd)) / bd).cast("bigint")
CONV_TYPE = "purchase"


def _oracle() -> str:
    cte = f"""
WITH j AS MATERIALIZED (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts, event_id) AS rn
  FROM events
), fp AS MATERIALIZED (
  SELECT user_id, day, min(rn) AS prn FROM j
  WHERE event_type = '{CONV_TYPE}' GROUP BY user_id, day
), steps AS MATERIALIZED (
  SELECT j.user_id, j.day, j.rn,
         CASE WHEN j.event_type = '{CONV_TYPE}' THEN 'CONV'
              ELSE j.event_type END AS state,
         fp.prn
  FROM j LEFT JOIN fp ON fp.user_id = j.user_id AND fp.day = j.day
  WHERE fp.prn IS NULL OR j.rn <= fp.prn
), hops AS MATERIALIZED (
  SELECT user_id, day,
         coalesce(lag(state) OVER (PARTITION BY user_id, day
                                   ORDER BY rn), 'START') AS src,
         state AS dst
  FROM steps
  UNION ALL
  SELECT user_id, day, state AS src, 'NULL' AS dst
  FROM steps s
  WHERE prn IS NULL
    AND rn = (SELECT max(rn) FROM steps t
              WHERE t.user_id = s.user_id AND t.day = s.day)
), chan AS MATERIALIZED (
  SELECT DISTINCT event_type AS c FROM events
  WHERE event_type <> '{CONV_TYPE}'
), variants AS MATERIALIZED (
  SELECT 'full' AS variant, NULL AS removed
  UNION ALL SELECT 'remove_' || c, c FROM chan
), trans AS MATERIALIZED (
  SELECT v.variant,
         h.src,
         CASE WHEN h.dst = v.removed THEN 'NULL' ELSE h.dst END AS dst,
         CAST(count(*) AS BIGINT) AS c_ij
  FROM hops h CROSS JOIN variants v
  WHERE v.removed IS NULL OR h.src <> v.removed
  GROUP BY 1, 2, 3
), outdeg AS MATERIALIZED (
  SELECT variant, src, CAST(sum(c_ij) AS BIGINT) AS c_i
  FROM trans GROUP BY variant, src
), v0 AS MATERIALIZED (
  SELECT variant, src AS node, CAST(0 AS BIGINT) AS v_fix FROM outdeg
)"""
    for t in range(1, ATTR_ITERS + 1):
        p = f"v{t - 1}"
        cte += f""", v{t} AS MATERIALIZED (
  SELECT o.variant, o.src AS node,
         CAST(sum((tr.c_ij * CASE WHEN tr.dst = 'CONV'
                                  THEN {ATTR_FIX}
                                  WHEN tr.dst = 'NULL' THEN 0
                                  ELSE coalesce(pv.v_fix, 0) END)
                  // o.c_i) AS BIGINT) AS v_fix
  FROM outdeg o
  JOIN trans tr ON tr.variant = o.variant AND tr.src = o.src
  LEFT JOIN {p} pv ON pv.variant = tr.variant AND pv.node = tr.dst
  GROUP BY o.variant, o.src
)"""
    return cte + f""", p AS MATERIALIZED (
  SELECT variant, v_fix FROM v{ATTR_ITERS} WHERE node = 'START'
), eff AS MATERIALIZED (
  SELECT c.c AS channel,
         (SELECT v_fix FROM p WHERE variant = 'full') AS p_full_fix,
         (SELECT v_fix FROM p WHERE variant = 'remove_' || c.c)
           AS p_rem_fix
  FROM chan c
), effx AS MATERIALIZED (
  SELECT channel, p_full_fix, p_rem_fix,
         ((p_full_fix - p_rem_fix) * {ATTR_FIX}) // p_full_fix
           AS effect_fix
  FROM eff
)
SELECT channel,
       round(CAST(p_full_fix AS DOUBLE) / {ATTR_FIX}, 6) AS p_conv_full,
       round(CAST(p_rem_fix AS DOUBLE) / {ATTR_FIX}, 6) AS p_conv_removed,
       round(CAST(effect_fix AS DOUBLE) / {ATTR_FIX}, 6) AS removal_effect,
       round(CAST(effect_fix AS DOUBLE)
             / CAST((SELECT sum(effect_fix) FROM effx) AS DOUBLE), 6)
         AS attribution_share
FROM effx
"""


def journey_hops(events: DataFrame) -> DataFrame:
    """(src, dst) journey transitions — per (user, day), START ->
    first state, consecutive states, truncated at first purchase
    (-> CONV) or closed with -> NULL. Shared by the batch query and
    the streaming twin's parity check (streaming/attribution_state.py)
    so both sides define journeys identically."""
    from pyspark.sql import Window

    w_day = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    j = (events
         .select("user_id", F.to_date("ts").alias("day"),
                 "event_type", "ts", "event_id")
         .withColumn("rn", F.row_number().over(w_day)))
    fp = (j.filter(F.col("event_type") == CONV_TYPE)
          .groupBy("user_id", "day").agg(F.min("rn").alias("prn")))
    steps = (j.join(fp, ["user_id", "day"], "left")
             .filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
             .select("user_id", "day", "rn", "prn",
                     F.when(F.col("event_type") == CONV_TYPE, "CONV")
                     .otherwise(F.col("event_type")).alias("state")))
    # ONE pass emits both hop kinds (round 11): the previous
    # formulation unioned two subtrees over `steps` — forward hops via
    # lag, journey-closing hops via a separate max-rn window — so the
    # whole scan → row_number → first-purchase join chain executed
    # TWICE (no reuse across union branches without a cache). lead()
    # rides the same (user_id, day) window as lag(); a row is the
    # journey's last exactly when lead is NULL, so each row emits its
    # forward hop plus, conditionally, the -> NULL closer, and one
    # map-side explode flattens them. Same single (user_id, day)
    # exchange, half the upstream work.
    w_seq = Window.partitionBy("user_id", "day").orderBy("rn")
    annotated = steps.select(
        "prn", "state",
        F.coalesce(F.lag("state").over(w_seq), F.lit("START")).alias("_prev"),
        F.lead("state").over(w_seq).alias("_nxt"))
    fwd = F.struct(F.col("_prev").alias("src"), F.col("state").alias("dst"))
    closer = F.struct(F.col("state").alias("src"),
                      F.lit("NULL").alias("dst"))
    is_last_open = F.col("prn").isNull() & F.col("_nxt").isNull()
    return (annotated
            .select(F.explode(F.when(is_last_open, F.array(fwd, closer))
                              .otherwise(F.array(fwd))).alias("h"))
            .select("h.src", "h.dst"))


def attribution_from_hops(spark: SparkSession, hops: DataFrame,
                          chan: DataFrame) -> DataFrame:
    """The removal-effect model over a (src, dst) hop table and a
    (c) channel table — the certified math, shared by the batch query
    and the streaming parity check."""
    variants = (chan.select(F.concat(F.lit("remove_"), "c").alias("variant"),
                            F.col("c").alias("removed"))
                .unionByName(spark.range(1).select(
                    F.lit("full").alias("variant"),
                    F.lit(None).cast("string").alias("removed"))))

    trans = (hops.crossJoin(F.broadcast(variants))
             .filter(F.col("removed").isNull()
                     | (F.col("src") != F.col("removed")))
             .select("variant", "src",
                     F.when(F.col("dst") == F.col("removed"), "NULL")
                     .otherwise(F.col("dst")).alias("dst"))
             .groupBy("variant", "src", "dst")
             .agg(F.count(F.lit(1)).cast("bigint").alias("c_ij"))
             .localCheckpoint(eager=True))

    # All ATTR_ITERS rounds run as ONE runtime fold per variant row
    # (the eigen.py recipe): the variants × channels² matrix is
    # collected into one nested-array row per variant — bounded by the
    # channel vocabulary at ANY corpus size — and the recursion
    # iterates inside a single projection via aggregate(sequence(..)).
    # The join-per-round formulation this replaces planned 3 stages ×
    # 16 rounds of single-digit-row shuffles (~5s of scheduling at any
    # SF). Arithmetic is IDENTICAL: per-edge integer division then
    # BIGINT sum. `x div y` has no Column-API equivalent inside a
    # lambda, so _idiv works in DECIMAL(38,0): the numerator
    # c_ij * val can reach edge_count × ATTR_FIX, which passes 2^53
    # (double-exact limit) at c_ij ≈ 9e6 and 2^63 (BIGINT) at
    # c_ij ≈ 9.2e9 — both reachable on a 100 TB event log. In
    # decimal(38,0) the product is exact to 10^38 (c_ij up to ~1e29),
    # pmod subtracts the exact remainder, and the decimal divide of an
    # exact multiple yields the integer quotient (≤ ATTR_FIX, 10
    # digits) exactly at any result scale. Nonnegative numerators
    # (module docstring) make truncation == floor == this form, so the
    # value matches DuckDB's exact integer `//` bit for bit.
    nodes_row = (trans.select("src").distinct().groupBy()
                 .agg(F.array_sort(F.collect_list("src")).alias("nodes")))
    j_idx = F.expr("CAST(CASE WHEN dst = 'CONV' THEN size(nodes) + 1 "
                   "WHEN dst = 'NULL' THEN size(nodes) + 2 "
                   "ELSE array_position(nodes, dst) END AS INT)")
    trans_idx = (trans.crossJoin(F.broadcast(nodes_row))
                 .select("variant",
                         F.expr("CAST(array_position(nodes, src) AS INT)")
                         .alias("i"),
                         j_idx.alias("j"), "c_ij"))
    per_src = (trans_idx.groupBy("variant", "i")
               .agg(F.sum("c_ij").cast("bigint").alias("c_i"),
                    F.collect_list(F.struct("j", "c_ij")).alias("edges")))
    per_variant = (per_src.groupBy("variant")
                   .agg(F.map_from_entries(F.collect_list(
                       F.struct("i", F.struct("c_i", "edges"))))
                       .alias("rows"))
                   .crossJoin(F.broadcast(nodes_row)))

    def _val(j, acc):  # dst value: CONV -> FIX, NULL/unknown -> 0
        return (F.when(j == F.size("nodes") + 1,
                       F.lit(ATTR_FIX).cast("bigint"))
                .when((j == F.size("nodes") + 2) | (j == 0),
                      F.lit(0).cast("bigint"))
                .otherwise(F.coalesce(F.element_at(acc, j),
                                      F.lit(0).cast("bigint"))))

    def _step(acc, _k):
        def node_val(i):
            row = F.element_at(F.col("rows"), i)
            return (F.when(row.isNull(), F.lit(0).cast("bigint"))
                    .otherwise(F.aggregate(
                        row["edges"], F.lit(0).cast("bigint"),
                        lambda s, e: s + _idiv(
                            e["c_ij"].cast("decimal(38,0)")
                            * _val(e["j"], acc),
                            row["c_i"]))))
        return F.transform(F.sequence(F.lit(1), F.size("nodes")),
                           node_val)

    v0 = F.transform(F.sequence(F.lit(1), F.size("nodes")),
                     lambda _i: F.lit(0).cast("bigint"))
    v_final = F.aggregate(F.sequence(F.lit(1), F.lit(ATTR_ITERS)),
                          v0, _step)
    p = per_variant.select(
        "variant",
        F.element_at(
            v_final,
            F.expr("CAST(array_position(nodes, 'START') AS INT)"))
        .alias("v_fix"))
    p_full = p.filter(F.col("variant") == "full") \
        .select(F.col("v_fix").alias("p_full_fix"))
    eff = (chan
           .join(p.withColumn("c", F.expr(
               "substring(variant, 8)")).filter(
               F.col("variant") != "full")
               .select("c", F.col("v_fix").alias("p_rem_fix")), "c")
           .crossJoin(F.broadcast(p_full))
           .select(F.col("c").alias("channel"), "p_full_fix", "p_rem_fix",
                   F.expr(f"((p_full_fix - p_rem_fix) "
                          f"* CAST({ATTR_FIX} AS BIGINT)) div p_full_fix")
                   .alias("effect_fix")))
    tot = eff.agg(F.sum("effect_fix").cast("bigint").alias("tot_fix"))
    return (eff.crossJoin(F.broadcast(tot))
            .select(
                "channel",
                F.round(F.col("p_full_fix").cast("double") / ATTR_FIX, 6)
                .alias("p_conv_full"),
                F.round(F.col("p_rem_fix").cast("double") / ATTR_FIX, 6)
                .alias("p_conv_removed"),
                F.round(F.col("effect_fix").cast("double") / ATTR_FIX, 6)
                .alias("removal_effect"),
                F.round(F.col("effect_fix").cast("double")
                        / F.col("tot_fix").cast("double"), 6)
                .alias("attribution_share")))


@query(
    "markov_attribution",
    _oracle(),
    doc=f"Data-driven multi-touch attribution: per-(user, day) "
        f"journeys truncated at first purchase, a first-order Markov "
        f"chain per removal variant ('full' + one per channel, edges "
        f"into the removed node redirected to NULL, its out-edges "
        f"dropped), and each channel's removal effect on the "
        f"{ATTR_ITERS}-step START->CONV reach probability plus the "
        f"normalized attribution share. The whole recursion runs in "
        f"1e-9 fixed-point integer arithmetic (contrib = c_ij * "
        f"v_fix div c_i), so the iterative result hash-matches the "
        f"unrolled-CTE oracle; every output float is one division of "
        f"exact BIGINTs. One fact shuffle for journey windowing, one "
        f"transition count agg; all {ATTR_ITERS} rounds run on the "
        f"variants x channels^2 matrix.",
    tags=("funnel", "ml", "iterative", "north-star"),
)
def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    chan = (events.filter(F.col("event_type") != CONV_TYPE)
            .select(F.col("event_type").alias("c")).distinct())
    return attribution_from_hops(spark, journey_hops(events), chan)
