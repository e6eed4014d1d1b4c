"""Data-governance operators: deletion propagation and snapshot diff.

Two maintenance surfaces every production lake needs and the reference
(whose MongoDB sink keeps raw per-user documents forever,
DataStorage.java) entirely lacks:

- ``purge_cascade`` — GDPR/CCPA right-to-be-forgotten: a tombstone set
  of customer keys fans out through the schema's foreign keys (orders
  by custkey, lineitem by orderkey-of-purged-order, events by
  user_id), producing a per-table purge audit with kept-set checksums.
  Plan shape at 100 TB: the tombstone dim broadcasts to every fact
  (never shuffles the facts by user), and the lineitem cascade is a
  key-propagating join on the natural orderkey — AQE picks
  broadcast vs shuffle by the actual purged-order count.
- ``diff_tables`` — snapshot reconciliation: full-outer join two
  versions of a table on its primary key and classify every row as
  added / removed / changed / unchanged, with per-status counts and
  key checksums. This is the migration-validation primitive ("did the
  rewrite/backfill change anything it shouldn't?"). At scale it is
  one sort-merge full-outer on the key — co-locatable for free when
  both versions are bucketed by the key (io.write_bucketed), which
  turns the reconcile into a zero-exchange zip.

The registered queries derive both snapshot versions and the tombstone
set deterministically from the driver tables (modulus rules), so the
DuckDB oracle certifies counts AND checksums exactly — no synthetic
side files. Column comparisons are column-wise equality (never
stringified row hashes: double/timestamp → string formatting is
engine-specific and would poison the comparison).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.io import load_table
from ecommerce_analytics_spark.plans.registry import query

TOMB_MOD = 97      # c_custkey % 97 == 0 → deletion request
DIFF_DEL_MOD = 101   # dropped in the new snapshot
DIFF_CHG_MOD = 103   # o_totalprice bumped in the new snapshot
DIFF_ADD_MOD = 107   # absent from the old snapshot ("added" rows)


def purge_cascade(tombstones: DataFrame, tables: dict[str, tuple[DataFrame, str, Column, str]],
                  ) -> DataFrame:
    """Generic deletion-propagation audit.

    ``tombstones``: single-column DataFrame of purged root keys.
    ``tables``: name -> (df, join_key_col_name, purge_condition_after
    left join, checksum_col_name). Returns one audit row per table:
    rows_total / rows_purged / rows_kept / kept_checksum.
    """
    audits = []
    for name, (df, key, purged_flag, ck) in tables.items():
        flagged = df.withColumn("_purged", purged_flag)
        audits.append(flagged.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("rows_total"),
            F.count_if(F.col("_purged")).cast("long").alias("rows_purged"),
            F.count_if(~F.col("_purged")).cast("long").alias("rows_kept"),
            F.sum(F.when(~F.col("_purged"), F.col(ck)))
            .cast("long").alias("kept_checksum"),
        ))
    return reduce(DataFrame.unionByName, audits)


_PURGE_ORACLE = f"""
WITH tomb AS (
  SELECT c_custkey FROM customer WHERE c_custkey % {TOMB_MOD} = 0
), o AS (
  SELECT o.o_orderkey, (t.c_custkey IS NOT NULL) AS purged
  FROM orders o LEFT JOIN tomb t ON o.o_custkey = t.c_custkey
), audit AS (
  SELECT 'customer' AS table_name,
         CAST(count(*) AS BIGINT) AS rows_total,
         CAST(count(*) FILTER (WHERE c_custkey % {TOMB_MOD} = 0) AS BIGINT)
           AS rows_purged,
         CAST(count(*) FILTER (WHERE c_custkey % {TOMB_MOD} != 0) AS BIGINT)
           AS rows_kept,
         CAST(sum(c_custkey) FILTER (WHERE c_custkey % {TOMB_MOD} != 0)
              AS BIGINT) AS kept_checksum
  FROM customer
  UNION ALL
  SELECT 'orders', CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE purged) AS BIGINT),
         CAST(count(*) FILTER (WHERE NOT purged) AS BIGINT),
         CAST(sum(o_orderkey) FILTER (WHERE NOT purged) AS BIGINT)
  FROM o
  UNION ALL
  SELECT 'lineitem', CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE purged) AS BIGINT),
         CAST(count(*) FILTER (WHERE NOT purged) AS BIGINT),
         CAST(sum(l_orderkey) FILTER (WHERE NOT purged) AS BIGINT)
  FROM (SELECT l.l_orderkey, coalesce(o.purged, FALSE) AS purged
        FROM lineitem l LEFT JOIN o ON l.l_orderkey = o.o_orderkey)
  UNION ALL
  SELECT 'events', CAST(count(*) AS BIGINT),
         CAST(count(*) FILTER (WHERE t.c_custkey IS NOT NULL) AS BIGINT),
         CAST(count(*) FILTER (WHERE t.c_custkey IS NULL) AS BIGINT),
         CAST(sum(e.event_id) FILTER (WHERE t.c_custkey IS NULL) AS BIGINT)
  FROM events e LEFT JOIN tomb t ON e.user_id = t.c_custkey
)
SELECT * FROM audit
"""


@query(
    "gdpr_purge_audit",
    _PURGE_ORACLE,
    doc=f"Right-to-be-forgotten cascade: customers with c_custkey % "
        f"{TOMB_MOD} = 0 are tombstoned; the purge fans out to orders "
        "(by custkey), lineitem (by orderkey of a purged order) and "
        "events (by user_id). One audit row per table with exact "
        "counts + kept-set BIGINT checksums. Tombstones broadcast to "
        "every fact; the lineitem cascade joins on the natural "
        "orderkey so facts never reshuffle by user.",
    tags=("governance", "join", "north-star"),
)
def q_gdpr_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    # Checkpoint the tombstone set (tiny) and the per-order purge
    # flags (orderkey + bool): tomb is referenced by two flag builds
    # and o_flag by two (its own audit + the lineitem cascade) — each
    # uncached reference re-scanned customer/orders (customer×4,
    # orders×2 in the plan census; round 11, guide §2.4).
    tomb = (customer.filter(F.col("c_custkey") % TOMB_MOD == 0)
            .select("c_custkey").localCheckpoint(eager=True))

    cust_flag = customer.select(
        F.col("c_custkey"),
        (F.col("c_custkey") % TOMB_MOD == 0).alias("_p"))
    o_flag = (orders.join(F.broadcast(tomb),
                          orders.o_custkey == tomb.c_custkey, "left")
              .select("o_orderkey",
                      F.col("c_custkey").isNotNull().alias("_p"))
              .localCheckpoint(eager=True))
    li_flag = (lineitem.select("l_orderkey")
               .join(o_flag.withColumnRenamed("_p", "_op"),
                     F.col("l_orderkey") == o_flag.o_orderkey, "left")
               .select("l_orderkey",
                       F.coalesce(F.col("_op"), F.lit(False)).alias("_p")))
    ev_flag = (events.select("event_id", "user_id")
               .join(F.broadcast(tomb),
                     events.user_id == tomb.c_custkey, "left")
               .select("event_id",
                       F.col("c_custkey").isNotNull().alias("_p")))

    def audit(df: DataFrame, name: str, ck: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("rows_total"),
            F.count_if(F.col("_p")).cast("long").alias("rows_purged"),
            F.count_if(~F.col("_p")).cast("long").alias("rows_kept"),
            F.sum(F.when(~F.col("_p"), F.col(ck)))
            .cast("long").alias("kept_checksum"))

    return (audit(cust_flag, "customer", "c_custkey")
            .unionByName(audit(o_flag, "orders", "o_orderkey"))
            .unionByName(audit(li_flag, "lineitem", "l_orderkey"))
            .unionByName(audit(ev_flag, "events", "event_id")))


def diff_tables(old: DataFrame, new: DataFrame, key: str,
                compare_cols: list[str]) -> DataFrame:
    """Row-level snapshot diff: full-outer join on ``key``, classify
    each row added/removed/changed/unchanged via column-wise
    null-safe equality (``eqNullSafe`` — never stringified hashes)."""
    o = old.select(F.col(key).alias("_ok"),
                   *[F.col(c).alias(f"_o_{c}") for c in compare_cols])
    n = new.select(F.col(key).alias("_nk"),
                   *[F.col(c).alias(f"_n_{c}") for c in compare_cols])
    same = reduce(Column.__and__,
                  [F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
                   for c in compare_cols])
    joined = o.join(n, o._ok == n._nk, "full_outer")
    return joined.select(
        F.coalesce(F.col("_ok"), F.col("_nk")).alias("row_key"),
        F.when(F.col("_ok").isNull(), "added")
         .when(F.col("_nk").isNull(), "removed")
         .when(same, "unchanged")
         .otherwise("changed").alias("status"))


_DIFF_ORACLE = f"""
WITH v_old AS (
  SELECT * FROM orders WHERE o_orderkey % {DIFF_ADD_MOD} != 0
), v_new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % {DIFF_CHG_MOD} = 0
              THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % {DIFF_DEL_MOD} != 0
), classified AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS row_key,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
               AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
               AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
               AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
               AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority
              THEN 'unchanged' ELSE 'changed' END AS status
  FROM v_old o FULL OUTER JOIN v_new n ON o.o_orderkey = n.o_orderkey
)
SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(row_key) AS BIGINT) AS key_checksum
FROM classified GROUP BY status
"""


@query(
    "snapshot_diff_orders",
    _DIFF_ORACLE,
    doc="Snapshot reconciliation: two deterministic simulated versions "
        f"of orders (new drops keys %{DIFF_DEL_MOD}=0, bumps "
        f"o_totalprice on %{DIFF_CHG_MOD}=0; old lacks %{DIFF_ADD_MOD}"
        "=0) full-outer joined on the key; every row classified "
        "added/removed/changed/unchanged via column-wise null-safe "
        "equality. Per-status counts + key checksums. At 100 TB: one "
        "sort-merge full-outer per reconcile, zero-exchange when both "
        "snapshots are bucketed by the key.",
    tags=("governance", "join", "north-star"),
)
def q_snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    v_old = orders.filter(F.col("o_orderkey") % DIFF_ADD_MOD != 0)
    v_new = (orders.filter(F.col("o_orderkey") % DIFF_DEL_MOD != 0)
             .withColumn("o_totalprice",
                         F.when(F.col("o_orderkey") % DIFF_CHG_MOD == 0,
                                F.col("o_totalprice") + 1.0)
                         .otherwise(F.col("o_totalprice"))))
    diff = diff_tables(v_old, v_new, "o_orderkey", cols)
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("row_key").cast("long").alias("key_checksum"))
