"""Skew mitigation utilities (SURVEY §4.3, brief: 'skewed keys →
salting or AQE skew-join').

AQE's skew-join split handles sort-merge skew automatically; salting is
the manual tool for the cases AQE can't touch — skewed *aggregations*
and skewed broadcast-probe joins. Both utilities are semantics-
preserving rewrites, parity-tested against their naive forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_groupby_sum(df: DataFrame, key: str, value: str,
                       n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for a hot group key.

    Phase 1 shuffles on (key, salt) — the hot key spreads over n_salts
    reducers; phase 2 combines the n_salts partials per key (tiny).
    Semantics == df.groupBy(key).sum(value) exactly (sum is
    associative; no row is dropped or duplicated).

    The salt must be deterministic per ROW yet spread uniformly —
    a content hash of the whole row tuple does both without RNG.
    """
    salt = F.pmod(F.hash(F.struct(*df.columns)), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(f"sum_{value}"))


def salted_join(skewed: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16) -> DataFrame:
    """Replicated-salt join: the skewed side gets a per-row salt, the
    small side is replicated n_salts times, and the join key becomes
    (key, salt) — a single hot key fans out over n_salts tasks.

    Use when the small side is broadcastable-but-not-quite or when a
    shuffle join must survive one pathological key. Row multiset of the
    output == plain inner join.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    skewed_s = skewed.withColumn(
        "_salt", F.pmod(F.hash(F.struct(*skewed.columns)), F.lit(n_salts)))
    small_s = small.withColumn("_salt", F.explode(salts))
    out = skewed_s.join(small_s, [key, "_salt"]).drop("_salt")
    return out
