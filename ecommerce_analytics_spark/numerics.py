"""Exact-decimal money arithmetic shared by plans and oracles.

Round-1 lesson (VERDICT.md: ``sales_by_region_year`` driver FAIL):
double sums are non-associative, so the same query summed in a
different order — Spark partial-agg merge order varies with partition
count; DuckDB window frames use segment trees — can differ by ~1e-12,
and ``round(..., 2)`` amplifies that into a visible cent on groups that
straddle a rounding boundary. The driver hashes raw values, so a single
flipped cent is a correctness FAIL.

Every money column in the driver tables (``l_extendedprice``,
``l_discount``, ``l_tax``, ``o_totalprice``, ``events.value``) is
losslessly representable as DECIMAL(18,2) (verified against all SF
dirs). Decimal addition is associative and both engines round decimals
HALF_UP, so summing in DECIMAL makes every plan shape — pre-aggregated,
re-partitioned, segment-tree — produce the identical exact value, cast
to DOUBLE only at the output edge.

At 100 TB this costs nothing: Spark's decimal sum over precision ≤ 18
inputs uses long arithmetic inside whole-stage codegen (an unscaled
128-bit accumulator at worst), and stays fully partial-aggregable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_DEC = "decimal(18,2)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec2(col: str | Column) -> Column:
    """Lossless 2-dec money value as DECIMAL(18,2)."""
    return _c(col).cast(MONEY_DEC)


def money_sum(col: str | Column) -> Column:
    """Exact associative sum of a 2-dec money column, as DOUBLE.

    Identical value to ``round(sum(double), 2)`` except at the rounding
    boundaries where the double sum is wrong — the exact sum of 2-dec
    values already has 2 decimals, so no rounding step exists to diverge.
    """
    return F.sum(dec2(col)).cast("double")


def disc_price_dec(price: str | Column = "l_extendedprice",
                   discount: str | Column = "l_discount") -> Column:
    """price * (1 - discount) in exact DECIMAL (scale 4)."""
    return dec2(price) * (F.lit(1) - dec2(discount))


def disc_price_sum(price: str | Column = "l_extendedprice",
                   discount: str | Column = "l_discount",
                   scale: int = 2) -> Column:
    """Exact revenue sum rounded to ``scale``, as DOUBLE."""
    return F.round(F.sum(disc_price_dec(price, discount)), scale) \
        .cast("double")


def charge_sum(price: str | Column = "l_extendedprice",
               discount: str | Column = "l_discount",
               tax: str | Column = "l_tax", scale: int = 2) -> Column:
    """price * (1-discount) * (1+tax) summed exactly, as DOUBLE.

    The factor terms are narrowed to DECIMAL(3,2) (discount/tax live in
    [0, 0.10]) so the three-way product stays well inside precision 38
    in BOTH engines — a wide 18,2 three-way product would overflow
    Spark's cap and silently lose scale."""
    one_minus = (F.lit(1) - _c(discount).cast("decimal(4,2)")) \
        .cast("decimal(3,2)")
    one_plus = (F.lit(1) + _c(tax).cast("decimal(4,2)")) \
        .cast("decimal(3,2)")
    return F.round(F.sum(dec2(price) * one_minus * one_plus), scale) \
        .cast("double")


# ---- SQL (DuckDB-and-Spark-parseable) twins ---------------------------

def money_sum_sql(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def disc_price_dec_sql(price: str = "l_extendedprice",
                       discount: str = "l_discount") -> str:
    return (f"CAST({price} AS DECIMAL(18,2))"
            f" * (1 - CAST({discount} AS DECIMAL(18,2)))")


def disc_price_sum_sql(price: str = "l_extendedprice",
                       discount: str = "l_discount", scale: int = 2) -> str:
    return (f"CAST(round(sum({disc_price_dec_sql(price, discount)}),"
            f" {scale}) AS DOUBLE)")


def charge_sum_sql(price: str = "l_extendedprice",
                   discount: str = "l_discount",
                   tax: str = "l_tax", scale: int = 2) -> str:
    return (f"CAST(round(sum(CAST({price} AS DECIMAL(18,2))"
            f" * CAST(1 - CAST({discount} AS DECIMAL(4,2)) AS DECIMAL(3,2))"
            f" * CAST(1 + CAST({tax} AS DECIMAL(4,2)) AS DECIMAL(3,2))),"
            f" {scale}) AS DOUBLE)")
