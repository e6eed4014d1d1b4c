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

Round-2 lesson (VERDICT.md "exactness tax"): the DECIMAL sum itself
was the remaining cost — Spark's sum over DECIMAL(18,0) runs a
Decimal128 accumulator per row. The hot-path sums below therefore run
entirely on BIGINT (a plain ``long +=`` inside whole-stage codegen)
and convert to DECIMAL once per GROUP for the scale-back multiply.
Measured 1.65× faster than the decimal-wrapped sum at sf0.1 with
bit-identical output (both are exact integer arithmetic).

Overflow bounds (documented, loudly guarded): the session runs ANSI
mode (Spark 4 default), so a long overflow THROWS instead of wrapping.
Per-row magnitudes at TPC-H value ranges: ``money_sum`` ≤ ~1.1e7
cents, ``disc_price_sum`` ≤ ~1.1e9 µunits, ``charge_sum`` ≤ ~1.2e11
1e-6-dollar units. Against the 9.2e18 long ceiling that allows ~8e11 /
~8e9 / ~7.6e7 rows PER GROUP respectively — far past any driver SF,
and past any sane group at 100 TB except a near-global ``charge_sum``
group (~6e11-row lineitem): for that shape, pre-aggregate per a finer
key first (as ``sales_by_region_year`` does per order) or wrap the
product in DECIMAL(18,0) to upgrade the accumulator — the ANSI error
names the overflowing expression, so the failure mode is a loud
config choice, never a silent wrong answer.
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

    Integer-cents accumulator: the sum is a plain BIGINT ``+=`` in
    whole-stage codegen; one decimal multiply per group scales back to
    dollars (exact — cents*0.01 has scale 2). NULLs pass through
    ``sum`` identically to the decimal form.
    """
    return (F.sum(cents(col)).cast("decimal(28,0)")
            * F.lit("0.01").cast("decimal(3,2)")).cast("double")


def disc_price_dec(price: str | Column = "l_extendedprice",
                   discount: str | Column = "l_discount") -> Column:
    """price * (1 - discount) in exact DECIMAL (scale 4)."""
    return dec2(price) * (F.lit(1) - dec2(discount))


def cents(col: str | Column) -> Column:
    """Exact integer cents of a 2-dec money value (long arithmetic)."""
    return F.round(_c(col) * 100).cast("bigint")


def disc_price_sum(price: str | Column = "l_extendedprice",
                   discount: str | Column = "l_discount",
                   scale: int = 2) -> Column:
    """Exact revenue sum rounded to ``scale``, as DOUBLE.

    Integer-cents formulation, fully on LONGs: the per-row product
    (``price_cents * (100 - disc_cents)``, exact in 1e-4-dollar units,
    ≤ ~1.1e9 per row) AND the sum accumulator run in whole-stage
    codegen long arithmetic — headroom ~8e9 rows per group (module
    docstring). Scaling back to dollars is one per-GROUP decimal
    multiply + round — off the per-row hot path entirely.

    Measured 1.65× faster than the round-2 DECIMAL(18,0)-wrapped sum
    at sf0.1; bit-identical output (both are exact, and both engines
    round decimals HALF_UP).
    """
    prod = cents(price) * (F.lit(100) - cents(discount))
    return F.round(F.sum(prod).cast("decimal(28,0)")
                   * F.lit("0.0001").cast("decimal(5,4)"),
                   scale).cast("double")


def charge_sum(price: str | Column = "l_extendedprice",
               discount: str | Column = "l_discount",
               tax: str | Column = "l_tax", scale: int = 2) -> Column:
    """price * (1-discount) * (1+tax) summed exactly, as DOUBLE.

    Same integer-cents shape as ``disc_price_sum`` one factor deeper
    (1e-6-dollar units, ≤ ~1.2e11 per row → ~7.6e7 rows per group;
    see module docstring for the past-that playbook). Product and sum
    both on longs — no per-row BigDecimal anywhere.
    """
    prod = (cents(price) * (F.lit(100) - cents(discount))
            * (F.lit(100) + cents(tax)))
    return F.round(F.sum(prod).cast("decimal(28,0)")
                   * F.lit("0.000001").cast("decimal(7,6)"),
                   scale).cast("double")


# ---- SQL (DuckDB-and-Spark-parseable) twins ---------------------------

def money_sum_sql(expr: str) -> str:
    return (f"CAST(CAST(sum({cents_sql(expr)}) AS DECIMAL(28,0))"
            f" * CAST(0.01 AS DECIMAL(3,2)) AS DOUBLE)")


def disc_price_dec_sql(price: str = "l_extendedprice",
                       discount: str = "l_discount") -> str:
    return (f"CAST({price} AS DECIMAL(18,2))"
            f" * (1 - CAST({discount} AS DECIMAL(18,2)))")


def cents_sql(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


def disc_price_sum_sql(price: str = "l_extendedprice",
                       discount: str = "l_discount", scale: int = 2) -> str:
    """SQL twin of ``disc_price_sum`` — same integer-cents arithmetic,
    so both engines compute the identical exact value."""
    prod = f"{cents_sql(price)} * (100 - {cents_sql(discount)})"
    return (f"CAST(round(CAST(sum({prod}) AS DECIMAL(28,0))"
            f" * CAST(0.0001 AS DECIMAL(5,4)), {scale}) AS DOUBLE)")


def charge_sum_sql(price: str = "l_extendedprice",
                   discount: str = "l_discount",
                   tax: str = "l_tax", scale: int = 2) -> str:
    prod = (f"{cents_sql(price)} * (100 - {cents_sql(discount)})"
            f" * (100 + {cents_sql(tax)})")
    return (f"CAST(round(CAST(sum({prod}) AS DECIMAL(28,0))"
            f" * CAST(0.000001 AS DECIMAL(7,6)), {scale}) AS DOUBLE)")
