"""Cogrouped-pandas escape hatch, certified against the native plan.

When two-sided per-key logic genuinely can't be expressed with joins
and windows, Spark's documented escape hatch is
``groupBy().cogroup().applyInPandas`` — both sides' rows for a key
arrive as two Arrow-backed pandas frames. The danger of that API is
silent semantic drift from the relational formulation, so this module
implements the as-of prior-purchase match (J2) BOTH ways and the
parity test (tests/test_pandas_twins.py) pins the cogrouped version
row-for-row to the certified native window query
(joins.q_asof_prior_purchase, DuckDB-oracle-green).

Scale shape: cogroup shuffles each side once on the group key and
streams one key's two frames at a time through Arrow — per-key
memory, not per-partition; fine for retail-sized keys, and the native
window version remains the default engine path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecommerce_analytics_spark.operators.retail import (
    ORDER_KEYS, transactions,
)

_OUT_SCHEMA = T.StructType([
    T.StructField("customer_id", T.LongType()),
    T.StructField("invoice_no", T.LongType()),
    T.StructField("line_no", T.IntegerType()),
    T.StructField("stock_code", T.LongType()),
    T.StructField("invoice_date", T.TimestampType()),
    T.StructField("quantity", T.DoubleType()),
    T.StructField("last_purchase_qty", T.DoubleType()),
    T.StructField("days_since_purchase", T.IntegerType()),
    T.StructField("return_kind", T.StringType()),
])

_SORT = list(ORDER_KEYS)


def _asof_cogroup_fn(returns: pd.DataFrame,
                     purchases: pd.DataFrame) -> pd.DataFrame:
    """Two-pointer as-of over the shared ORDER_KEYS total order: for
    each return, the most recent purchase strictly earlier in that
    order (the native window's rowsBetween(..., -1) semantics)."""
    if returns.empty:
        return pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA])
    r = returns.sort_values(_SORT).reset_index(drop=True)
    p = purchases.sort_values(_SORT).reset_index(drop=True)
    p_keys = list(p[_SORT].itertuples(index=False, name=None))
    out_qty, out_date = [], []
    j = 0
    last_qty, last_date = None, None
    for rk in r[_SORT].itertuples(index=False, name=None):
        while j < len(p_keys) and p_keys[j] < rk:
            last_qty = p["quantity"].iloc[j]
            last_date = p["invoice_date"].iloc[j]
            j += 1
        out_qty.append(last_qty)
        out_date.append(last_date)
    r = r.assign(last_purchase_qty=out_qty, _lp_date=out_date)
    days = (r["invoice_date"].dt.normalize()
            - pd.to_datetime(r["_lp_date"]).dt.normalize()).dt.days
    kind = pd.Series("partial_return", index=r.index)
    kind[r["last_purchase_qty"].isna()] = "no_prior_purchase"
    kind[r["quantity"].abs() == r["last_purchase_qty"]] = "full_return"
    return pd.DataFrame({
        "customer_id": r["customer_id"],
        "invoice_no": r["invoice_no"],
        "line_no": r["line_no"],
        "stock_code": r["stock_code"],
        "invoice_date": r["invoice_date"],
        "quantity": r["quantity"],
        "last_purchase_qty": r["last_purchase_qty"],
        "days_since_purchase": days,
        "return_kind": kind,
    })


def asof_prior_purchase_cogroup(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    # two independent builds: cogrouping two filters of the SAME
    # DataFrame trips Spark's ambiguous-self-join detection
    returns = transactions(spark, sf_dir).filter("is_return")
    purchases = transactions(spark, sf_dir).filter(~F.col("is_return"))
    return (returns.groupBy("customer_id", "stock_code")
            .cogroup(purchases.groupBy("customer_id", "stock_code"))
            .applyInPandas(_asof_cogroup_fn, _OUT_SCHEMA))
