"""Salted TPC-H relational fixture (VERDICT r6 #1).

Builds a hostile copy of an SF dir where `lineitem`, `orders`, and
`customer` are adversarially mutated and extended — the last input
family without adversarial certification (documents / embeddings /
events each got one in round 6 and each found real defects).

Both engines read the SAME salted parquet files, so unlike
operators/hostile.py (which mutates inside the plan) no oracle changes
are needed for the mutation itself — any mismatch is a genuine
cross-engine divergence in the registered query or its oracle.

Salt classes (all deterministic, keyed on primary-key residues against
distinct primes so classes overlap order-free):

orders
  * NULL o_orderdate (breaks date grouping + every window ordered on it)
  * NULL o_custkey (join key), NULL o_orderstatus / o_orderpriority
  * NULL and NEGATIVE o_totalprice
  * duplicate o_orderkey rows with a different priority (join fan-out)
  * a MEGA-CUSTOMER with 10k extra orders (join + window skew); the
    orders carry distinct timestamps/prices so window frames stay
    deterministic, and have no lineitems (left-join null class)
customer
  * NULL c_nationkey (dim-join key), NULL c_acctbal / c_mktsegment /
    c_name; duplicate c_custkey with different acctbal
lineitem
  * NULL l_quantity, NULL l_discount, NULL l_returnflag, NULL l_shipdate
  * NULL and NEGATIVE l_extendedprice
  * orphan l_orderkey rows (no matching order)

A second variant, EMPTY-ORDERS, replaces orders with a zero-row table
of the same schema: the 100 TB analog of an empty partition reaching
every orders-consuming plan.
"""

from __future__ import annotations

import os

MEGA_CUSTKEY = 42          # existing customer: 10k orders land on them
N_MEGA_ORDERS = 10_000
N_ORPHAN_LINES = 60

_SALT_ORDERS = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 97 = 1 THEN NULL ELSE o_custkey END
         AS o_custkey,
       CASE WHEN o_orderkey % 89 = 2 THEN NULL ELSE o_orderstatus END
         AS o_orderstatus,
       CASE WHEN o_orderkey % 83 = 3 THEN NULL
            WHEN o_orderkey % 79 = 4 THEN -o_totalprice
            ELSE o_totalprice END AS o_totalprice,
       CASE WHEN o_orderkey % 73 = 5 THEN NULL ELSE o_orderdate END
         AS o_orderdate,
       CASE WHEN o_orderkey % 71 = 6 THEN NULL ELSE o_orderpriority END
         AS o_orderpriority
FROM base
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       '9-DUPLICATE' AS o_orderpriority
FROM base WHERE o_orderkey % 211 = 7
UNION ALL
-- duplicate orderkey whose copy DISAGREES on the date (a corrected
-- ingest row): DISTINCT-based dedup keeps both and re-creates the
-- recursive-chain self-loop; canonical-row picks must collapse it
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       o_orderdate + to_days(1) AS o_orderdate,
       '9-REDATED' AS o_orderpriority
FROM base WHERE o_orderkey % 223 = 8 AND o_orderdate IS NOT NULL
UNION ALL
-- a customer whose ONLY order has a NULL price: RFM monetary is NULL
-- (oracle-matched) and the KMeans feature build must tolerate it
SELECT 89000001 AS o_orderkey, 888888 AS o_custkey,
       'O' AS o_orderstatus, NULL AS o_totalprice,
       TIMESTAMP '2024-02-02 00:00:00' AS o_orderdate,
       '5-LOW' AS o_orderpriority
UNION ALL
SELECT 90000000 + i AS o_orderkey,
       {mega} AS o_custkey,
       'O' AS o_orderstatus,
       100.0 + i AS o_totalprice,
       TIMESTAMP '2024-01-01 00:00:00' + to_minutes(CAST(i AS BIGINT))
         AS o_orderdate,
       '1-URGENT' AS o_orderpriority
FROM range({n_mega}) t(i)
""".format(mega=MEGA_CUSTKEY, n_mega=N_MEGA_ORDERS)

_SALT_CUSTOMER = """
SELECT c_custkey,
       CASE WHEN c_custkey % 41 = 3 THEN NULL ELSE c_name END AS c_name,
       CASE WHEN c_custkey % 31 = 1 THEN NULL ELSE c_nationkey END
         AS c_nationkey,
       CASE WHEN c_custkey % 37 = 2 THEN NULL ELSE c_acctbal END
         AS c_acctbal,
       CASE WHEN c_custkey % 47 = 5 THEN NULL ELSE c_mktsegment END
         AS c_mktsegment
FROM base
UNION ALL
SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000000.0,
       c_mktsegment
FROM base WHERE c_custkey % 43 = 4
"""

_SALT_LINEITEM = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       CASE WHEN l_orderkey % 101 = 3 THEN NULL ELSE l_quantity END
         AS l_quantity,
       CASE WHEN l_orderkey % 103 = 5 THEN NULL
            WHEN l_orderkey % 107 = 6 THEN -l_extendedprice
            ELSE l_extendedprice END AS l_extendedprice,
       CASE WHEN l_orderkey % 109 = 7 THEN NULL ELSE l_discount END
         AS l_discount,
       l_tax,
       CASE WHEN l_orderkey % 113 = 8 THEN NULL ELSE l_returnflag END
         AS l_returnflag,
       l_linestatus,
       CASE WHEN l_orderkey % 127 = 9 THEN NULL ELSE l_shipdate END
         AS l_shipdate
FROM base
UNION ALL
SELECT 95000000 + i AS l_orderkey,
       1 + i % 200 AS l_partkey,
       1 + i % 100 AS l_suppkey,
       1 AS l_linenumber,
       5.0 AS l_quantity,
       500.0 + i AS l_extendedprice,
       0.05 AS l_discount,
       0.02 AS l_tax,
       'N' AS l_returnflag,
       'O' AS l_linestatus,
       TIMESTAMP '2024-03-01 00:00:00' + to_minutes(CAST(i AS BIGINT))
         AS l_shipdate
FROM range({n_orphan}) t(i)
""".format(n_orphan=N_ORPHAN_LINES)

_SALT_PART = """
SELECT p_partkey,
       CASE WHEN p_partkey % 29 = 5 THEN NULL ELSE p_name END AS p_name,
       CASE WHEN p_partkey % 13 = 1 THEN NULL ELSE p_brand END
         AS p_brand,
       p_type,
       CASE WHEN p_partkey % 23 = 4 THEN NULL ELSE p_size END AS p_size,
       CASE WHEN p_partkey % 17 = 2 THEN NULL
            WHEN p_partkey % 19 = 3 THEN -p_retailprice
            ELSE p_retailprice END AS p_retailprice
FROM base
UNION ALL
SELECT p_partkey, p_name, 'Brand#DUP' AS p_brand, p_type, p_size,
       p_retailprice
FROM base WHERE p_partkey % 211 = 6
"""

_SALT_SUPPLIER = """
SELECT s_suppkey,
       CASE WHEN s_suppkey % 17 = 3 THEN NULL ELSE s_name END AS s_name,
       CASE WHEN s_suppkey % 11 = 1 THEN NULL ELSE s_nationkey END
         AS s_nationkey,
       CASE WHEN s_suppkey % 13 = 2 THEN NULL ELSE s_acctbal END
         AS s_acctbal
FROM base
UNION ALL
SELECT s_suppkey, s_name, s_nationkey, s_acctbal + 500000.0
FROM base WHERE s_suppkey % 19 = 4
"""

_SALT_REGION = """
SELECT r_regionkey,
       CASE WHEN r_regionkey % 5 = 2 THEN NULL ELSE r_name END AS r_name
FROM base
UNION ALL
-- duplicate r_regionkey with a CONFLICTING name: every
-- nation->region join fans out, and any query treating region as a
-- keyed dim must canonicalize (both engines read the same rows)
SELECT r_regionkey, 'DUPLICATE-REGION' AS r_name
FROM base WHERE r_regionkey % 5 = 1
UNION ALL
-- a NULL-key dim row: unreachable by any equi-join, must not crash
-- scans or leak into joined output
SELECT NULL AS r_regionkey, 'NULLKEY-REGION' AS r_name
"""

_SALT_NATION = """
SELECT n_nationkey,
       CASE WHEN n_nationkey % 7 = 3 THEN NULL ELSE n_name END AS n_name,
       CASE WHEN n_nationkey % 11 = 4 THEN NULL ELSE n_regionkey END
         AS n_regionkey
FROM base
UNION ALL
-- duplicate n_nationkey with a conflicting name AND a different
-- region: fans out through EVERY customer/supplier->nation dim join
SELECT n_nationkey, 'DUPLICATE-NATION' AS n_name,
       (n_regionkey + 1) % 5 AS n_regionkey
FROM base WHERE n_nationkey % 13 = 6
UNION ALL
-- orphan nation pointing at a region that doesn't exist (left-join
-- NULL class through the snowflake)
SELECT 98 AS n_nationkey, 'ORPHANIA' AS n_name, 99 AS n_regionkey
UNION ALL
SELECT NULL AS n_nationkey, 'NULLKEY-NATION' AS n_name, 0 AS n_regionkey
"""

_SALTS = {
    "orders": _SALT_ORDERS,
    "customer": _SALT_CUSTOMER,
    "lineitem": _SALT_LINEITEM,
    "part": _SALT_PART,
    "supplier": _SALT_SUPPLIER,
    "region": _SALT_REGION,
    "nation": _SALT_NATION,
}


def build_hostile_retail(sf_dir: str, out_dir: str,
                         empty_orders: bool = False,
                         empty_dims: bool = False) -> str:
    """Materialize the salted fixture under out_dir; other tables are
    symlinked. Returns out_dir. ``empty_orders`` replaces orders with a
    zero-row table (empty fact partition); ``empty_dims`` empties
    region AND nation instead (the empty-dim class: every inner dim
    join annihilates, every left join goes all-NULL — a 100 TB
    cluster sees this when a dim load fails or a filter matches
    nothing). Both variants keep the other tables unsalted so the
    divergence under test is isolated to the emptiness."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    plain_variant = empty_orders or empty_dims
    emptied = ({"orders"} if empty_orders else set()) | (
        {"region", "nation"} if empty_dims else set())
    for name in os.listdir(sf_dir):
        if (name.endswith(".parquet")
                and name.removesuffix(".parquet") not in set(_SALTS)):
            dst = os.path.join(out_dir, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(sf_dir, name), dst)
    for table, salt in _SALTS.items():
        src = f"{sf_dir}/{table}.parquet"
        if table in emptied:
            sql = f"SELECT * FROM '{src}' WHERE FALSE"
        elif plain_variant:
            sql = f"SELECT * FROM '{src}'"
        else:
            sql = salt.replace("FROM base", f"FROM '{src}'")
        duckdb.sql(f"COPY ({sql}) TO '{out_dir}/{table}.parquet' "
                   f"(FORMAT PARQUET)")
    return out_dir
