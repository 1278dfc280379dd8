#!/usr/bin/env python3
"""Upsample the TPC-H star for scale benching (driver-side tooling,
like upsample_docs.py -- NOT part of the engine).

Replicates lineitem/orders/customer/supplier/part R times with
consistent key offsets so every replica is an exact, disjoint copy of
the original join graph:

  - orderkey   += i * 10_000_000   (lineitem + orders)
  - custkey    += i *  1_000_000   (orders + customer)
  - suppkey    += i *    100_000   (lineitem + supplier)
  - partkey    += i *    100_000   (lineitem + part)

nation and region are copied verbatim (c_nationkey/s_nationkey are
untouched, so dim joins land on the same 25/5 rows). Because each
replica's fact->dim edges are congruent to replica 0's, every
per-group aggregate over the upsampled star equals EXACTLY R times
the sf0.1 value -- which makes the scale run self-checking: a
cross-engine verify at 10x passes iff both engines agree at 6M
lineitems, and revenue_e8(10x) == 10 * revenue_e8(1x) by
construction.

Offsets exceed the sf0.1 key ranges (orderkey < 600_001,
custkey <= 15_000, suppkey <= 1_000, partkey <= 20_000) by >16x, so
replica keyspaces stay disjoint up to R = 100.

Usage: upsample_tpch.py SRC_DIR OUT_DIR R
"""
import os
import shutil
import sys

import duckdb

src, out, r = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)

reps = ", ".join(f"({i})" for i in range(r))

SHIFTS = {
    "lineitem": {"l_orderkey": 10_000_000, "l_suppkey": 100_000,
                 "l_partkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 100_000},
}

for table, shifts in SHIFTS.items():
    cols = [c[0] for c in duckdb.sql(
        f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()]
    sel = ", ".join(
        f"t.{c} + s.i * {shifts[c]} AS {c}" if c in shifts else f"t.{c}"
        for c in cols)
    duckdb.sql(f"""
        COPY (SELECT {sel}
              FROM '{src}/{table}.parquet' t, (VALUES {reps}) s(i))
        TO '{out}/{table}.parquet' (FORMAT PARQUET)""")
    n = duckdb.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

for table in ("nation", "region"):
    shutil.copy(f"{src}/{table}.parquet", f"{out}/{table}.parquet")
    print(f"{table}: copied verbatim")
