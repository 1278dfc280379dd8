#!/usr/bin/env python3
"""Upsample the relational fact tables for TPC-H scale benching
(driver-side tooling, like check_oracle.py -- NOT part of the engine).

Replicates orders + lineitem R times with o_orderkey/l_orderkey offset
by i * 10_000_000, so every replica keeps the original per-order line
structure and join selectivities while order keys stay disjoint.
Dimension tables (customer, supplier, part, nation, region, events,
documents, embeddings) are symlinked verbatim: facts grow Rx while
dims stay fixed -- the adversarial direction for the engine's
broadcast-the-dims claim (a dim that stops being broadcastable would
show super-linear query growth, which is exactly what the sweep
tests). Per-customer order density grows Rx, which stresses the
customer-side aggregates (Q13/Q18/Q22) harder than real TPC-H scaling
would -- acceptable for an upper-bound sweep.

Usage: upsample_relational.py SRC_DIR OUT_DIR R
"""
import os
import sys

import duckdb

src, out, r = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)

for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
    duckdb.sql(f"""
    COPY (
      SELECT t.* REPLACE (t.{key} + i.i * 10000000 AS {key})
      FROM '{src}/{tbl}.parquet' t,
           (SELECT unnest(range({r})) AS i) i
      ORDER BY {key}
    ) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)
    """)

for tbl in ("customer", "supplier", "part", "nation", "region",
            "events", "documents", "embeddings"):
    dst = f"{out}/{tbl}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{tbl}.parquet", dst)

n_o, n_l = (duckdb.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
            for t in ("orders", "lineitem"))
print(f"{out}: {n_o} orders, {n_l} lineitem rows")
