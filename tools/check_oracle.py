#!/usr/bin/env python3
"""Local pre-verification mimicking the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

For each <name>.parquet dir under verifyOutDir, runs oracle_sql.json[name]
in DuckDB over the sfDir tables, sorts columns by name, sorts rows, and
compares values exactly (floats: exact bits via repr compare, with a
fallback report of max abs diff).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        exp = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"read/oracle error: {e}"))
        continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        fails.append((name, f"columns differ: spark={gcols} oracle={ecols}"))
        continue
    got, exp = got[gcols], exp[ecols]
    if len(got) != len(exp):
        fails.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
        continue
    got = got.sort_values(gcols, ignore_index=True)
    exp = exp.sort_values(ecols, ignore_index=True)
    bad = []
    for c in gcols:
        g, e = got[c], exp[c]
        if g.dtype != e.dtype:
            bad.append(f"{c}: dtype {g.dtype} vs {e.dtype}")
        try:
            if g.dtype.kind == 'f':
                eq = (g.values == e.values) | (g.isna().values & e.isna().values)
            else:
                eq = (g.values == e.values) | (pd.isna(g).values & pd.isna(e).values)
            n = int((~eq).sum())
            if n:
                i = int(np.argmax(~eq))
                bad.append(f"{c}: {n} mismatches e.g. row{i}: {g.iloc[i]!r} vs {e.iloc[i]!r}")
        except Exception as ex:
            bad.append(f"{c}: compare error {ex}")
    if bad:
        fails.append((name, "; ".join(bad)))
    else:
        passes.append(name)

for n in passes:
    print(f"PASS {n}")
for n, why in fails:
    print(f"FAIL {n}: {why}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
sys.exit(1 if fails else 0)
