#!/usr/bin/env python3
"""Seeded self-test for check_oracle.py's vacuity guard (r14 verdict #3).

Builds a throwaway sfdir/outdir with four gates:
  ok         -- 2 rows, values match             -> must PASS
  vac_empty  -- 0 rows both sides (the s43/q5 class) -> must FAIL VACUOUS
  vac_null   -- 1 row, all-NULL numeric column (the q6 class) -> must FAIL
  s43_hidden_partition -- 0 rows both sides but allowlisted -> must PASS

Run: python3 tools/test_check_oracle.py   (exits 0 iff the guard behaves)
"""
import json, os, subprocess, sys, tempfile
import duckdb

here = os.path.dirname(os.path.abspath(__file__))
tmp = tempfile.mkdtemp(prefix="check_oracle_test_")
sfdir = os.path.join(tmp, "sf")
outdir = os.path.join(tmp, "out")
os.makedirs(sfdir)
os.makedirs(outdir)

con = duckdb.connect()
# one dummy source table so the view-registration loop has something to do
con.execute(f"COPY (SELECT 1 AS x) TO '{sfdir}/dummy.parquet' (FORMAT PARQUET)")

def dump(name, sql):
    os.makedirs(f"{outdir}/{name}", exist_ok=True)
    con.execute(f"COPY ({sql}) TO '{outdir}/{name}/part-0.parquet' (FORMAT PARQUET)")

cases = {
    "ok": "SELECT * FROM (VALUES (1, 10), (2, 20)) t(k, v)",
    "vac_empty": "SELECT 1 AS k, 2 AS v WHERE 1 = 0",
    "vac_null": "SELECT 1 AS k, CAST(NULL AS BIGINT) AS v",
    "s43_hidden_partition": "SELECT 1 AS k WHERE 1 = 0",
}
for name, sql in cases.items():
    dump(name, sql)
with open(f"{outdir}/oracle_sql.json", "w") as f:
    json.dump(cases, f)

r = subprocess.run([sys.executable, os.path.join(here, "check_oracle.py"),
                    sfdir, outdir], capture_output=True, text=True)
out = r.stdout
failures = []
if r.returncode == 0:
    failures.append("exit code 0 -- the guard did not fire at all")
if "PASS ok" not in out:
    failures.append("healthy gate 'ok' did not PASS")
if "FAIL vac_empty: VACUOUS" not in out:
    failures.append("0-row gate 'vac_empty' was not caught")
if "FAIL vac_null: VACUOUS" not in out:
    failures.append("all-NULL-column gate 'vac_null' was not caught")
if "PASS s43_hidden_partition (allowlisted-vacuous)" not in out:
    failures.append("allowlisted tombstone did not pass with its tag")

if failures:
    print(out)
    for f in failures:
        print(f"SELFTEST FAIL: {f}")
    sys.exit(1)
print("SELFTEST PASS: vacuity guard catches 0-row and all-NULL gates, "
      "honors the allowlist, and leaves healthy gates green")
