#!/usr/bin/env python3
"""Upsample documents.parquet for scale benching (driver-side tooling,
like check_oracle.py -- NOT part of the engine).

Replicates the sf0.1 documents table R times. Replica 0 is verbatim;
replica i>0 suffixes every token with `_i`, which (a) keeps each
replica's internal duplicate/near-dup structure byte-equivalent to the
original corpus and (b) makes cross-replica token sets disjoint, so no
new near-dup pairs appear across replicas. Duplicate DENSITY is
therefore invariant under upsampling and the dedup pipelines' work
should scale ~linearly in R -- which is exactly the claim under test.

doc_id offset is i * 10_000_000 (even), preserving the odd/even
batch-vs-corpus split dedup_incremental keys on.

Usage: upsample_docs.py SRC_DIR OUT_DIR R
"""
import sys

import duckdb

src, out, r = sys.argv[1], sys.argv[2], int(sys.argv[3])

import os
os.makedirs(out, exist_ok=True)
duckdb.sql(f"""
COPY (
  SELECT d.doc_id + i.i * 10000000 AS doc_id,
         CASE WHEN i.i = 0 THEN d.text
              ELSE regexp_replace(d.text, '(\\S+)', '\\1_' || i.i, 'g')
         END AS text,
         d.lang, d.source,
         CASE WHEN i.i = 0 THEN d.n_chars
              ELSE length(regexp_replace(d.text, '(\\S+)', '\\1_' || i.i, 'g'))
         END AS n_chars
  FROM '{src}/documents.parquet' d,
       (SELECT unnest(range({r})) AS i) i
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n, chars = duckdb.sql(
    f"SELECT count(*), sum(n_chars) FROM '{out}/documents.parquet'").fetchone()
print(f"{out}: {n} docs, {chars} chars")
