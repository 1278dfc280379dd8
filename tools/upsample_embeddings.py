#!/usr/bin/env python3
"""Upsample embeddings.parquet for scale benching (driver-side tooling).

Replicates the embeddings table R times. Replica 0 is verbatim; replica
i > 0 ROTATES each 64-dim vector by i positions -- rotation preserves
norms and within-replica geometry (each replica's cluster structure and
near-dup pairs are congruent to the original) while rotated copies of
the same vector are near-orthogonal in expectation, so no new near-dup
pairs appear across replicas and pair/bucket density stays invariant
under upsampling. vec_id offset 1_000_000 per replica keeps the fixed
`vec_id < NumQueries` query sets on replica 0 -- fixed queries over a
growing corpus, the realistic ANN scaling shape.

Usage: upsample_embeddings.py SRC_DIR OUT_DIR R  (R <= 64)
"""
import os
import sys

import duckdb

src, out, r = sys.argv[1], sys.argv[2], int(sys.argv[3])
assert 1 <= r <= 64, "rotation scheme supports R <= 64"

os.makedirs(out, exist_ok=True)
duckdb.sql(f"""
COPY (
  SELECT e.vec_id + i.i * 1000000 AS vec_id,
         CASE WHEN i.i = 0 THEN e.embedding
              ELSE e.embedding[(i.i + 1):] || e.embedding[:i.i]
         END AS embedding,
         e.label
  FROM '{src}/embeddings.parquet' e,
       (SELECT unnest(range({r})) AS i) i
  ORDER BY vec_id
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
""")
n, dim = duckdb.sql(f"SELECT count(*), min(len(embedding)) "
                    f"FROM '{out}/embeddings.parquet'").fetchone()
print(f"{out}: {n} vectors, dim {dim}")
