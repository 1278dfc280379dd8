#!/usr/bin/env python3
"""Upsample documents.parquet for scale benching (driver-side tooling,
like check_oracle.py -- NOT part of the engine).

Replicates the sf0.1 documents table R times. Replica 0 is verbatim;
replica i>0 appends a letters-only suffix `q<base26(i)>` to every
token, which (a) keeps each replica's internal duplicate/near-dup
structure byte-equivalent to the original corpus and (b) makes
cross-replica token sets disjoint, so no new near-dup pairs appear
across replicas. Duplicate DENSITY is therefore invariant under
upsampling and the dedup pipelines' work should scale ~linearly in
R -- which is exactly the claim under test.

Two fixture artifacts this version closes (r11 verdict item 5):

- The old `_i` suffix was split off by TEXT NORMALIZATION (underscore
  is punctuation), collapsing every replica's normalized tokens back
  onto the base corpus' -- replicas became mutual near-dups and
  dedup_minhash_norm's pair volume grew ~R^2 by construction. The
  letters-only suffix survives NFKC + casefold + punctuation
  stripping, so normalized token sets stay disjoint too.
- The old doc_id offset `i * 10_000_000` is congruent to -30*i mod
  PxDocMod (1000003), the modulus the synthesized multimodal assets
  (pixels, WAV samples, phash grids) key on -- replica i's asset
  seeds collided with replica 0's shifted by 30, creating ~R^2
  identical-payload image pairs. The offset is now
  `i * 10_033_364` (= 10*1000003 + 33334): still even (preserving
  the odd/even batch-vs-corpus split dedup_incremental keys on),
  still >= 10M (id spaces disjoint), and ≡ 33334 mod 1000003, so
  replica seed ranges sit >= 33334 apart -- disjoint for corpora up
  to 33k docs and 30 replicas. Payload duplicate density is now
  invariant under upsampling, like the text's.

Usage: upsample_docs.py SRC_DIR OUT_DIR R
"""
import os
import sys

import duckdb

src, out, r = sys.argv[1], sys.argv[2], int(sys.argv[3])


def base26(i: int) -> str:
    s = ""
    while i > 0:
        i, rem = divmod(i - 1, 26)
        s = chr(ord("a") + rem) + s
    return s


sfx_rows = ", ".join(
    f"({i}, '{'' if i == 0 else 'q' + base26(i)}')" for i in range(r))

os.makedirs(out, exist_ok=True)
duckdb.sql(f"""
COPY (
  SELECT d.doc_id + s.i * 10033364 AS doc_id,
         CASE WHEN s.i = 0 THEN d.text
              ELSE regexp_replace(d.text, '(\\S+)', '\\1' || s.sfx, 'g')
         END AS text,
         d.lang, d.source,
         CASE WHEN s.i = 0 THEN d.n_chars
              ELSE length(regexp_replace(d.text, '(\\S+)', '\\1' || s.sfx, 'g'))
         END AS n_chars
  FROM '{src}/documents.parquet' d,
       (VALUES {sfx_rows}) s(i, sfx)
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n, chars = duckdb.sql(
    f"SELECT count(*), sum(n_chars) FROM '{out}/documents.parquet'").fetchone()
print(f"{out}: {n} docs, {chars} chars")
