#!/usr/bin/env python3
"""Upsample the events table for full-suite scale benching
(driver-side tooling, like upsample_relational.py -- NOT part of the
engine).

Replicates events R times with event_id offset by i * 1e9 and user_id
offset by i * 1e7: per-user event density stays FIXED (user NDV grows
Rx -- the natural scaling direction for per-user windows), while
per-event_type volume grows Rx (the adversarial direction for the
low-cardinality rank/histogram family, whose bounded twins exist for
exactly that). Timestamps and values replicate verbatim, so value
distributions -- percentile gates, z-scores, histogram bounds -- keep
their shape.

Usage: upsample_events.py SRC_DIR OUT_DIR R
"""
import sys

import duckdb

src, out, r = sys.argv[1], sys.argv[2], int(sys.argv[3])

duckdb.sql(f"""
COPY (
  SELECT t.* REPLACE (t.event_id + i.i * 1000000000 AS event_id,
                      t.user_id + i.i * 10000000 AS user_id)
  FROM '{src}/events.parquet' t,
       (SELECT unnest(range({r})) AS i) i
  ORDER BY event_id
) TO '{out}/events.parquet' (FORMAT PARQUET)
""")
print(f"events x{r} -> {out}/events.parquet")
