#!/usr/bin/env python3
"""Generate a 10x scale-up of the sf0.1 fixture for the sf1.0 soak.

Dev/driver-side tooling only (duckdb, like tools/check.py) — the
library itself never touches this script. The scale-up preserves each
table's statistical character instead of naively duplicating rows:

- Fact tables (customer/orders/lineitem/part/supplier/events) become 10
  disjoint key-shifted copies (stride 1e8 > any source key), so every
  PK stays unique, every FK lands in its own copy, and join
  selectivities/fan-outs match the source exactly (10 independent
  shards of the same distribution — what 10x more business would look
  like).
- Dimension grids (region/nation) stay fixed: their size is schema
  semantics, not data volume.
- documents: copy i reorders each text's words by a per-copy
  hash-keyed permutation (deterministic: DuckDB hash of copy*1000003 +
  position). Unigram statistics (Zipf, language ID, token counts) are
  IDENTICAL per copy while 3-word shingle sets decorrelate almost
  completely, so near-dup pair rates stay at the source's per-capita
  rate instead of exploding into 10-way near-duplicate megaclusters.
  (A circular ROTATION does not work here — it preserves every
  interior shingle, so copies become high-Jaccard twins and pair
  operators see ~45x more candidate pairs, which the round-12 soak
  measured as false superlinearity in q137/q139/q191/q292.)
- embeddings: copy i circularly shifts vector components by i (norm
  preserved exactly, direction decorrelated) — ANN neighbor structure
  stays realistic instead of every vector gaining 9 exact twins. Copy
  0 keeps the original vectors, so probe anchors (vec_id 0/1) are
  unchanged.

A 4th arg `suffix` produces the DISJOINT-VOCAB variant instead
(testdata_sf1v in round 12): copies 1..N additionally tag every token
with `~i`, so each copy's shingle vocabulary is disjoint from every
other's — the text analog of the key-shifted fact shards. Use it when
the source's token vocabulary is too small for shingle spaces to grow
with the corpus (this fixture's ~31-token vocab saturates the 3-shingle
space at sf0.1, so ANY multiset-preserving reorder still grows
candidate-pair mass ~99x for 10x docs; the suffixed variant scales it
exactly 10x — the honest linear-workload read for pair operators, the
ratio_*_v columns in scale_report.py).

Usage: python3 tools/scaleup.py [src_dir] [dst_dir] [copies] [suffix]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SUFFIX = len(sys.argv) > 4 and sys.argv[4] == "suffix"
STRIDE = 100_000_000

import os

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads={os.cpu_count()}")


def emit(table, select_i):
    parts = " UNION ALL ".join(select_i(i) for i in range(COPIES))
    con.execute(
        f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def shifted(table, key_cols):
    def sel(i):
        cols = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'")
        names = [c[0] for c in cols.fetchall()]
        exprs = [
            f"{c} + {i * STRIDE} AS {c}" if c in key_cols else c
            for c in names
        ]
        return f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'"
    return sel


for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied as-is")

emit("customer", shifted("customer", {"c_custkey"}))
emit("supplier", shifted("supplier", {"s_suppkey"}))
emit("part", shifted("part", {"p_partkey"}))
emit("orders", shifted("orders", {"o_orderkey", "o_custkey"}))
emit("lineitem",
     shifted("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"}))
emit("events", shifted("events", {"event_id", "user_id"}))

def doc_select(i):
    if i == 0:
        return (f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{SRC}/documents.parquet'")
    shuffled = f"""list_select(w, list_grade_up(
               list_transform(range(1, len(w) + 1),
                              j -> hash({i} * 1000003 + j))))"""
    if SUFFIX:
        shuffled = f"list_transform({shuffled}, t -> t || '~{i}')"
    return f"""
  SELECT doc_id + {i * STRIDE} AS doc_id,
         list_aggregate({shuffled}, 'string_agg', ' ') AS text,
         lang, source, n_chars
  FROM (SELECT *, string_split(text, ' ') AS w
        FROM '{SRC}/documents.parquet')"""


emit("documents", doc_select)

emit("embeddings", lambda i: f"""
  SELECT vec_id + {i * STRIDE} AS vec_id,
         CASE WHEN {i} = 0 THEN embedding ELSE
           list_concat(embedding[{i} + 1:], embedding[:{i}])
         END AS embedding,
         label
  FROM '{SRC}/embeddings.parquet'""")
