#!/usr/bin/env python3
"""Heaps-law documents variant of a fixture: same tables, same doc
count and per-doc word counts, but token text drawn Zipf(1) from a
vocabulary sized by Heaps' law V = K * sqrt(total_tokens) — the
realistic lexical workload the source fixture lacks.

Why: the driver fixture's documents carry a ~31-token unigram
vocabulary, which SATURATES the 3-word-shingle space at sf0.1 (every
shingle is a hot posting; candidate-pair mass grows ~quadratically in
corpus copies — measured and documented in BASELINE.md). Real corpora
grow vocabulary with corpus size (Heaps' law, beta ~0.5), keeping
per-term document frequency per-capita roughly constant. This tool
regenerates ONLY the documents text under that regime so the
postings-pair operators (q137/q139/q191/q292 family) can be priced
against a realistic term distribution at the same scale; all other
tables are copied as-is. Deterministic: token ranks come from
DuckDB's 64-bit hash of (doc_id, position), Zipf via inverse-CDF
(rank = ceil(V^u), u uniform from the hash), so reruns are identical.

Dev/driver-side tooling only (duckdb), like tools/scaleup.py.

Usage: python3 tools/heapsgen.py [src_dir] [dst_dir] [K]
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_heaps"
K = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads={os.cpu_count()}")

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"):
    src = f"{SRC}/{t}.parquet"
    if os.path.exists(src):
        shutil.copyfile(src, f"{DST}/{t}.parquet")
        print(f"{t}: copied as-is")

total_tokens = con.sql(
    f"SELECT sum(len(string_split(text, ' ')))"
    f" FROM '{SRC}/documents.parquet'").fetchone()[0]
vocab = max(2, int(K * total_tokens ** 0.5))
print(f"total_tokens={total_tokens} -> Heaps vocabulary V={vocab}")

# per position j: u = hash(doc_id, j) scaled to [0,1); Zipf(s=1) rank by
# inverse CDF (harmonic CDF ~ ln r / ln V) => rank = ceil(V^u) in [1, V]
con.execute(f"""
COPY (
  SELECT doc_id, text, lang, source,
         length(text) AS n_chars -- recomputed: consistent with new text
  FROM (
    SELECT doc_id,
           list_aggregate(
             list_transform(range(1, n_words + 1),
               j -> 'w' || CAST(least({vocab}, greatest(1, ceil(
                      pow({vocab}, (hash(doc_id * 1000003 + j) % 1000000007)
                                    / 1000000007.0)))) AS BIGINT)),
             'string_agg', ' ') AS text,
           lang, source
    FROM (SELECT *, len(string_split(text, ' ')) AS n_words
          FROM '{SRC}/documents.parquet'))
  ORDER BY doc_id
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
n, v_obs = con.sql(f"""
  SELECT count(*),
         (SELECT count(DISTINCT tok) FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM '{DST}/documents.parquet'))
  FROM '{DST}/documents.parquet'""").fetchone()
print(f"documents: {n} rows, observed vocabulary {v_obs} (target {vocab})")
