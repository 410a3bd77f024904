#!/usr/bin/env python3
"""Build the bench-only sf10 replica at /tmp/sf10 — the THIRD scale
decade for the near-linear-claim re-measurements (BASELINE.md
"round-12 third decade"): make_sf1.py's replication scheme at N=100
copies of /root/testdata/sf0.1, same per-copy key offsets (i * 10^7)
and content perturbation (disjoint token namespaces via the _i token
suffix; embeddings rotated by i%63+1 positions so every copy is a
distinct rotation). FOCUSED fixture: only documents + embeddings are
generated — the five re-measured queries (q181, q189, q192, q193,
q200) touch nothing else and Tables loads lazily. Driver-side tooling
(duckdb), NOT part of the library.
Usage: python3 tools/make_sf10.py  (~2 min, ~1.3 GB).
"""
import duckdb, os, time

con = duckdb.connect()
t0 = time.time()
SRC = '/root/testdata/sf0.1'
DST = '/tmp/sf10'
os.makedirs(DST, exist_ok=True)
N = 100
S = 10_000_000


def gen(table, sql_tpl):
    parts = [sql_tpl.format(i=i) for i in range(N)]
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(table, n, f"{time.time()-t0:.1f}s")


con.execute(f"CREATE VIEW doc AS SELECT * FROM '{SRC}/documents.parquet'")
gen('documents', f"""
  SELECT doc_id + {{i}}*{S} AS doc_id,
         CASE WHEN {{i}}=0 THEN text
              ELSE replace(text, ' ', '_{{i}} ') || '_{{i}}' END AS text,
         lang, source,
         CAST(length(CASE WHEN {{i}}=0 THEN text
              ELSE replace(text, ' ', '_{{i}} ') || '_{{i}}' END)
           AS BIGINT) AS n_chars
  FROM doc""")

con.execute(f"CREATE VIEW emb AS SELECT * FROM '{SRC}/embeddings.parquet'")
# rotation index i%63+1 for i>0: 64-dim vectors admit 63 distinct
# nontrivial rotations; wrapping keeps every copy a REAL rotation
# (norms and within-copy cosines preserved) instead of the i>=64
# copies silently degenerating
gen('embeddings', f"""
  SELECT vec_id + {{i}}*{S} AS vec_id,
         CASE WHEN {{i}}=0 THEN embedding
              ELSE array_slice(embedding, ({{i}}-1)%63+2, len(embedding)) ||
                   array_slice(embedding, 1, ({{i}}-1)%63+1) END AS embedding,
         label
  FROM emb""")

print("done", f"{time.time()-t0:.1f}s")
