#!/usr/bin/env python3
"""Build the deliberately-skewed sf0.1 variant at /tmp/sf0.1skew
(BASELINE.md "round-8 skew rehearsal"): same tables as
/root/testdata/sf0.1 except documents.parquet gets two planted skews:

 - MEGA-DUPLICATE CLASS: docs with doc_id%100==7 (1%, ~500 docs at
   sf0.1) all share ONE identical text -> a 500-member exact/near-dup
   class (C(500,2)=124,750 legitimate output pairs for q135, hot
   fingerprints in every shingle join).
 - MEGA-PARAGRAPH: half the docs (doc_id%2==0) carry the same leading
   10-token boilerplate block -> one pmd5 class with ~25k occurrences
   for q152's keep-first window (the classic repeated-licence skew);
   only ~10 shared tokens per ~100-token doc, so pairwise Jaccard
   stays below q135's threshold and the pair count does NOT blow up.
 - MEGA-SOURCE: 90% of docs collapse onto source='mega' (hot group
   key for per-source aggregates).

Driver-side tooling (duckdb), NOT part of the library.
Usage: python3 tools/make_skew.py
"""
import duckdb, os, shutil

SRC = '/root/testdata/sf0.1'
DST = '/tmp/sf0.1skew'
os.makedirs(DST, exist_ok=True)

con = duckdb.connect()
boiler = ' '.join(f'boiler{i}' for i in range(10))
con.execute(f"""
COPY (
  SELECT doc_id,
         CASE WHEN doc_id % 100 = 7
              THEN 'megadup class text all five hundred copies identical'
              WHEN doc_id % 2 = 0
              THEN '{boiler} ' || text
              ELSE text END AS text,
         lang,
         CASE WHEN doc_id % 10 < 9 THEN 'mega' ELSE source END AS source,
         CAST(length(CASE WHEN doc_id % 100 = 7
              THEN 'megadup class text all five hundred copies identical'
              WHEN doc_id % 2 = 0
              THEN '{boiler} ' || text
              ELSE text END) AS BIGINT) AS n_chars
  FROM '{SRC}/documents.parquet'
) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")

for t in ['region', 'nation', 'customer', 'supplier', 'part',
          'orders', 'lineitem', 'events', 'embeddings']:
    shutil.copyfile(f'{SRC}/{t}.parquet', f'{DST}/{t}.parquet')

n, dup, para = con.execute(f"""
  SELECT count(*),
         sum(CASE WHEN doc_id % 100 = 7 THEN 1 ELSE 0 END),
         sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
  FROM '{DST}/documents.parquet'""").fetchone()
print(f"docs={n} mega_dup_class={dup} mega_paragraph={para}")
