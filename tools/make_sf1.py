#!/usr/bin/env python3
"""Build the bench-only sf1 replica at /tmp/sf1 (BASELINE.md "sf1 scale
rehearsal"): a 10x replication of /root/testdata/sf0.1 with per-copy key
offsets (i * 10^7, consistent across tables) and content perturbation —
copy i suffixes every document token with _i (disjoint token/shingle
namespaces across copies; copy 0 keeps the original text) and rotates
embeddings by i positions (norms and within-copy cosines preserved,
cross-copy cosines decorrelated). Driver-side tooling (duckdb), NOT part
of the library. Usage: python3 tools/make_sf1.py  (~1 min, ~240 MB).
"""
import duckdb, os, time
con = duckdb.connect()
t0=time.time()
SRC='/root/testdata/sf0.1'
DST='/tmp/sf1'
os.makedirs(DST, exist_ok=True)
N=10

def gen(table, sql_tpl, copies=True):
    parts=[]
    for i in range(N):
        parts.append(sql_tpl.format(i=i))
    q = " UNION ALL ".join(parts) if copies else sql_tpl
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n=con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(table, n, f"{time.time()-t0:.1f}s")

# offsets: use 10M stride, far above sf0.1 max ids
S=10_000_000
con.execute(f"CREATE VIEW doc AS SELECT * FROM '{SRC}/documents.parquet'")
# per-copy disjoint token namespace: suffix every token with _i (i>0);
# copy 0 keeps the original text so within-copy structure is intact
gen('documents', f"""
  SELECT doc_id + {{i}}*{S} AS doc_id,
         CASE WHEN {{i}}=0 THEN text
              ELSE replace(text, ' ', '_{{i}} ') || '_{{i}}' END AS text,
         lang, source,
         CAST(length(CASE WHEN {{i}}=0 THEN text
              ELSE replace(text, ' ', '_{{i}} ') || '_{{i}}' END) AS BIGINT) AS n_chars
  FROM doc""")

con.execute(f"CREATE VIEW emb AS SELECT * FROM '{SRC}/embeddings.parquet'")
# rotate the vector by i positions: norms and within-copy cosines
# preserved, cross-copy cosines decorrelate
gen('embeddings', f"""
  SELECT vec_id + {{i}}*{S} AS vec_id,
         CASE WHEN {{i}}=0 THEN embedding
              ELSE array_slice(embedding, {{i}}+1, len(embedding)) ||
                   array_slice(embedding, 1, {{i}}) END AS embedding,
         label
  FROM emb""")

gen('events', f"""
  SELECT event_id + {{i}}*{S} AS event_id, ts,
         user_id + {{i}}*{S} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet'""")
gen('orders', f"""
  SELECT o_orderkey + {{i}}*{S} AS o_orderkey,
         o_custkey + {{i}}*{S} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")
gen('lineitem', f"""
  SELECT l_orderkey + {{i}}*{S} AS l_orderkey,
         l_partkey + {{i}}*{S} AS l_partkey,
         l_suppkey + {{i}}*{S} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'""")
gen('customer', f"""
  SELECT c_custkey + {{i}}*{S} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'""")
gen('supplier', f"""
  SELECT s_suppkey + {{i}}*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")
gen('part', f"""
  SELECT p_partkey + {{i}}*{S} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM '{SRC}/part.parquet'""")
for t in ('nation','region'):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
print("done", f"{time.time()-t0:.1f}s")
