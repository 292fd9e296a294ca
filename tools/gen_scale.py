#!/usr/bin/env python3
"""Scale the driver's sf0.1 testdata by K (default 10) into a local sfN dir.

Fact tables (events, documents, embeddings, lineitem, orders) are unioned
K times with per-replica key offsets so uniqueness properties survive:
  - events.event_id, documents.doc_id, embeddings.vec_id, l_orderkey /
    o_orderkey get +r*OFF so ids stay unique and order<->lineitem joins
    stay consistent within a replica.
  - documents.text for r>0 gets a per-replica suffix token so near-dup
    structure (minhash bands, shingles) scales ~linearly instead of
    producing K-fold identical-text megabuckets; replica 0 is verbatim.
  - embeddings for r>0 are jittered by r*1e-4 per component (deterministic)
    so identical-vector fast paths don't erase the K-fold work.
Dim tables (region, nation, customer, supplier, part) are copied verbatim —
dims grow slower than facts at real scale.

Usage: python3 tools/gen_scale.py [src] [dst] [K]
"""
import sys, os, duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmpdata/sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 1_000_000_000
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

def write(name, sql):
    con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n} rows")

for t in ["region", "nation", "customer", "supplier", "part"]:
    write(t, f"SELECT * FROM read_parquet('{src}/{t}.parquet')")

reps = f"(SELECT unnest(range({K})) AS r)"
write("events", f"""
  SELECT event_id + r*{OFF} AS event_id, ts, user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), {reps}""")
write("documents", f"""
  SELECT doc_id + r*{OFF} AS doc_id,
         CASE WHEN r = 0 THEN text ELSE text || ' rep' || r || 'x' || doc_id END AS text,
         lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), {reps}""")
write("embeddings", f"""
  SELECT vec_id + r*{OFF} AS vec_id,
         CASE WHEN r = 0 THEN embedding
              ELSE list_transform(embedding, x -> CAST(x + r*0.0001 AS FLOAT)) END AS embedding,
         label
  FROM read_parquet('{src}/embeddings.parquet'), {reps}""")
write("orders", f"""
  SELECT o_orderkey + r*{OFF} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), {reps}""")
write("lineitem", f"""
  SELECT l_orderkey + r*{OFF} AS l_orderkey, l_partkey, l_suppkey, l_linenumber,
         l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,
         l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet'), {reps}""")
print("done:", dst)
