#!/usr/bin/env python3
"""Build a ~10x replica of sf0.1 at /tmp/sf1 for scale exercises.

Facts (orders/lineitem/documents) replicate 10x with key offsets;
dimensions keep their size (facts outgrow dims in real warehouses).
events.parquet is byte-copied to preserve its TIMESTAMP(NANOS) type.
The replication makes every document a 10-duplicate cluster — a far
HARDER dedup instance than sf0.1 itself (every minhash band collides;
~245k verify pairs), so a green d06 here exercises the candidate
generation + CC paths at real density.

Usage: python3 tools/make_sf1.py [src_sf_dir] [out_dir]
Then:  SPARK_GRAFT_ONLY=q01,q04,d06 sbt "runMain graft.Verify /tmp/sf1 /tmp/vout_sf1"
       python3 tools/check.py /tmp/sf1 /tmp/vout_sf1
"""
import os
import shutil
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

for t in ["region", "nation", "customer", "supplier", "part", "embeddings"]:
    con.sql(
        f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
        f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
    )
shutil.copyfile(f"{src}/events.parquet", f"{out}/events.parquet")

k_ord = con.sql(
    f"SELECT max(o_orderkey)+1 FROM read_parquet('{src}/orders.parquet')"
).fetchone()[0]
k_doc = con.sql(
    f"SELECT max(doc_id)+1 FROM read_parquet('{src}/documents.parquet')"
).fetchone()[0]
reps = "SELECT unnest(range(10)) AS rep"
con.sql(f"""COPY (
  SELECT o_orderkey + rep*{k_ord} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM read_parquet('{src}/orders.parquet'), ({reps})
) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT l_orderkey + rep*{k_ord} AS l_orderkey, l_partkey, l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{src}/lineitem.parquet'), ({reps})
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
con.sql(f"""COPY (
  SELECT doc_id + rep*{k_doc} AS doc_id, text, lang, source, n_chars
  FROM read_parquet('{src}/documents.parquet'), ({reps})
) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
for t in ["orders", "lineitem", "documents"]:
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(t, n)
