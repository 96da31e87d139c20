#!/usr/bin/env python3
"""Derive a 10x scale-up of the driver's sf0.1 corpus for BENCH evidence.

The 100 TB story is argued from plan shapes at sf0.1; this gives it one
measured scale step (VERDICT r5 #8): every fact table replicates 10x
with key-family-consistent strides, so join fan-outs and group counts
scale the way a real SF step scales, and the dimension tables
(region/nation) stay fixed like TPC-H's do. Bench-only derived data —
correctness still gates on the driver's own sf dirs.

Key families share one stride so foreign keys stay consistent:
customer<-orders (custkey), orders<-lineitem (orderkey), part/supplier
<-lineitem, and documents<->embeddings (doc_id = vec_id in the corpus).

Derived corpora live under bench_corpora/ (NOT target/): a build-dir
wipe must not destroy the corpus the cross-round bench ratios compare
against (two rounds lost the sf10 chain to exactly that).

Usage: make_sf1.py [in_dir out_dir]   (defaults: /root/testdata/sf0.1
       -> bench_corpora/testdata_sf1)
"""
import os
import sys

import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "bench_corpora/testdata_sf1"
reps = int(os.environ.get("GRAFT_SCALE_REPS", "10"))
os.makedirs(out, exist_ok=True)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet'")


def stride(sql):
    return con.sql(sql).fetchone()[0] + 1


cust = stride("SELECT max(c_custkey) FROM customer")
supp = stride("SELECT max(s_suppkey) FROM supplier")
part = stride("SELECT max(p_partkey) FROM part")
ordk = stride("SELECT max(o_orderkey) FROM orders")
evid = stride("SELECT max(event_id) FROM events")
user = stride("SELECT max(user_id) FROM events")
docv = stride("SELECT greatest(max(doc_id), "
              "(SELECT max(vec_id) FROM embeddings)) FROM documents")

jobs = {
    "region": "SELECT * FROM region",
    "nation": "SELECT * FROM nation",
    "customer": f"""SELECT c_custkey + i*{cust} AS c_custkey, c_name,
        c_nationkey, c_acctbal, c_mktsegment
        FROM customer CROSS JOIN range({reps}) r(i)""",
    "supplier": f"""SELECT s_suppkey + i*{supp} AS s_suppkey, s_name,
        s_nationkey, s_acctbal
        FROM supplier CROSS JOIN range({reps}) r(i)""",
    "part": f"""SELECT p_partkey + i*{part} AS p_partkey, p_name, p_brand,
        p_type, p_size, p_retailprice
        FROM part CROSS JOIN range({reps}) r(i)""",
    "orders": f"""SELECT o_orderkey + i*{ordk} AS o_orderkey,
        o_custkey + i*{cust} AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority
        FROM orders CROSS JOIN range({reps}) r(i)""",
    "lineitem": f"""SELECT l_orderkey + i*{ordk} AS l_orderkey,
        l_partkey + i*{part} AS l_partkey,
        l_suppkey + i*{supp} AS l_suppkey, l_linenumber, l_quantity,
        l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        l_shipdate
        FROM lineitem CROSS JOIN range({reps}) r(i)""",
    "events": f"""SELECT event_id + i*{evid} AS event_id, ts,
        user_id + i*{user} AS user_id, event_type, value, props
        FROM events CROSS JOIN range({reps}) r(i)""",
    "documents": f"""SELECT doc_id + i*{docv} AS doc_id, text, lang,
        source, n_chars
        FROM documents CROSS JOIN range({reps}) r(i)""",
    "embeddings": f"""SELECT vec_id + i*{docv} AS vec_id, embedding,
        label FROM embeddings CROSS JOIN range({reps}) r(i)""",
}

for t, sql in jobs.items():
    con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT parquet)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"[make_sf1] {t}: {n} rows")
print(f"[make_sf1] wrote {out}")
