#!/usr/bin/env python3
"""Synthesize a larger-SF stand-in from an existing testdata dir for
oracle/scale soaks (diagnostic tooling, driver-side stack like
selfcheck.py — NOT part of the shipped library).

Usage: scale_testdata.py <srcDir> <dstDir> <copies>

Shape: union of <copies> key-offset copies, referential integrity
preserved WITHIN each copy (every scaling key gets +copy*1e9, so
order->lineitem, customer->orders, part/supplier->lineitem joins all
stay consistent); region/nation stay fixed like TPC-H's constant
dimensions. Documents are disjoint-salted (every token prefixed with
a copy tag, n_chars recomputed) so cross-copy near-dup pairs don't
explode the dedup pair space beyond x<copies>; embeddings get a
deterministic per-copy component perturbation so no exact-duplicate
vectors are planted. Timestamps are left untouched: a scale-up means
denser traffic over the same window, which is exactly the stress the
window/session queries should see.
"""
import sys
import duckdb

src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
OFF = 1_000_000_000

con = duckdb.connect()

def emit(table, select_for_copy):
    parts = [select_for_copy(c) for c in range(copies)]
    union = " UNION ALL ".join(parts)
    con.execute(
        f"COPY ({union}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
    ).fetchone()[0]
    print(f"  {table}: {n} rows")

def rp(t):
    return f"read_parquet('{src}/{t}.parquet')"

import os
os.makedirs(dst, exist_ok=True)

# fixed dimensions: one copy, unchanged
for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM {rp(t)}) TO "
                f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(f"  {t}: fixed dimension, 1 copy")

emit("customer", lambda c: f"""
  SELECT c_custkey + {c * OFF} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment FROM {rp('customer')}""")

emit("supplier", lambda c: f"""
  SELECT s_suppkey + {c * OFF} AS s_suppkey, s_name, s_nationkey,
         s_acctbal FROM {rp('supplier')}""")

emit("part", lambda c: f"""
  SELECT p_partkey + {c * OFF} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice FROM {rp('part')}""")

emit("orders", lambda c: f"""
  SELECT o_orderkey + {c * OFF} AS o_orderkey,
         o_custkey + {c * OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {rp('orders')}""")

emit("lineitem", lambda c: f"""
  SELECT l_orderkey + {c * OFF} AS l_orderkey,
         l_partkey + {c * OFF} AS l_partkey,
         l_suppkey + {c * OFF} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount,
         l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {rp('lineitem')}""")

emit("events", lambda c: f"""
  SELECT event_id + {c * OFF} AS event_id, ts,
         user_id + {c * OFF} AS user_id, event_type, value, props
  FROM {rp('events')}""")

# disjoint token salting (mirror of ScalingSpec.disjointDocs): each
# copy's shingle vocabulary is unique to it
emit("documents", lambda c: f"""
  SELECT doc_id + {c * OFF} AS doc_id,
         'c{c}x' || replace(text, ' ', ' c{c}x') AS text,
         lang, source,
         CAST(length('c{c}x' || replace(text, ' ', ' c{c}x')) AS BIGINT)
           AS n_chars
  FROM {rp('documents')}""")

# deterministic per-copy component perturbation: no exact-dup vectors
emit("embeddings", lambda c: f"""
  SELECT vec_id + {c * OFF} AS vec_id,
         list_transform(embedding,
           x -> CAST(x + 0.001 * sin(x * {c + 7}) AS FLOAT))
           AS embedding,
         label
  FROM {rp('embeddings')}""")

print("done:", dst)
