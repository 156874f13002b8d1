#!/usr/bin/env python3
"""Synthesize a larger-SF stand-in from an existing testdata dir for
oracle/scale soaks (diagnostic tooling, driver-side stack like
selfcheck.py — NOT part of the shipped library).

Usage: scale_testdata.py <srcDir> <dstDir> <copies> [--hot=MULT]

Shape: union of <copies> key-offset copies, referential integrity
preserved WITHIN each copy (every scaling key gets +copy*1e9, so
order->lineitem, customer->orders, part/supplier->lineitem joins all
stay consistent); region/nation stay fixed like TPC-H's constant
dimensions.

--hot=MULT (VERDICT r9 #3): Zipf-hot synthesis — the uniform decade
hides the skew real track fleets have (one entity posting 1000x more
points). With the flag, the top-1% of keys gain MULT-fold
multiplicity inside every copy:
  - events: users with user_id % 100 == 0 carry MULT x their rows
    (fresh event_ids in a replica sub-block, ts jittered +rep sec so
    sessions aren't degenerate same-instant stacks);
  - lineitem: orders with l_orderkey % 100 == 0 gain MULT x NEW
    distinct suppliers (fresh l_suppkey sub-blocks) — whale orders
    that turn the co-supply graph's per-order pair space into the
    hub stress the graph family must survive.
The same rule is mirrored in-plan by SkewScalingSpec so the sbt
gates don't depend on this script having run. Documents are disjoint-salted (every token prefixed with
a copy tag, n_chars recomputed) so cross-copy near-dup pairs don't
explode the dedup pair space beyond x<copies>; embeddings get a
deterministic per-copy component perturbation so no exact-duplicate
vectors are planted. Timestamps are left untouched: a scale-up means
denser traffic over the same window, which is exactly the stress the
window/session queries should see.
"""
import sys
import duckdb

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
src, dst, copies = _pos[0], _pos[1], int(_pos[2])
hot = 0
for a in sys.argv[1:]:
    if a.startswith("--hot="):
        hot = int(a.split("=", 1)[1])
    elif a.startswith("--"):
        sys.exit(f"unknown flag {a}")
OFF = 1_000_000_000
SUB = 100_000_000  # replica sub-block size for hot-key replicas
REP0 = copies * OFF  # first replica block starts above every base copy
# Replica sub-blocks live in a DISJOINT range ABOVE all base copies
# (ADVICE r10: the old in-copy layout `+ c*OFF + rep*SUB` collided
# with the NEXT copy's base block at rep >= 10, duplicating event_ids
# and cross-merging suppliers exactly at the 100-1000x multiplicities
# the doc headlines). Replica (copy c, rep r in [1, hot)) gets
#   base_key + REP0 + (c*(hot-1) + (r-1)) * SUB
# which is unique across copies AND reps for any hot, because base
# keys are < SUB (testdata keys are < 1e6) and blocks are spaced SUB
# apart starting at REP0 = copies * OFF (above every base block).


def rep_off(c):
    """SQL expression for the replica-block offset of copy c (the
    range() alias `rep` is in scope in the caller's UNION leg)."""
    return f"{REP0 + c * (hot - 1) * SUB} + (rep - 1) * {SUB}"

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

def li_copy(c):
    base = f"""
      SELECT l_orderkey + {c * OFF} AS l_orderkey,
             l_partkey + {c * OFF} AS l_partkey,
             l_suppkey + {c * OFF} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM {rp('lineitem')}"""
    if not hot:
        return base
    # whale orders: hot orders gain (hot-1) extra replica line sets,
    # each with FRESH suppliers — per-order distinct-supplier count
    # multiplies, which is the co-supply hub stress
    return base + f""" UNION ALL
      SELECT l_orderkey + {c * OFF}, l_partkey + {c * OFF},
             l_suppkey + {rep_off(c)},
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM {rp('lineitem')} CROSS JOIN range(1, {hot}) r(rep)
      WHERE l_orderkey % 100 = 0"""

def ev_copy(c):
    base = f"""
      SELECT event_id + {c * OFF} AS event_id, ts,
             user_id + {c * OFF} AS user_id, event_type, value, props
      FROM {rp('events')}"""
    if not hot:
        return base
    # hot users: top-1% of the key domain carry hot x their rows; ts
    # jittered +rep seconds so sessions aren't same-instant stacks
    return base + f""" UNION ALL
      SELECT event_id + {rep_off(c)},
             ts + to_seconds(rep::BIGINT),
             user_id + {c * OFF}, event_type, value, props
      FROM {rp('events')} CROSS JOIN range(1, {hot}) r(rep)
      WHERE user_id % 100 = 0"""

emit("lineitem", li_copy)

emit("events", ev_copy)

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
