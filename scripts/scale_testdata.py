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


# The copy index is a table-valued range, not per-copy UNION legs: a
# 1000-copy union exceeds DuckDB's max_expression_depth (hit live at
# the sf100 synthesis), while a single CROSS JOIN range(copies) leg is
# O(1) SQL at any copy count and produces the identical multiset.
REP_OFF = (f"{REP0} + (cp * {hot - 1} + (rep - 1)) * {SUB}"
           if hot else "0")

con = duckdb.connect()
# Large COPYs buffer the whole result in RAM when the writer must
# preserve insertion order across threads (observed live: the sf100
# lineitem COPY sat at 0 bytes for 45 min with an 80GB RSS). Row
# order inside the parquet carries no meaning here — the synthesis
# contract is the MULTISET — so let the writer stream out of order,
# and cap DuckDB's memory so a synthesis can never take down the box.
con.execute("SET preserve_insertion_order = false")
con.execute("SET memory_limit = '24GB'")
# Layout knob (measured live at sf10): the unordered streamed write
# scatters every copy across every row group — each row group spans
# the FULL key domain, so map-side combine gets zero key locality and
# row-group pruning never fires; keyed queries measured 19-34x slower
# on the scattered layout vs the copy-clustered one (q_recsys 556s vs
# ~30s-class, q_graph_triangles 1136s). Real ingest is clustered (by
# arrival time / key range), and the r10 UNION-legs generator wrote
# copy-clustered row groups — so ordered is the representative layout
# for perf measurement. GRAFT_SYNTH_ORDERED=1 restores it by sorting
# each emit on the copy index (DuckDB external-sorts under the memory
# cap, spilling to temp disk). The MULTISET is identical either way.
import os as _os
ORDERED = bool(_os.environ.get("GRAFT_SYNTH_ORDERED"))
if ORDERED:
    con.execute("SET temp_directory = '/tmp/duckdb_synth_spill'")
    # The explicit ORDER BY below forces an external sort under the
    # memory cap, but with preserve_insertion_order=false a parallel
    # COPY is still free to WRITE the sorted stream out of order —
    # the setting exists precisely to let the writer re-emit as
    # threads finish (ADVICE r11). Restore order preservation on the
    # ORDERED path so the clustered layout the knob promises is
    # guaranteed, not version-dependent; the sort (not the writer)
    # is what bounds memory, so the r11 80GB-RSS failure mode (an
    # UNSORTED parallel COPY buffering to preserve arrival order)
    # does not come back.
    con.execute("SET preserve_insertion_order = true")

def emit(table, select_all_copies):
    out = f"{dst}/{table}.parquet"
    import os as _os
    if _os.path.exists(out) and _os.path.getsize(out) > 0:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}')"
                    ).fetchone()[0]
        print(f"  {table}: already present ({n} rows), skipping")
        return
    if ORDERED:
        # ORDER BY 1 = the table's scaled primary key (first output
        # column by construction) — keys are base + copy*1e9, so key
        # order IS copy-clustered order; works across UNION ALL legs
        # of the hot path too (positional, not name, reference).
        select_all_copies = (f"SELECT * FROM ({select_all_copies}) t "
                             "ORDER BY 1")
    con.execute(
        f"COPY ({select_all_copies}) TO '{dst}/{table}.parquet' "
        "(FORMAT PARQUET)")
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{dst}/{table}.parquet')"
    ).fetchone()[0]
    print(f"  {table}: {n} rows")

COPIES_SRC = f"range(0, {copies}) c(cp)"

def rp(t):
    return f"read_parquet('{src}/{t}.parquet')"

import os
os.makedirs(dst, exist_ok=True)

# fixed dimensions: one copy, unchanged
for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM {rp(t)}) TO "
                f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(f"  {t}: fixed dimension, 1 copy")

emit("customer", f"""
  SELECT c_custkey + cp * {OFF} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {rp('customer')} CROSS JOIN {COPIES_SRC}""")

emit("supplier", f"""
  SELECT s_suppkey + cp * {OFF} AS s_suppkey, s_name, s_nationkey,
         s_acctbal FROM {rp('supplier')} CROSS JOIN {COPIES_SRC}""")

emit("part", f"""
  SELECT p_partkey + cp * {OFF} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {rp('part')} CROSS JOIN {COPIES_SRC}""")

emit("orders", f"""
  SELECT o_orderkey + cp * {OFF} AS o_orderkey,
         o_custkey + cp * {OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {rp('orders')} CROSS JOIN {COPIES_SRC}""")

li = f"""
  SELECT l_orderkey + cp * {OFF} AS l_orderkey,
         l_partkey + cp * {OFF} AS l_partkey,
         l_suppkey + cp * {OFF} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount,
         l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {rp('lineitem')} CROSS JOIN {COPIES_SRC}"""
if hot:
    # whale orders: hot orders gain (hot-1) extra replica line sets,
    # each with FRESH suppliers — per-order distinct-supplier count
    # multiplies, which is the co-supply hub stress
    li += f""" UNION ALL
      SELECT l_orderkey + cp * {OFF}, l_partkey + cp * {OFF},
             l_suppkey + {REP_OFF},
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM {rp('lineitem')} CROSS JOIN {COPIES_SRC}
      CROSS JOIN range(1, {hot}) r(rep)
      WHERE l_orderkey % 100 = 0"""
emit("lineitem", li)

ev = f"""
  SELECT event_id + cp * {OFF} AS event_id, ts,
         user_id + cp * {OFF} AS user_id, event_type, value, props
  FROM {rp('events')} CROSS JOIN {COPIES_SRC}"""
if hot:
    # hot users: top-1% of the key domain carry hot x their rows; ts
    # jittered +rep seconds so sessions aren't same-instant stacks
    ev += f""" UNION ALL
      SELECT event_id + {REP_OFF},
             ts + to_seconds(rep::BIGINT),
             user_id + cp * {OFF}, event_type, value, props
      FROM {rp('events')} CROSS JOIN {COPIES_SRC}
      CROSS JOIN range(1, {hot}) r(rep)
      WHERE user_id % 100 = 0"""
emit("events", ev)

# disjoint token salting (mirror of ScalingSpec.disjointDocs): each
# copy's shingle vocabulary is unique to it
emit("documents", f"""
  SELECT doc_id + cp * {OFF} AS doc_id,
         'c' || cp || 'x' ||
           replace(text, ' ', ' c' || cp || 'x') AS text,
         lang, source,
         CAST(length('c' || cp || 'x' ||
           replace(text, ' ', ' c' || cp || 'x')) AS BIGINT) AS n_chars
  FROM {rp('documents')} CROSS JOIN {COPIES_SRC}""")

# deterministic per-copy component perturbation: no exact-dup vectors
emit("embeddings", f"""
  SELECT vec_id + cp * {OFF} AS vec_id,
         list_transform(embedding,
           x -> CAST(x + 0.001 * sin(x * (cp + 7)) AS FLOAT))
           AS embedding,
         label
  FROM {rp('embeddings')} CROSS JOIN {COPIES_SRC}""")

print("done:", dst)
