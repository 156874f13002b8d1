#!/usr/bin/env python3
"""Planted-error control for selfcheck.py's --tier=scale invariants
(falsifiability gate): the scale tier replaces four quadratic oracles
with invariants + sampled witnesses, and a vacuous witness would turn
the sf10 soak into a rubber stamp. This control plants one error per
invariant class into COPIES of a known-good Verify dump and asserts
the scale tier FAILS each one:

  1. q_embed_near_pairs: one cos_sim value inflated by 0.01
     -> ordering/recompute witness must fire;
  2. q_dedup_clusters_embed: dump swapped with q_dedup_clusters_lsh's
     (doc clusters fed to the embedding invariants) -> label-purity /
     witness must fire;
  3. q_dedup_clusters_lsh: one node's cluster_id repointed to a
     different (existing) cluster -> Jaccard witness or min-rep must
     fire;
  4. q_skyline: one p_size decremented -> the linear replacement
     oracle is a full-value compare, must mismatch;
  5. q_scan_project: row order reversed with values intact -> only
     the r12 ORDER BY contract lint can catch it (the multiset
     compare is order-blind by design).

Usage: selfcheck_control.py <sfDir> <goodOutDir>
where <goodOutDir> is a Verify dump that PASSES the scale tier (the
control first re-asserts that, so a broken baseline can't fake a
pass). Exit 0 = all five planted errors caught; 1 otherwise.
"""
import json, os, shutil, subprocess, sys, glob

import pyarrow as pa
import pyarrow.parquet as pq

sfdir, good = sys.argv[1], sys.argv[2]
work = f"/tmp/selfcheck_control_{os.getpid()}"
HERE = os.path.dirname(os.path.abspath(__file__))
QS = ["q_skyline", "q_embed_near_pairs",
      "q_dedup_clusters_embed", "q_dedup_clusters_lsh",
      "q_scan_project"]

def run_tier(outdir, names):
    p = subprocess.run(
        [sys.executable, os.path.join(HERE, "selfcheck.py"),
         sfdir, outdir, ",".join(names), "--tier=scale"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    return p.returncode, p.stdout.decode(errors="replace")

def fresh_copy():
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)
    shutil.copy(os.path.join(good, "oracle_sql.json"), work)
    for q in QS:
        shutil.copytree(os.path.join(good, q), os.path.join(work, q))

def table_edit(q, fn):
    d = os.path.join(work, q)
    f = glob.glob(d + "/*.parquet")[0]
    pq.write_table(fn(pq.read_table(d)), f)

print("[0/5] baseline: the good dump must PASS the scale tier")
rc, out = run_tier(good, QS)
if rc != 0:
    print(out)
    sys.exit("baseline dump does not pass the scale tier — control "
             "needs a known-good Verify dump")

ok = True
def expect_fail(label, names):
    global ok
    rc, out = run_tier(work, names)
    caught = rc != 0
    tail = [l for l in out.splitlines() if l.strip()][-2:]
    print(f"  {label}: {'CAUGHT' if caught else '*** MISSED ***'} "
          f"({' | '.join(tail)})")
    ok &= caught

print("[1/5] near_pairs: inflate one cos_sim")
fresh_copy()
def t1(t):
    cs = t.column("cos_sim").to_pylist()
    cs[3] = round(cs[3] + 0.01, 4)
    return t.set_column(t.column_names.index("cos_sim"), "cos_sim",
                        pa.array(cs, pa.float64()))
table_edit("q_embed_near_pairs", t1)
expect_fail("inflated cosine", ["q_embed_near_pairs"])

print("[2/5] clusters_embed: swap in the doc-cluster dump")
fresh_copy()
shutil.rmtree(os.path.join(work, "q_dedup_clusters_embed"))
shutil.copytree(os.path.join(good, "q_dedup_clusters_lsh"),
                os.path.join(work, "q_dedup_clusters_embed"))
expect_fail("swapped cluster dump", ["q_dedup_clusters_embed"])

print("[3/5] clusters_lsh: repoint one node to a different cluster")
fresh_copy()
def t3(t):
    ids = t.column("id").to_pylist()
    cl = t.column("cluster_id").to_pylist()
    reps = sorted(set(cl))
    if len(reps) < 2:
        sys.exit("need >= 2 clusters for the repoint control")
    # move a non-rep member of the last cluster into the first
    for i in range(len(ids) - 1, -1, -1):
        if cl[i] == reps[-1] and ids[i] != reps[-1]:
            cl[i] = reps[0]
            break
    return t.set_column(t.column_names.index("cluster_id"),
                        "cluster_id", pa.array(cl, t.column("cluster_id").type))
table_edit("q_dedup_clusters_lsh", t3)
expect_fail("repointed cluster member", ["q_dedup_clusters_lsh"])

print("[4/5] skyline: decrement one p_size")
fresh_copy()
def t4(t):
    ps = t.column("p_size").to_pylist()
    ps[0] = ps[0] - 1
    return t.set_column(t.column_names.index("p_size"), "p_size",
                        pa.array(ps, t.column("p_size").type))
table_edit("q_skyline", t4)
expect_fail("tampered skyline row", ["q_skyline"])

print("[5/5] scan_project: reverse the dump's row order (values intact)")
# Falsifiability for the r12 ORDER BY contract lint: the multiset
# compare is order-blind by design, so a dump with IDENTICAL values
# in reversed order can only be caught by the lint. q_scan_project's
# oracle ends in a bare 3-column ORDER BY (a total order), so the
# reversal is unambiguous — no tie could excuse it.
fresh_copy()
def t5(t):
    return t.slice(0).take(list(range(t.num_rows - 1, -1, -1)))
table_edit("q_scan_project", t5)
expect_fail("reversed row order", ["q_scan_project"])

shutil.rmtree(work, ignore_errors=True)
print("CONTROL " + ("PASSED: all five planted errors caught"
                    if ok else "FAILED: at least one planted error "
                    "slipped through the scale tier"))
sys.exit(0 if ok else 1)
