#!/usr/bin/env python3
"""Corpus-wide decade-scaling table from two Bench artifacts.

Usage: decade_table.py <BENCH_full_smallSF.json> <BENCH_full_bigSF.json>...

Reads the per-query wall times of a small-SF run and one or more
big-SF runs of the SAME corpus (extra big-SF artifacts are repeat
legs: the per-query MIN across them is used, discounting transient
contention the way min-of-3 does within a run). Prints the per-query
big/small ratio table, growth buckets, and the calibration probes of
every artifact so a reader can apply BASELINE.md's discount rule.

Interpretation guide (see DESIGN.md "Corpus-wide decade scaling"):
- sub-second queries are fixed-overhead-dominated, so ratios well
  under the data factor are expected for them;
- on a 10-copy synthesized decade, exact near-dup pair spaces grow
  ~100x by construction — their ratios measure pruning, not defect.
"""
import sys, json

if len(sys.argv) < 3:
    sys.exit(__doc__)
small = json.load(open(sys.argv[1]))
bigs = [json.load(open(p)) for p in sys.argv[2:]]
for p, d in zip(sys.argv[1:], [small] + bigs):
    cal = d.get("calibration", {})
    print(f"{p}: total {d.get('value')}s, probes "
          f"{cal.get('pre')}/{cal.get('post')}s, eff_cores "
          f"{d.get('cpu_wall', {}).get('eff_cores')}, sf {d.get('sf')}")

qs = small["queries"]
best = {}
for b in bigs:
    for q, t in b["queries"].items():
        if q in qs:
            best[q] = min(t, best.get(q, t))
missing = set(qs) - set(best)
if missing:
    print(f"WARNING: {len(missing)} queries missing from big-SF "
          f"artifact(s): {sorted(missing)[:8]}...")

rs = sorted(((best[q] / qs[q], q) for q in best), reverse=True)
med = sorted(r for r, _ in rs)[len(rs) // 2]
print(f"\n{len(rs)} common queries, median ratio {med:.2f}")
print("\nper-query decade ratios (descending):")
for r, q in rs:
    print(f"  {q:32s} {qs[q]:8.3f} -> {best[q]:9.3f}  x{r:.1f}")
buckets = {"<=3": 0, "3-12": 0, "12-30": 0, ">30": 0}
for r, _ in rs:
    buckets["<=3" if r <= 3 else "3-12" if r <= 12
            else "12-30" if r <= 30 else ">30"] += 1
print(f"\nbuckets: {buckets}")
