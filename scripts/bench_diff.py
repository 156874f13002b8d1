#!/usr/bin/env python3
"""Round-over-round bench comparison with the BASELINE.md discount
rule applied mechanically.

Usage: bench_diff.py <prev_BENCH_full.json> <curr_BENCH_full.json>

Reads the calibration probes and eff_cores of BOTH artifacts, warns
when either run was contended (probe >= 2x the warm floor, or
eff_cores differing >= 1.5x between runs), and reports the
common-subset total ratio plus per-query deltas — suppressing
per-query judgments entirely for contended pairs, because inside the
measured contention band (r8: 203s vs 101s identical code) they are
noise. An eff_cores skew with CLEAN probes is reported but NOT
suppressed: that is the code's parallelism changing, exactly the
regression class to read, not launder.

Exit codes: 0 = clean pass; 1 = clean pair regressed >2x on the
common-subset total (the driver's gate threshold); 3 = inconclusive
(contended/unknown pair, deltas suppressed — re-measure idle).
"""
import sys, json

WARM_FLOOR = 0.18  # BASELINE.md r9 measured warm probe ceiling

prev = json.load(open(sys.argv[1]))
curr = json.load(open(sys.argv[2]))

def contended(d, name):
    cal = d.get("calibration")
    if not cal:
        print(f"  [{name}] no calibration fields (pre-r9 artifact) — "
              "treat as unknown contention")
        return None
    worst = max(cal["pre"], cal["post"])
    if worst >= 2 * WARM_FLOOR:
        print(f"  [{name}] CONTENDED: probe {worst:.3f}s >= "
              f"{2*WARM_FLOOR:.2f}s (warm floor {WARM_FLOOR})")
        return True
    print(f"  [{name}] clean: probes {cal['pre']:.3f}/{cal['post']:.3f}s, "
          f"eff_cores {d.get('cpu_wall', {}).get('eff_cores', '?')}")
    return False

print("contention self-check:")
c_prev, c_curr = contended(prev, "prev"), contended(curr, "curr")
ec = [d.get("cpu_wall", {}).get("eff_cores") for d in (prev, curr)]
if all(isinstance(e, (int, float)) and e > 0 for e in ec) and \
        max(ec) / min(ec) >= 1.5:
    if c_prev is False and c_curr is False:
        # clean probes + eff_cores skew = the CODE's parallelism
        # changed, not the box — that is a signal to REPORT, never a
        # reason to suppress (suppressing here would launder a
        # serialization regression as 'contention')
        print(f"  eff_cores skew {ec[0]} vs {ec[1]} with CLEAN probes "
              "— parallelism of the code under test changed; deltas "
              "below are trustworthy and worth reading")
    else:
        print(f"  eff_cores skew {ec[0]} vs {ec[1]} (>=1.5x) on a "
              "contended/unknown pair — runs not comparable per-query")

common = sorted(set(prev["queries"]) & set(curr["queries"]))
tp = sum(prev["queries"][q] for q in common)
tc = sum(curr["queries"][q] for q in common)
ratio = tc / tp if tp else float("nan")
print(f"\ncommon subset: {len(common)} queries, "
      f"{tp:.1f}s -> {tc:.1f}s  ({ratio:.3f}x)")
only_prev = set(prev["queries"]) - set(curr["queries"])
only_curr = set(curr["queries"]) - set(prev["queries"])
def brief(s):
    xs = sorted(s)
    return xs if len(xs) <= 12 else xs[:12] + [f"... +{len(xs)-12} more"]
if only_prev:
    print(f"dropped queries ({len(only_prev)}): {brief(only_prev)}")
if only_curr:
    print(f"new queries ({len(only_curr)}): {brief(only_curr)}")
for d, name in ((prev, "prev"), (curr, "curr")):
    if d.get("failed"):
        print(f"{name} FAILED queries (totals exclude them): {d['failed']}")

if c_prev or c_curr or c_prev is None or c_curr is None:
    print("\nper-query deltas SUPPRESSED: at least one run contended/"
          "unknown — inside the measured contention band they are "
          "noise (BASELINE.md). Re-measure suspects solo with "
          "SPARK_GRAFT_ONLY on an idle box.")
    # exit 3 = INCONCLUSIVE: an automated caller must not read a
    # suppressed comparison as a clean pass
    sys.exit(3)

deltas = sorted(((curr["queries"][q] / prev["queries"][q], q)
                 for q in common if prev["queries"][q] >= 0.3),
                reverse=True)
slower = [(r, q) for r, q in deltas if r >= 1.5]
faster = [(r, q) for r, q in deltas if r <= 1 / 1.5]
print(f"\nper-query (clean pair, prev >= 0.3s): "
      f"{len(slower)} slower >=1.5x, {len(faster)} faster <=0.67x")
for r, q in slower[:15]:
    print(f"  SLOWER {r:.2f}x {q} "
          f"({prev['queries'][q]:.2f} -> {curr['queries'][q]:.2f}s)")
for r, q in faster[:5]:
    print(f"  faster {r:.2f}x {q}")
sys.exit(1 if ratio > 2.0 else 0)
