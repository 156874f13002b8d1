#!/usr/bin/env python3
"""Assemble the round's cumulative sf100 oracle scoreboard.

The 32-query scoreboard is the top-32 of the committed BENCH_full.json
(soak_scale's selection rule). Rows measured THIS round come from the
campaign ledger (<outDir>/oracle_results.json, written by
sf100_close.sh); rows not re-measured are carried from the prior
round's artifact with "source" marking their provenance — the data is
multiset-identical across rounds (the synthesis is pure SQL over the
same source), so a carried PASS stays evidential, but the provenance
must stay readable.

Usage: merge_sf100_ledger.py <campaignLedger> <priorArtifact> <out>
"""
import json, sys

fresh = json.load(open(sys.argv[1]))
prior = json.load(open(sys.argv[2]))

qs = json.load(open("BENCH_full.json"))["queries"]
top32 = [k for k, _ in sorted(qs.items(), key=lambda kv: -kv[1])[:32]]

# r11 session-2 greens recorded in DESIGN.md but absent from the r11
# session-3 ledger file (they predate it): carried by name.
SESSION2_GREEN = {
    "q_graph_triangles", "q_ann_pq", "q_k_core", "q_link_prediction",
    "q_geo_geofence", "q_join_bloom", "q_agg_heavy_hitters_cms",
    "q_profile_columns", "q_sample_cluster", "q_semdedup_prune",
    "q_sql_recursive", "q_cluster_kmeans",
}

out = {}
for q in top32:
    if q in fresh:
        out[q] = dict(fresh[q], source="r12")
    elif q in prior and prior[q].get("status") == "PASS":
        out[q] = dict(prior[q], source="r11")
    elif q in prior:
        # A recorded prior FAIL must NEVER be upgraded by the
        # session-2 name list (ADVICE r12, medium): carry it as
        # STALE-FAIL so the scoreboard shows the unresolved row
        # loudly until a fresh measurement lands.
        out[q] = dict(prior[q], status="STALE-FAIL", source="r11",
                      note="prior non-PASS not re-measured this round")
    elif q in SESSION2_GREEN:
        out[q] = {"status": "PASS", "source": "r11-session2",
                  "note": "ledger predates oracle_results.json; see "
                          "DESIGN.md round-11 session 2"}
    else:
        out[q] = {"status": "PENDING", "source": "none"}

npass = sum(1 for v in out.values() if v["status"] == "PASS")
json.dump(out, open(sys.argv[3], "w"), indent=1)
print(f"{npass}/{len(out)} PASS -> {sys.argv[3]}")
for q, v in out.items():
    if v["status"] != "PASS":
        print(f"  {v['status']}: {q} ({v.get('rc', '')})")
