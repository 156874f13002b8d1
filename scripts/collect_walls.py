#!/usr/bin/env python3
"""Assemble a WALLS_r*_sf*.json artifact from Verify stderr logs.

Usage: collect_walls.py <sf-label> <config-string> <out.json> <stderr>...

Scans each stderr for `[verify-time] <query> <seconds>` lines (written
by graft.Verify per query). Later files win on duplicate query names
(a re-measure supersedes an earlier leg's wall).
"""
import json, re, sys

if len(sys.argv) < 5:
    sys.exit(__doc__)
sf, config, out = sys.argv[1], sys.argv[2], sys.argv[3]

walls = {}
for path in sys.argv[4:]:
    for line in open(path, errors="replace"):
        m = re.match(r"\[verify-time\] (\S+) ([0-9.]+)", line)
        if m:
            walls[m.group(1)] = float(m.group(2))

doc = {"sf": sf, "config": config, "queries": walls,
       "total": round(sum(walls.values()), 1)}
json.dump(doc, open(out, "w"), indent=1)
print(f"{len(walls)} walls, total {doc['total']}s -> {out}")
