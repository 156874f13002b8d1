#!/bin/bash
# Round-12 sf100 closer (VERDICT r11 #1/#3): finish the third-decade
# scoreboard 25/32 -> 32/32 and re-measure the four decade rows whose
# r11 walls carried documented contention windows.
#
# Rule of record (DESIGN.md r11 session 3, one-disk boxes): the heavy
# EXACT oracles run SERIALLY after the Spark verify lane, never
# pipelined. The Spark lane runs in ONE pinned pre-touched JVM
# (lazy-fault sandbox countermeasure, 556s->58s measured) with the
# four walls-only re-measures FIRST so their numbers are bracketed by
# nothing but the leg itself.
#
# Usage: sf100_close.sh [dataDir=target/sfsynth/sf100] [outDir=/tmp/soak_sf100]
set -euo pipefail
cd "$(dirname "$0")/.."

DST="${1:-target/sfsynth/sf100}"
OUT="${2:-/tmp/soak_sf100}"
HEAP="${SOAK_HEAP:-48g}"
CPUS="${SPARK_GRAFT_CPUS:-32}"

# walls-first (solo re-measures of the r11 contended rows), then the
# dumps the pending oracles need
WALLS_Q="q_graph_degree_dist,q_demand_variability,q_text_tfidf,q_cooccur_rules"
ORACLE_Q="q_cooccur_rules,q_pareto_abc,q_dedup_clusters,q_dedup_containment,q_recsys_item_cosine,q_rolling_distinct_users,q_dedup_jaccard_pruned"
ALL_Q="q_graph_degree_dist,q_demand_variability,q_text_tfidf,q_cooccur_rules,q_pareto_abc,q_dedup_clusters,q_dedup_containment,q_recsys_item_cosine,q_rolling_distinct_users,q_dedup_jaccard_pruned"

JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests\.jar' | head -1)
mapfile -t OPENS < <(for p in java.lang java.lang.invoke java.lang.reflect \
    java.io java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
    sun.security.action sun.util.calendar; do
  echo "--add-opens=java.base/$p=ALL-UNNAMED"; done)

mkdir -p "$OUT"
TODO=""
IFS=',' read -ra QLIST <<< "$ALL_Q"
for Q in "${QLIST[@]}"; do
  if [[ -d "$OUT/$Q" && -f "$OUT/$Q/_SUCCESS" ]]; then
    echo "[verify] $Q: already dumped, skipping"; continue
  fi
  TODO="${TODO:+$TODO,}$Q"
done

echo "[1/3] pinned batch-JVM verify leg ($HEAP, local[$CPUS]): $TODO"
if [[ -n "$TODO" ]]; then
  java "${OPENS[@]}" -Xms"$HEAP" -Xmx"$HEAP" -XX:+AlwaysPreTouch \
    -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -Dspark.io.compression.codec=zstd \
    -cp "$JAR:/opt/spark/jars/*" graft.Verify "$PWD/$DST" "$OUT" \
    "$TODO" 2> >(tee "$OUT/verify.stderr" \
      | grep -E '\[verify\].*failed|\[verify-time\]' >&2 || true)
fi

echo "[2/3] serial heavy EXACT oracles (one selfcheck per query)"
IFS=',' read -ra OLIST <<< "$ORACLE_Q"
for Q in "${OLIST[@]}"; do
  if python3 - "$OUT/oracle_results.json" "$Q" <<'EOF'
import json, os, sys
p, q = sys.argv[1], sys.argv[2]
d = json.load(open(p)) if os.path.exists(p) else {}
sys.exit(0 if d.get(q, {}).get("status") == "PASS" else 1)
EOF
  then echo "[oracle] $Q: already PASS, skipping"; continue; fi
  T0=$SECONDS
  set +e
  GRAFT_ORACLE_THREADS="${GRAFT_ORACLE_THREADS:-16}" \
    python3 scripts/selfcheck.py --tier=scale "$PWD/$DST" "$OUT" "$Q" \
    > "$OUT/$Q.oracle.log" 2>&1
  RC=$?
  set -e
  WALL=$((SECONDS - T0))
  python3 - "$OUT/oracle_results.json" "$Q" "$RC" "$WALL" <<'EOF'
import json, os, sys
p, q, rc, wall = sys.argv[1], sys.argv[2], int(sys.argv[3]), float(sys.argv[4])
d = json.load(open(p)) if os.path.exists(p) else {}
d[q] = {"status": "PASS" if rc == 0 else "FAIL", "wall": wall, "rc": rc}
json.dump(d, open(p + ".tmp", "w"), indent=1)
os.replace(p + ".tmp", p)
EOF
  echo "[oracle] $Q: rc=$RC ${WALL}s (free $(df --output=avail -BG / | tail -1))"
done

echo "[3/3] results"
cat "$OUT/oracle_results.json"
grep '\[verify-time\]' "$OUT/verify.stderr" 2>/dev/null || true
