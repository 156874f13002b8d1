#!/bin/bash
# Round-12 campaign tail: runs AFTER the sf100 batch verify leg.
#  1. synthesize sf10 (same generator/session) and re-measure the four
#     decade rows' sf10 walls in a pinned JVM — same-session ratios
#     (this box's warm-memory bandwidth is ~3.5x below r11's session,
#     so r11 absolute walls are not comparable; same-session ratios
#     divide the regime out);
#  2. run the pending heavy EXACT oracles STRICTLY SERIALLY with a
#     big in-memory cap (disk is the scarce resource, RAM is idle);
#  3. merge the cumulative 32-row scoreboard.
set -uo pipefail
cd "$(dirname "$0")/.."

OUT="${1:-/tmp/soak_sf100}"
SF10="target/sfsynth/sf10"
OUT10="/tmp/soak_sf10_r12"
# all 10 campaign queries, not just the 4 contended rows: the sf100
# walls this session are all solo, so a full same-session sf10 leg
# yields a 10-row solo/same-regime decade table (~25 min at this
# box's pace — r11's sf10 total for these was 632 s on a faster box)
WALLS_Q="q_graph_degree_dist,q_demand_variability,q_text_tfidf,q_cooccur_rules,q_pareto_abc,q_dedup_clusters,q_dedup_containment,q_recsys_item_cosine,q_rolling_distinct_users,q_dedup_jaccard_pruned"
# cheapest-first guess; each entry is resumable via the ledger
ORACLES="q_pareto_abc q_dedup_clusters q_dedup_containment q_recsys_item_cosine q_rolling_distinct_users q_cooccur_rules q_dedup_jaccard_pruned"

JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests\.jar' | head -1)
mapfile -t OPENS < <(for p in java.lang java.lang.invoke java.lang.reflect \
    java.io java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
    sun.security.action sun.util.calendar; do
  echo "--add-opens=java.base/$p=ALL-UNNAMED"; done)

echo "[1/3] sf10 same-session walls leg"
if [[ ! -f "$SF10/lineitem.parquet" ]]; then
  python3 scripts/scale_testdata.py /root/testdata/sf0.1 "$SF10" 100
fi
mkdir -p "$OUT10"
java "${OPENS[@]}" -Xms24g -Xmx24g -XX:+AlwaysPreTouch \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.io.compression.codec=zstd \
  -cp "$JAR:/opt/spark/jars/*" graft.Verify "$PWD/$SF10" "$OUT10" \
  "$WALLS_Q" 2> "$OUT10/verify.stderr"
grep '\[verify-time\]' "$OUT10/verify.stderr" || true

echo "[2/3] serial heavy EXACT oracles (solo, big mem cap, 32 threads)"
for Q in $ORACLES; do
  if python3 - "$OUT/oracle_results.json" "$Q" <<'EOF'
import json, os, sys
p, q = sys.argv[1], sys.argv[2]
d = json.load(open(p)) if os.path.exists(p) else {}
sys.exit(0 if d.get(q, {}).get("status") == "PASS" else 1)
EOF
  then echo "[oracle] $Q: already PASS, skipping"; continue; fi
  if [[ ! -f "$OUT/$Q/_SUCCESS" ]]; then
    echo "[oracle] $Q: no dump, skipping"; continue
  fi
  rm -rf /tmp/duckdb_oracle_spill
  T0=$SECONDS
  GRAFT_ORACLE_THREADS=32 GRAFT_ORACLE_MEM=100GB \
    python3 scripts/selfcheck.py --tier=scale "$PWD/target/sfsynth/sf100" \
    "$OUT" "$Q" > "$OUT/$Q.oracle.log" 2>&1
  RC=$?
  WALL=$((SECONDS - T0))
  python3 - "$OUT/oracle_results.json" "$Q" "$RC" "$WALL" <<'EOF'
import json, os, sys
p, q, rc, wall = sys.argv[1], sys.argv[2], int(sys.argv[3]), float(sys.argv[4])
d = json.load(open(p)) if os.path.exists(p) else {}
d[q] = {"status": "PASS" if rc == 0 else "FAIL", "wall": wall, "rc": rc}
json.dump(d, open(p + ".tmp", "w"), indent=1)
os.replace(p + ".tmp", p)
EOF
  echo "[oracle] $Q: rc=$RC ${WALL}s (free $(df --output=avail -BG / | tail -1 | tr -d ' '))"
done

echo "[3/3] merge scoreboard"
python3 scripts/merge_sf100_ledger.py "$OUT/oracle_results.json" \
  ORACLES_r11_sf100.json ORACLES_r12_sf100.json || true
cat "$OUT/oracle_results.json" 2>/dev/null || true
