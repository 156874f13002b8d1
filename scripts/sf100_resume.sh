#!/bin/bash
# Round-12 campaign resume: the r12 session's API transport died mid-leg
# (after q_pareto_abc, 6/10 dumps + solo walls done). This script is
# idempotent: it finishes the pinned batch-JVM verify leg for whatever
# dumps are still missing, then hands off to sf100_tail.sh (sf10
# same-session ratio walls -> strictly-serial big-mem oracles -> ledger
# merge). Safe to re-run; every step keys off on-disk state.
set -uo pipefail
cd "$(dirname "$0")/.."

DST="${1:-target/sfsynth/sf100}"
OUT="${2:-/tmp/soak_sf100}"
HEAP="${SOAK_HEAP:-48g}"

# cheapest-first (r11 walls: tfidf 192s < clusters 283 < containment
# 460 < rolling 935) so partial progress is maximized if interrupted
REMAIN=(q_text_tfidf q_dedup_clusters q_dedup_containment q_rolling_distinct_users)

JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests\.jar' | head -1)
mapfile -t OPENS < <(for p in java.lang java.lang.invoke java.lang.reflect \
    java.io java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
    sun.security.action sun.util.calendar; do
  echo "--add-opens=java.base/$p=ALL-UNNAMED"; done)

TODO=""
for Q in "${REMAIN[@]}"; do
  if [[ -f "$OUT/$Q/_SUCCESS" ]]; then
    echo "[resume] $Q: already dumped, skipping"; continue
  fi
  TODO="${TODO:+$TODO,}$Q"
done

if [[ -n "$TODO" ]]; then
  echo "[resume] pinned batch-JVM verify leg ($HEAP): $TODO"
  java "${OPENS[@]}" -Xms"$HEAP" -Xmx"$HEAP" -XX:+AlwaysPreTouch \
    -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -Dspark.io.compression.codec=zstd \
    -cp "$JAR:/opt/spark/jars/*" graft.Verify "$PWD/$DST" "$OUT" \
    "$TODO" 2> "$OUT/verify_resume.stderr"
  grep '\[verify-time\]' "$OUT/verify_resume.stderr" || true
fi

exec bash scripts/sf100_tail.sh "$OUT"
