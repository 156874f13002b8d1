#!/bin/bash
# State-larger-than-heap streaming soak (VERDICT r10 #2): run the
# latest-cache fMGWS twin with millions of keys in a 512 MB JVM.
#   leg 1 (rocksdb): must complete AND match the batch ground truth
#     (graft.StateSoak exits 0 only on an exact two-way EXCEPT match).
#   leg 2 (default provider, negative control): the HDFS-backed
#     provider holds state maps on heap, so the SAME run must die
#     (OOM) — proving leg 1 ran in the state > heap regime.
#
# Usage: state_soak.sh [nKeys=3000000] [heap=512m]
# Exit 0 = soak passed (rocksdb green, default OOM'd);
#      1 = rocksdb leg failed (completion or parity);
#      2 = inconclusive (default leg survived — state fit the heap;
#          raise nKeys).
set -euo pipefail
cd "$(dirname "$0")/.."

NKEYS="${1:-3000000}"
HEAP="${2:-512m}"
WORK="$(mktemp -d /tmp/state_soak.XXXXXX)"
trap 'rm -rf "$WORK"' EXIT

echo "[1/3] sbt package"
sbt -batch package > "$WORK/package.log" 2>&1 || {
  tail -20 "$WORK/package.log"; echo "package FAILED"; exit 1; }
JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests\.jar' | head -1)

mapfile -t OPENS < <(for p in java.lang java.lang.invoke java.lang.reflect \
    java.io java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs \
    sun.security.action sun.util.calendar; do
  echo "--add-opens=java.base/$p=ALL-UNNAMED"; done)

run_leg() { # $1 = provider
  java "${OPENS[@]}" -Xmx"$HEAP" -XX:+ExitOnOutOfMemoryError \
    -Dspark.ui.enabled=false \
    -cp "$JAR:/opt/spark/jars/*" graft.StateSoak "$1" "$NKEYS" "$WORK" \
    > "$WORK/$1.log" 2>&1
}

echo "[2/3] rocksdb leg: $NKEYS keys under -Xmx$HEAP (must complete + match)"
if run_leg rocksdb; then
  grep '"soak"' "$WORK/rocksdb.log"
else
  echo "ROCKSDB LEG FAILED:"; tail -30 "$WORK/rocksdb.log"; exit 1
fi

echo "[3/3] default-provider negative control (must OOM)"
if run_leg default; then
  grep '"soak"' "$WORK/default.log" || true
  echo "INCONCLUSIVE: default provider survived $NKEYS keys in $HEAP —"
  echo "state fit the heap, so the rocksdb leg proved nothing; raise nKeys"
  exit 2
fi
if grep -qi "OutOfMemory\|GC overhead\|Java heap space" "$WORK/default.log"; then
  echo "      default leg died with OOM as expected"
else
  echo "      default leg died (non-OOM failure — inspect):"
  tail -15 "$WORK/default.log"
  exit 2
fi

echo "STATE SOAK PASSED: RocksDB completed + matched ground truth where the default provider OOM'd"
