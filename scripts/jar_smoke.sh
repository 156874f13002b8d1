#!/bin/bash
# Packaged-jar runtime smoke (VERDICT r9 #5): ServePackagingSpec
# gates the Dockerfile/entrypoint on STRUCTURE only — this script
# proves the artifact path live without a docker daemon:
#   sbt package -> launch graft.Serve FROM THE PACKAGED JAR (java -cp
#   jar:/opt/spark/jars/*, the same classpath contract the
#   Dockerfile's runtime stage encodes) -> POST one webhook track
#   point -> assert the CoT feature lands in the submit dir -> clean
#   shutdown. Fails (exit 1) if the jar's entry class, classpath
#   contract, or the webhook->transform->sink path breaks.
set -euo pipefail
cd "$(dirname "$0")/.."

WORK="$(mktemp -d /tmp/jar_smoke.XXXXXX)"
# SERVE_PID must exist before the trap can reference it under set -u:
# a phase-1 failure (sbt package) would otherwise error INSIDE the
# trap and leak $WORK (ADVICE r10)
SERVE_PID=""
trap 'kill ${SERVE_PID:-} 2>/dev/null || true; rm -rf "$WORK"' EXIT

echo "[1/4] sbt package"
sbt -batch package > "$WORK/package.log" 2>&1 || {
  tail -20 "$WORK/package.log"; echo "package FAILED"; exit 1; }
JAR=$(ls target/scala-2.13/*.jar | grep -v -- '-tests\.jar' | head -1)
[[ -n "$JAR" ]] || { echo "no main jar under target/scala-2.13"; exit 1; }
echo "      jar: $JAR"

echo "[2/4] launch graft.Serve from the packaged jar"
mkdir -p "$WORK"/{spool,ckpt,submit,state}
# the Dockerfile runtime contract: app jar + /opt/spark/jars on the
# classpath, entry class graft.Serve, positional dirs; no
# GRAFT_HTTP_PORT -> loopback + ephemeral port (read from the ready
# line), exactly the local/test default documented in Serve.scala
java \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.master='local[4]' \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.extensions=graft.GraftExtensions \
  -Dspark.ui.enabled=false \
  -cp "$JAR:/opt/spark/jars/*" graft.Serve \
  "$WORK/spool" "$WORK/ckpt" "$WORK/submit" "$WORK/state" \
  > "$WORK/serve.log" 2>&1 &
SERVE_PID=$!

echo "[3/4] wait for ready line, POST a track point"
PORT=""
for i in $(seq 1 120); do
  if ! kill -0 $SERVE_PID 2>/dev/null; then
    tail -30 "$WORK/serve.log"; echo "Serve died before ready"; exit 1
  fi
  PORT=$(grep -o '"serve":"ready","port":[0-9]*' "$WORK/serve.log" \
    | grep -o '[0-9]*$' || true)
  [[ -n "$PORT" ]] && break
  sleep 1
done
[[ -n "$PORT" ]] || { tail -30 "$WORK/serve.log";
  echo "no ready line after 120s"; exit 1; }
echo "      ready on port $PORT"

HTTP=$(curl -s -o "$WORK/resp" -w '%{http_code}' \
  -X POST "http://127.0.0.1:$PORT/hook1" \
  -H 'Content-Type: application/json' \
  -d '{"entityId": 42, "name": "n42", "alias": "a42", "deviceType": "inReach", "deviceId": 42, "trackPoint": {"time": 1704844800000, "isEmergency": false, "direction": 90.5, "point": {"x": 1.5, "y": 2.5}}}')
[[ "$HTTP" == "200" ]] || { cat "$WORK/resp";
  echo "webhook POST returned $HTTP, want 200"; exit 1; }
# invalid body must 400 (the TypeBox-gate analogue), proving the
# validator is live in the packaged build too
HTTP=$(curl -s -o /dev/null -w '%{http_code}' \
  -X POST "http://127.0.0.1:$PORT/hook1" \
  -H 'Content-Type: application/json' -d '{"nope":1}')
[[ "$HTTP" == "400" ]] || { echo "invalid body returned $HTTP, want 400"; exit 1; }

echo "[4/4] wait for the CoT row in the submit parquet"
# the sink writes parquet; poll with pyarrow (driver-side stack) for
# the transformed row: id inreach-42 (T2 computed key), msg_key
# id@ISO-time (T5 epoch->ISO), CoT course carried through
FOUND=""
for i in $(seq 1 90); do
  if python3 - "$WORK/submit" <<'EOF' 2>/dev/null; then FOUND=1; break; fi
import sys, glob
import pyarrow.parquet as pq
files = glob.glob(sys.argv[1] + "/*.parquet")
assert files, "no parquet yet"
t = pq.read_table(sys.argv[1])
rows = t.to_pylist()
assert any(r.get("id") == "inreach-42" and
           "42@2024-01-10T00:00:00" in str(r.get("msg_key", ""))
           for r in rows), f"no transformed row yet: {rows[:2]}"
EOF
  sleep 1
done
[[ -n "$FOUND" ]] || { ls -laR "$WORK/submit"; tail -30 "$WORK/serve.log";
  echo "no transformed CoT row in submit dir after 90s"; exit 1; }

kill $SERVE_PID; wait $SERVE_PID 2>/dev/null || true
echo "SMOKE PASSED: packaged jar serves webhook -> CoT transform -> submit sink"
