#!/bin/bash
# Container entry for graft.Serve: env-configured spark-submit.
# Mirrors the CLI contract documented in Serve.scala —
#   graft.Serve <spoolDir> <checkpointDir> <submitDir> <stateDir>
#               [--debug] [--order state-first|submit-first]
# Every knob is an env var so `docker run -e ...` is the whole
# interface; extra args after the image name pass straight through
# to spark-submit (e.g. --master spark://host:7077 for a real
# cluster instead of the single-container local mode default).
set -euo pipefail

SPARK_HOME="${SPARK_HOME:-/opt/spark}"
MASTER="${GRAFT_MASTER:-local[*]}"
SPOOL="${GRAFT_SPOOL_DIR:-/data/spool}"
CHECKPOINT="${GRAFT_CHECKPOINT_DIR:-/data/checkpoint}"
SUBMIT="${GRAFT_SUBMIT_DIR:-/data/submit}"
STATE="${GRAFT_STATE_DIR:-/data/state}"

ARGS=("$SPOOL" "$CHECKPOINT" "$SUBMIT" "$STATE")
if [[ "${GRAFT_DEBUG:-}" == "1" || "${GRAFT_DEBUG:-}" == "true" ]]; then
  ARGS+=("--debug")
fi
# sink crash-ordering: state-first (at-most-once, default) or
# submit-first (at-least-once) — see SubmitSink.scala. Validate here
# AND in Serve.main: the two orders have opposite crash semantics, so
# a typo must never silently fall back to the default.
if [[ -n "${GRAFT_ORDER:-}" ]]; then
  case "$GRAFT_ORDER" in
    state-first|submit-first) ARGS+=("--order" "$GRAFT_ORDER") ;;
    *) echo "GRAFT_ORDER must be state-first or submit-first," \
         "got '$GRAFT_ORDER'" >&2; exit 64 ;;
  esac
fi

exec "$SPARK_HOME/bin/spark-submit" \
  --master "$MASTER" \
  --class graft.Serve \
  --conf spark.sql.session.timeZone=UTC \
  --conf "spark.sql.extensions=graft.GraftExtensions" \
  "$@" \
  /opt/graft/graft.jar \
  "${ARGS[@]}"
