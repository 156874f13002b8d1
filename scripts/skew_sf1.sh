#!/bin/bash
# sf1-hot skew leg (VERDICT r10 #6): run the SkewScalingSpec gates
# that need a million-row hot key. Synthesizes the sf1 base if the
# soak has not already left one, then runs the env-gated tests (they
# CANCEL without SPARK_GRAFT_SKEW_SF1, so plain `sbt test` stays
# fast). The twin itself is built by the spec into
# /tmp/graft_skew_sf1hot_v1 (marker-cached).
#
# Usage: skew_sf1.sh [srcDir=/root/testdata/sf0.1]
set -euo pipefail
cd "$(dirname "$0")/.."

SRC="${1:-/root/testdata/sf0.1}"
if [[ ! -f target/sfsynth/sf1/lineitem.parquet ]]; then
  echo "[1/2] synthesize sf1 (10 copies of $SRC)"
  python3 scripts/scale_testdata.py "$SRC" target/sfsynth/sf1 10
else
  echo "[1/2] sf1 base present, reusing"
fi

echo "[2/2] run the sf1-hot gates"
SPARK_GRAFT_SKEW_SF1=1 sbt -batch \
  'testOnly graft.SkewScalingSpec -- -z "sf1-hot"'
