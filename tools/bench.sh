#!/usr/bin/env bash
# Bench wrapper: runs graft.Bench via sbt and guarantees the compact
# bench JSON is the LAST line on stdout, no matter what sbt banners or
# straggler Spark threads print after it. The full per-query map stays
# in /tmp/graft_bench.json.
#
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/bench.sh
set -o pipefail
cd "$(dirname "$0")/.."
out=$(sbt -batch "runMain graft.Bench" 2>&1)
rc=$?
printf '%s\n' "$out"
line=$(printf '%s\n' "$out" | grep -o '{"metric":"total".*}' | tail -1)
if [ -n "$line" ]; then
  printf '%s\n' "$line"
elif [ -f /tmp/graft_bench.json ]; then
  cat /tmp/graft_bench.json
fi
exit $rc
