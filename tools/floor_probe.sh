#!/usr/bin/env bash
# Floor probe: measures the per-query FIXED overhead of the engine
# session ("the floor") via the five cheapest bench queries, min-of-5
# reps, in a fresh JVM. Run it BEFORE and AFTER any GraftSession config
# change and record both lines in BASELINE.md — the r7 AQE change
# shifted the whole-suite floor by +17% and tripled q59 without any
# per-query code change; this probe makes that class of drift visible
# BEFORE a round's bench locks it in.
#
# Usage: tools/floor_probe.sh [sfdir]   (default /root/testdata/sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
CLASSES="target/scala-2.13/classes"
if [[ ! -d "$CLASSES" ]]; then
  echo "floor_probe: $CLASSES missing — run 'sbt compile' first" >&2
  exit 1
fi
if [[ ! -d "$SF" ]]; then
  echo "floor_probe: sf dir '$SF' does not exist" >&2
  exit 1
fi
FLOOR_QUERIES="q25,q45,q50,q53,q62"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED"
# stderr goes to a log, not /dev/null: a failed run (OOM, stale
# classes, bad sf dir) must leave its diagnostics somewhere findable
ERRLOG="${FLOOR_PROBE_ERRLOG:-/tmp/floor_probe.err}"
if ! SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$FLOOR_QUERIES" \
  SPARK_GRAFT_BENCH_REPS=5 \
  java $OPENS -Xmx8g -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Bench 2>"$ERRLOG"; then
  echo "floor_probe: bench run failed — diagnostics in $ERRLOG" >&2
  exit 1
fi
