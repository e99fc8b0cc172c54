#!/usr/bin/env bash
# One coherent measurement campaign for the consolidated ledger
# (BASELINE_CELLS.json): fresh DuckDB + Spark sessions at sf0.1 / sf1 /
# sf10 on current code, all sequential (never two measured processes at
# once — concurrent compares/benches poison each other's cells).
#
#   tools/ledger_campaign.sh [phase]
#
# Phases: sf01 sf1 sf10 plans (default: all in order). Expects /tmp/sf1
# and /tmp/sf10 fixtures (tools/make_sf1.py) for the big phases. The
# plans phase records AQE-final plan shapes per query into the ledger
# (graft.tools.PlanFingerprints) for bench_check.py --plans drift diffs.
set -euo pipefail
cd "$(dirname "$0")/.."

OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

bench() { # bench <sfdir> <out.json> [env pairs...]
  local sf="$1" out="$2"; shift 2
  env "$@" SPARK_GRAFT_SF_DIR="$sf" java $OPENS -Xmx48g -cp "$CP" graft.Bench \
    2>/dev/null | tail -1 > "$out"
  echo "bench $sf -> $out: $(python3 -c "import json;print(json.load(open('$out'))['value'])")s"
}

phase="${1:-all}"

if [[ "$phase" == "sf01" || "$phase" == "all" ]]; then
  echo "=== sf0.1: verify (lands artifacts + oracle dump) ==="
  java $OPENS -Xmx48g -cp "$CP" graft.Verify /root/testdata/sf0.1 /tmp/led_v01 \
    2>/dev/null | tail -1
  echo "=== sf0.1: duckdb, two sessions, min-of-3 ==="
  for s in 1 2; do
    python3 tools/duck_bench.py /root/testdata/sf0.1 /tmp/led_v01/oracle_sql.json all 3 \
      2>/dev/null | tail -1 > /tmp/led_duck01_$s.json
  done
  echo "=== sf0.1: spark, three fresh-JVM sessions ==="
  for s in 1 2 3; do bench /root/testdata/sf0.1 /tmp/led_spark01_$s.json; done
  python3 tools/ledger.py merge-duck  sf0.1 /tmp/led_duck01_1.json /tmp/led_duck01_2.json
  python3 tools/ledger.py merge-spark sf0.1 /tmp/led_spark01_1.json /tmp/led_spark01_2.json /tmp/led_spark01_3.json
fi

if [[ "$phase" == "sf1" || "$phase" == "all" ]]; then
  echo "=== sf1: verify ==="
  SPARK_GRAFT_CPUS=32 java $OPENS -Xmx48g -cp "$CP" graft.Verify /tmp/sf1 /tmp/led_v1 \
    2>/dev/null | tail -1
  echo "=== sf1: duckdb — light set min-of-3, heavy set min-of-1 ==="
  LIGHT=$(python3 - <<'EOF'
import json
qs = sorted(json.load(open('/tmp/led_v1/oracle_sql.json')))
heavy = {'q35_ngram_jaccard', 'q41_range_join', 'q60_neardup_clusters',
         'q85_token_chunks', 'q59_ingest_landing'}
print(','.join(q for q in qs if q not in heavy))
EOF
)
  python3 tools/duck_bench.py /tmp/sf1 /tmp/led_v1/oracle_sql.json "$LIGHT" 3 \
    2>/dev/null | tail -1 > /tmp/led_duck1_light.json
  python3 tools/duck_bench.py /tmp/sf1 /tmp/led_v1/oracle_sql.json \
    q35_ngram_jaccard,q41_range_join 1 2>/dev/null | tail -1 > /tmp/led_duck1_heavy.json
  echo "=== sf1: spark, two fresh sessions ==="
  for s in 1 2; do bench /tmp/sf1 /tmp/led_spark1_$s.json; done
  python3 tools/ledger.py merge-duck  sf1 /tmp/led_duck1_light.json /tmp/led_duck1_heavy.json
  python3 tools/ledger.py merge-spark sf1 /tmp/led_spark1_1.json /tmp/led_spark1_2.json
fi

if [[ "$phase" == "sf10" || "$phase" == "all" ]]; then
  echo "=== sf10: one full spark session + solo min-of-3 on the heavy cells ==="
  # stale per-query files from an earlier campaign run in this session
  # (possibly on older code) must not fold into the minima
  rm -f /tmp/led_spark10_q*.json
  bench /tmp/sf10 /tmp/led_spark10_full.json
  for q in q55_multiprobe_pairs q41_range_join q35_ngram_jaccard q37_ann_sim_join q39_neardup_dedup; do
    bench /tmp/sf10 /tmp/led_spark10_$q.json \
      SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_REPS=3
  done
  python3 tools/ledger.py merge-spark sf10 /tmp/led_spark10_full.json /tmp/led_spark10_q*.json
fi

if [[ "$phase" == "plans" || "$phase" == "all" ]]; then
  echo "=== plan fingerprints (AQE-final shapes -> ledger, bench_check --plans diffs them) ==="
  for sf in /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10; do
    [[ -d "$sf" ]] || { echo "skip $sf (no fixtures)"; continue; }
    name=$(basename "$sf")
    SPARK_GRAFT_SF_DIR="$sf" java $OPENS -Xmx48g -cp "$CP" \
      graft.tools.PlanFingerprints /tmp/plan_fp_$name.json 2>/dev/null | tail -1 >/dev/null
    python3 tools/ledger.py merge-plans "$name" /tmp/plan_fp_$name.json
  done
fi
echo "campaign phase '$phase' done"
