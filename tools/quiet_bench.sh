#!/bin/bash
# Opportunistic scaling benchmark: run the official N vs 4N spark-submit pair
# only when the host is quiet (external neighbors share this box), append
# results to bench_runs.jsonl. Usage: quiet_bench.sh [iterations] [load_max]
set -e
cd "$(dirname "$0")/.."
ITER=${1:-6}
LOADMAX=${2:-6}
OUT=bench_runs.jsonl
REP=${REP:-8}
PAIR_N=${PAIR_N:-8}   # the official gate pair is 8→32
for i in $(seq "$ITER"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  if python -c "import sys; sys.exit(0 if float('$LOAD') < $LOADMAX else 1)"; then
    echo "iter $i: load $LOAD — running pair N=$PAIR_N REP=$REP" >&2
    REP=$REP N=$PAIR_N bash tools/submit_scaling.sh | tail -3 >> "$OUT"
    echo "---" >> "$OUT"
  else
    echo "iter $i: load $LOAD — too busy, sleeping" >&2
    sleep 120
  fi
done
