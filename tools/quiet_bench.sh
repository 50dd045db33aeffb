#!/bin/bash
# Opportunistic scaling benchmark: when the host is quiet (and no test suite
# is running), fire one batch = busy-loop hardware calibration + the 8→32
# (REP=16) and 4→16 (REP=8) spark-submit pairs, appending everything to
# bench_runs.jsonl. Each leg self-reports its hypervisor steal fraction
# (steal_pct) — judge a pair by BOTH legs' steal, not by loadavg, which
# cannot separate our own threads from neighbors and decays for minutes
# after any run. Usage: quiet_bench.sh [iterations] [load_max]
set -e
cd "$(dirname "$0")/.."
ITER=${1:-6}
LOADMAX=${2:-2.5}
OUT=bench_runs.jsonl
for i in $(seq "$ITER"); do
  LOAD=$(cut -d' ' -f1 /proc/loadavg)
  BUSY=$(pgrep -cf "pytest|check_oracles|bench.py" || true)
  OK=$(python -c "print(1 if float('$LOAD') < $LOADMAX and int('${BUSY:-0}') == 0 else 0)")
  if [ "$OK" = "1" ]; then
    # loadavg can't see hypervisor neighbors (they show up only as steal),
    # so probe instantaneous steal for 5 s before burning a ~15-min batch on
    # a window that was never actually quiet (the 2026-08-19 batch fired at
    # loadavg 0.4 into a 16%-steal storm and produced only invalid pairs)
    STEAL=$(python -c "
import time
from joern_spark.hostmetrics import steal_fraction_probe, steal_fraction
b = steal_fraction_probe(); time.sleep(5)
print(f'{steal_fraction(b) * 100:.2f}')")
    STOK=$(python -c "print(1 if float('$STEAL') < ${STEALMAX:-0.5} else 0)")
    if [ "$STOK" != "1" ]; then
      echo "iter $i: load $LOAD but steal $STEAL% — neighbors active, sleeping" >&2
      sleep 150
      continue
    fi
    echo "iter $i: load $LOAD — calibrating + firing pairs" >&2
    CAL=$(python tools/hw_calibration.py 5)
    echo "$CAL" >> "$OUT"
    # bandwidth gate (round 5): neighbors saturating the memory controller
    # are invisible to loadavg AND steal, but crater the low-width memcpy
    # points (quiet-day 4-proc memcpy ≈ 1278 units, poisoned days ≈ 640).
    # A pipeline pair fired into such a window measures the neighbor, not
    # the engine — skip unless the 4-proc point clears the floor.
    MEM4=$(echo "$CAL" | python -c "import json,sys; print(json.load(sys.stdin)['hw_calibration']['mem_points']['4'])")
    BWOK=$(python -c "print(1 if float('$MEM4') >= ${MEMMIN:-950} else 0)")
    if [ "$BWOK" != "1" ]; then
      echo "iter $i: 4-proc memcpy $MEM4 < ${MEMMIN:-950} — bandwidth neighbor active, sleeping" >&2
      sleep 150
      continue
    fi
    HW416=$(echo "$CAL" | python -c "import json,sys; print(json.load(sys.stdin)['hw_calibration']['eff']['4->16'])")
    HW832=$(echo "$CAL" | python -c "import json,sys; print(json.load(sys.stdin)['hw_calibration']['eff']['8->32'])")
    REP=16 N=8 HW_EFF=$HW832 bash tools/submit_scaling.sh | tail -3 >> "$OUT"
    echo "---" >> "$OUT"
    REP=8 N=4 HW_EFF=$HW416 bash tools/submit_scaling.sh | tail -3 >> "$OUT"
    echo "---" >> "$OUT"
  else
    echo "iter $i: load $LOAD busy=$BUSY — sleeping" >&2
    sleep 150
  fi
done
