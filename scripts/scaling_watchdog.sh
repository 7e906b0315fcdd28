#!/bin/bash
# Load-gated scaling measurement: waits for a genuinely quiet window
# (1-min load < 0.5 AND 15-min < 2.5) before firing scripts/
# scaling_bench.py once, then exits. This is the protocol that produced
# the clean 4v16 passes (BENCH/BASELINE.md r3-d/r3-h): on a shared host
# the saturating level's critical path absorbs any co-tenant burst, so
# only windows this quiet yield interpretable N-vs-4N ratios.
#
# Usage: scripts/scaling_watchdog.sh [turns] [n_cores] > log 2>&1 &
TURNS="${1:-8000000}"
NCORES="${2:-4}"
for i in $(seq 1 160); do            # up to ~80 minutes of waiting
  read l1 l5 l15 rest < /proc/loadavg
  ok=$(python3 -c "print(1 if float('$l1')<0.5 and float('$l15')<2.5 else 0)")
  if [ "$ok" = "1" ]; then
    echo "window found at $(date -u): $l1 $l5 $l15"
    cd "$(dirname "$0")/.."
    echo "load_before: $(cat /proc/loadavg)"
    python scripts/scaling_bench.py "$TURNS" "$NCORES"
    echo "load_after: $(cat /proc/loadavg)"
    date -u
    exit 0
  fi
  sleep 30
done
echo "no quiet window found by $(date -u)"
exit 1
