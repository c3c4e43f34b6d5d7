#!/bin/bash
# Sequenced mega2 primitive probes; one process per probe so a wedged
# remote compile is attributable.  Stops at the first hang (the tunnel
# needs ~35 min to recover after one).
LOG=${1:-/tmp/probe2.log}
for p in scalar_stack relayout onehot_mm gather8 gather_state gather_rows gather_lane gather_tex; do
  echo "=== $p $(date +%T)" >> "$LOG"
  PYTHONPATH=/root/repo:/root/.axon_site timeout 290 python -u tools/probe2.py "$p" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" >> "$LOG"
  if [ $rc -ne 0 ]; then
    echo "PROBE $p FAILED/HUNG (rc=$rc) — stopping" >> "$LOG"
    exit 1
  fi
done
echo "ALL PROBES DONE $(date +%T)" >> "$LOG"
