#!/bin/bash
# Round-3 real-scale quality runs (run AFTER tools/r3_tpu_sequence.sh).
# ONE process at a time (axon relay discipline).
# Usage: bash tools/r3_realshape_sequence.sh [logdir]
set -u
LOG=${1:-/tmp/r3_rs}
mkdir -p "$LOG"
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOG/sequence.log"
  "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name EXIT=$? ($(date +%H:%M:%S)) ===" | tee -a "$LOG/sequence.log"
}

until timeout 300 python -c "import jax; jax.devices()" 2>/dev/null; do
  echo "relay not ready $(date +%H:%M:%S)" | tee -a "$LOG/sequence.log"
  sleep 120
done
echo "relay up $(date +%H:%M:%S)" | tee -a "$LOG/sequence.log"

# 1. full SLAM at the shipped config (REAL_SHAPE_r03 candidate):
#    saturation-aware bucketed ladder + visible compaction + capacity
#    remediation; 200 frames at 1200x680.
run full env RS_SAT_MARGIN=2.0 timeout 7200 \
    python tools/real_shape_run.py --frames 200 --workdir /tmp/proc_room_run_r3

# 2. GT-pose upper-bound calibration (VERDICT r2 item 5): same sequence,
#    tracking replaced by GT poses — separates tracker error from raster
#    truncation / densify bloat.
run gtpose env RS_SAT_MARGIN=2.0 timeout 7200 \
    python tools/real_shape_run.py --frames 200 --gt-poses \
    --workdir /tmp/proc_room_run_r3

echo "SEQUENCE DONE $(date +%H:%M:%S)" | tee -a "$LOG/sequence.log"
