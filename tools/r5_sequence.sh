#!/bin/bash
# Round-5 real-scale quality runs at the SHIPPED stream-mapping config.
# ONE process at a time (axon relay discipline).
# Usage: bash tools/r5_sequence.sh [logdir]
set -u
LOG=${1:-/tmp/r5_rs}
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

# 1. full SLAM at the shipped config (stream mapping backend,
#    REAL_SHAPE_r05 candidate); 200 frames at 1200x680.
run full env RS_SAT_MARGIN=2.0 RS_BUDGET=4100000 timeout 10800 \
    python tools/real_shape_run.py --frames 200 --workdir /tmp/proc_room_run_r5

# 2. GT-pose upper-bound calibration: same sequence, tracking replaced by
#    GT poses — separates tracker error from raster truncation / densify
#    bloat.
run gtpose env RS_SAT_MARGIN=2.0 RS_BUDGET=4100000 timeout 10800 \
    python tools/real_shape_run.py --frames 200 --gt-poses \
    --workdir /tmp/proc_room_run_r5

echo "SEQUENCE DONE $(date +%H:%M:%S)" | tee -a "$LOG/sequence.log"
