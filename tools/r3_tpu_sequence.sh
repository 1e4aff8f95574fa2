#!/bin/bash
# Round-3 TPU measurement sequence. ONE process at a time (axon relay
# discipline: never two concurrent TPU processes, never kill one).
# Usage: bash tools/r3_tpu_sequence.sh [logdir]
set -u
LOG=${1:-/tmp/r3_seq}
mkdir -p "$LOG"
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a "$LOG/sequence.log"
  "$@" > "$LOG/$name.log" 2>&1
  echo "=== $name EXIT=$? ($(date +%H:%M:%S)) ===" | tee -a "$LOG/sequence.log"
}

# 0. availability gate: retry until the relay answers (cheap probe)
until timeout 300 python -c "import jax; jax.devices()" 2>/dev/null; do
  echo "relay not ready $(date +%H:%M:%S)" | tee -a "$LOG/sequence.log"
  sleep 120
done
echo "relay up $(date +%H:%M:%S)" | tee -a "$LOG/sequence.log"

# 1. e2e smoke (verify surface) on the bucketed+compacted code
run smoke timeout 2700 python tools/tpu_e2e_smoke.py

# 2. graft entry compile check
run entry timeout 1800 python -c "import __graft_entry__ as g; import jax; fn,a=g.entry(); r=jax.jit(fn)(*a); jax.block_until_ready(r); print('entry OK')"

# 3. tracking probe at N=2M, shipped track ladder
run track env PROBE_BUCKETS=128:1024,384:512,-1:128 PROBE_SAT_MARGIN=2.0 PROBE_SAT_FLOOR=128 \
    timeout 2700 python tools/track_probe.py 2000000 512 40

# 4. mapping probe at N=2M, shipped ladder + compaction
run map env PROBE_BUCKETS=128:4096,384:1024,768:512,-1:256 PROBE_SAT_MARGIN=2.0 \
    PROBE_SAT_FLOOR=128 PROBE_PAIR_BUDGET=2000000 PROBE_BF16=1 PROBE_VIS=1500000 \
    timeout 3600 python tools/map_probe.py 2000000 1024 24 60 26

# 5. device-trace profile at the same config (attribution for next levers)
run profile env PROFILE_N=2000000 PROFILE_K=1024 PROFILE_PAIR_BUDGET=2000000 \
    PROFILE_BF16=1 PROFILE_BUCKETS=128:4096,384:1024,768:512,-1:256 \
    PROFILE_SAT_MARGIN=2.0 PROFILE_SAT_FLOOR=128 PROFILE_VIS=1500000 \
    timeout 3600 python tools/profile_map.py /tmp/map_trace_r3seq

# 6. full bench at the shipped config (the driver metric)
run bench timeout 5400 python bench.py

echo "SEQUENCE DONE $(date +%H:%M:%S)" | tee -a "$LOG/sequence.log"
