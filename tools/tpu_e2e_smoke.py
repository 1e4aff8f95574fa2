"""Run the full SLAMRunner + graft entry on the REAL TPU (small fabricated
scene) — validates that every jitted step compiles and executes on hardware,
not just on the CPU interpreter."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from fabricate import fabricate_replica
from test_e2e import small_config

import jax

print("devices:", jax.devices(), flush=True)

base = "/tmp/tpu_smoke"
os.system(f"rm -rf {base}")
basedir, seq, _ = fabricate_replica(base + "/data", n_frames=5, semantic=True)
cfg = small_config(basedir, seq, workdir=base + "/out")
cfg["tracking"]["num_iters"] = 10
cfg["mapping"]["num_iters"] = 10

from hierslam_tpu.slam.pipeline import run_slam

t0 = time.time()
params_np, summary, results = run_slam(cfg, do_eval=True)
print("slam+eval ok in", round(time.time() - t0, 1), "s", flush=True)
print("summary:", summary, flush=True)
print("results:", results, flush=True)

# graft entry forward on the real chip
import __graft_entry__ as ge

fn, args = ge.entry()
out = jax.jit(fn)(*args)
print("entry ok:", [tuple(o.shape) for o in out], float(out[0].sum()), flush=True)
print("TPU E2E SMOKE PASSED", flush=True)
