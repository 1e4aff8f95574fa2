"""Minimal repro for the narrow-table pad+barrier+gather TPU fault.

History. Round 4: the stream mapping phase with its packed parameter
table stored at the USED width (40 of 128 lanes) and visible-rank
compaction reliably killed the TPU worker ("TPU worker process crashed
or restarted") at N=2M, while width 128 ran, and width 40 WITHOUT
compaction ran.  Round 5 narrowed the trigger: the same fault fires with
a width-128 gather path as soon as the program contains the composition

    optimization_barrier(pad([N, 40] -> [N, 128]))  ->  row gather [V]

inside the iteration scan (the pattern ``aligned_gather_rows`` uses to
keep narrow tables on the full-lane gather path, and the pattern a
narrow scan carry needs to avoid XLA narrowing the compaction gather).
Compiler memory analysis puts that program at temp 7.7 GiB — well inside
the chip — while a 6.7 GiB variant without the composition runs, so the
crash is not HBM pressure.  The production mapper now avoids the
composition entirely (full-width table carry + used-width Adam moments,
slam/mapping.py), which runs at N=2M with the full 24-frame window.

This script owns the repro matrix.  Each cell runs in a SUBPROCESS (a
crash takes the whole TPU client down).  Cells:

    plain   — [N,128] table -> compact gather -> reduce, in a scan (runs)
    padbar  — [N,40] table -> barrier(pad) -> compact gather -> reduce
              (the suspected-fault composition)

Usage:
    python tools/stream_width_repro.py                 # both cells, N=2M
    REPRO_CELLS=padbar REPRO_N=1000000 python tools/stream_width_repro.py
    REPRO_ITERS=20 python tools/stream_width_repro.py

Prints one JSON line; human log on stderr.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, os.environ["REPRO_REPO"])
import numpy as np
import jax, jax.numpy as jnp
from hierslam_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

MODE = os.environ["REPRO_MODE"]          # "plain" | "padbar"
N = int(os.environ.get("REPRO_N", "2000000"))
V = int(os.environ.get("REPRO_V", "1500000"))
CW = int(os.environ.get("REPRO_CW", "40"))
ITERS = int(os.environ.get("REPRO_ITERS", "60"))

key = jax.random.PRNGKey(0)
vis = jnp.arange(V, dtype=jnp.int32)     # permutation prefix, like rank binning
tab_full = jax.random.normal(key, (N, 128), jnp.float32)
tab_narrow = tab_full[:, :CW]

def body_plain(tab, _):
    c = tab[vis]                          # [V, 128] full-lane row gather
    loss = jnp.sum(c[:, :CW]) * 1e-9
    tab = tab - loss * 1e-6               # keep the carry live
    return tab, loss

def body_padbar(tab, _):
    t128 = jax.lax.optimization_barrier(
        jnp.pad(tab, ((0, 0), (0, 128 - CW)))
    )
    c = t128[vis]                         # [V, 128] gather of the padded table
    loss = jnp.sum(c[:, :CW]) * 1e-9
    tab = tab - loss * 1e-6
    return tab, loss

if MODE == "plain":
    tab0, body = tab_full, body_plain
else:
    tab0, body = tab_narrow, body_padbar

@jax.jit
def run(tab):
    tab, losses = jax.lax.scan(body, tab, None, length=ITERS)
    return losses[-1]

t0 = time.time()
l = float(run(tab0))
print(f"OK loss={l:.6f} wall={time.time()-t0:.1f}s", flush=True)
"""


def run_cell(mode, iters):
    env = dict(os.environ)
    env.update(REPRO_REPO=REPO, REPRO_MODE=mode,
               REPRO_ITERS=str(iters))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", CHILD], env=env, capture_output=True,
            text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        return dict(status="timeout")
    tail = (proc.stdout + proc.stderr)[-2000:]
    if proc.returncode == 0 and "OK loss=" in proc.stdout:
        return dict(status="ok", tail=proc.stdout.strip().splitlines()[-1])
    crash = ("TPU worker process crashed" in tail) or proc.returncode < 0
    return dict(status="crash" if crash else "error",
                rc=proc.returncode, tail=tail[-600:])


def main():
    iters = int(os.environ.get("REPRO_ITERS", "60"))
    cells = os.environ.get("REPRO_CELLS", "plain,padbar").split(",")
    results = []
    for mode in cells:
        print(f"[repro] {mode} ...", file=sys.stderr, flush=True)
        r = run_cell(mode, iters)
        r["mode"] = mode
        print(f"[repro]   -> {r['status']} {r.get('tail', '')[:200]}",
              file=sys.stderr, flush=True)
        results.append(r)
    print(json.dumps({"iters": iters, "cells": results}))


if __name__ == "__main__":
    main()
