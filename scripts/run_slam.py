#!/usr/bin/env python
"""Run SLAM from a Python config module.

Usage: python scripts/run_slam.py configs/replica/hierslam_semantic_run.py
(same CLI contract as the reference's scripts/hierslam.py:2239-2264).
"""
import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str, help="Path to config .py file")
    parser.add_argument("--no-eval", action="store_true")
    args = parser.parse_args()

    from hierslam_tpu.config import load_config
    from hierslam_tpu.slam.pipeline import run_slam
    from hierslam_tpu.utils.io import seed_everything

    config = load_config(args.experiment)
    seed_everything(config.get("seed", 0))

    results_dir = os.path.join(config["workdir"], config["run_name"])
    config["results_dir"] = results_dir
    if not config.get("load_checkpoint", False):
        os.makedirs(results_dir, exist_ok=True)
        shutil.copy(args.experiment, os.path.join(results_dir, "config.py"))

    t0 = time.time()
    run_slam(config, do_eval=not args.no_eval)
    dt = time.time() - t0
    print(f"total SLAM time: {dt:.1f}s ({dt/60:.2f} min)")


if __name__ == "__main__":
    main()
