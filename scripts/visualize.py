"""Reconstruction replay CLI — the viz_scripts/ entry points of the
reference (online_recon.py, final_recon.py, online_recon_sem_*.py) in one
command.

    python scripts/visualize.py <config.py> [--params <params.npz>]
        [--mode online|final] [--every N] [--frames-only] [--semantic]

With open3d installed, opens the interactive Open3D replay window; with
``--frames-only`` (or headless), renders PNG frames along the trajectory
into <workdir>/<run_name>/viz/.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--params", default=None, help="path to params.npz")
    ap.add_argument("--mode", choices=("online", "final"), default="online")
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--frames-only", action="store_true")
    ap.add_argument("--semantic", action="store_true")
    ap.add_argument("--viz-scale", type=float, default=0.5)
    args = ap.parse_args()

    from hierslam_tpu.config import load_config

    config = load_config(args.config)
    run_dir = os.path.join(config["workdir"], config["run_name"])
    path = args.params or os.path.join(run_dir, "params.npz")
    params = dict(np.load(path))

    online = args.mode == "online"

    # semantic decode assets (online_recon_sem_replica.py:27-45 loads the
    # conv decoder + palette): the saved semantic_decoder.npz when present,
    # a deterministic palette otherwise
    mlp, colormap, num_semantic = None, None, None
    if args.semantic and "semantic" in params:
        from hierslam_tpu.datasets.tree import label_colormap

        dec = os.path.join(run_dir, "semantic_decoder.npz")
        if os.path.isfile(dec):
            mlp = dict(np.load(dec))
            n_cls = mlp["w"].shape[0]
        else:
            ns = config.get("data", {}).get("num_semantic")
            num_semantic = ns if isinstance(ns, (list, tuple)) else None
            n_cls = (ns[-1] if isinstance(ns, (list, tuple))
                     else int(params["semantic"].shape[1]))
        colormap = label_colormap(max(int(n_cls), 2))

    try:
        if args.frames_only:
            raise ImportError("frames-only requested")
        import open3d  # noqa: F401

        from hierslam_tpu.viz.recon import interactive_replay

        interactive_replay(
            params, config, every=args.every, online=online,
            viz_scale=args.viz_scale, semantic=args.semantic,
            mlp=mlp, colormap=colormap, num_semantic=num_semantic,
        )
    except ImportError:
        from hierslam_tpu.viz.recon import render_trajectory_frames

        out = render_trajectory_frames(
            params, os.path.join(run_dir, "viz"), config,
            every=args.every, viz_scale=args.viz_scale, online=online,
            semantic=args.semantic, mlp=mlp, colormap=colormap,
            num_semantic=num_semantic,
        )
        print(f"wrote replay frames to {out}")


if __name__ == "__main__":
    main()
