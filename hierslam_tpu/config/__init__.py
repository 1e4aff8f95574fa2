"""Config system.

Tier 1: executable Python config modules defining ``config = dict(...)``
with the reference schema (configs/replica/hierslam_semantic_run.py:24-153)
— files written for the reference work here unchanged (CUDA-only keys like
``primary_device`` are ignored).
Tier 2: YAML camera configs with recursive ``inherit_from``
(hierslam_tpu.datasets.base.load_dataset_config).

TPU-specific additions (all optional, sensible defaults):
``map_capacity`` (static Gaussian slot count), ``raster`` (tile_shape /
max_per_tile / gaussian_chunk / tile_batch overrides).

Unlike the reference, the semantic channel count is NOT a compile-time
constant (cuda_rasterizer/config.h:18) — no rebuild when switching trees.
"""
from __future__ import annotations

import os
from importlib.machinery import SourceFileLoader
from typing import Dict

from hierslam_tpu.ops.rasterize import RasterConfig


def load_config(path: str) -> Dict:
    module = SourceFileLoader(os.path.basename(path), path).load_module()
    return module.config


def apply_defaults(config: Dict) -> Dict:
    """Default patching the reference driver does at startup
    (scripts/hierslam.py:1499-1505, 1540-1563)."""
    config = dict(config)
    tr = dict(config.get("tracking", {}))
    tr.setdefault("use_depth_loss_thres", False)
    tr.setdefault("depth_loss_thres", 100000)
    tr.setdefault("visualize_tracking_loss", False)
    config["tracking"] = tr
    config.setdefault("gaussian_distribution", "isotropic")
    data = dict(config.get("data", {}))
    data.setdefault("ignore_bad", False)
    data.setdefault("use_train_split", True)
    config["data"] = data
    config.setdefault("map_capacity", 2_000_000)
    config.setdefault("seed", 0)
    config.setdefault("report_global_progress_every", 500)
    config.setdefault("checkpoint_interval", 500)
    config.setdefault("save_checkpoints", False)
    config.setdefault("load_checkpoint", False)
    config.setdefault("checkpoint_time_idx", 0)
    config.setdefault("use_wandb", False)
    config.setdefault("eval_every", 5)
    return config


def raster_config(config: Dict) -> RasterConfig:
    r = config.get("raster", {})
    mtg = r.get("max_tiles_per_gaussian", 16)
    return RasterConfig(
        tile_shape=tuple(r.get("tile_shape", (16, 16))),
        max_per_tile=r.get("max_per_tile", 1024),
        gaussian_chunk=r.get("gaussian_chunk", 256),
        tile_batch=r.get("tile_batch", 64),
        bin_chunk=r.get("bin_chunk", 16384),
        max_tiles_per_gaussian=mtg,
        # gradient routes must cover every emitted (tile, slot) pair
        max_refs=r.get("max_refs", mtg),
        backend=r.get("backend", "pallas"),
        grad_pair_budget=r.get("grad_pair_budget", 0),
        grad_bf16=r.get("grad_bf16", False),
        track_max_per_tile=r.get("track_max_per_tile", 0),
        escalate_tiles=r.get("escalate_tiles", 0),
        escalate_k=r.get("escalate_k", 0),
        densify_max_per_tile=r.get("densify_max_per_tile", 0),
        bucket_spec=(
            tuple(tuple(e) for e in r["bucket_spec"])
            if r.get("bucket_spec") else None
        ),
        track_bucket_spec=(
            tuple(tuple(e) for e in r["track_bucket_spec"])
            if r.get("track_bucket_spec") else None
        ),
        sat_margin=r.get("sat_margin", 0.0),
        sat_floor=r.get("sat_floor", 64),
        track_sat_margin=r.get("track_sat_margin", -1.0),
        visible_budget=r.get("visible_budget", 0),
        stream_rows=r.get("stream_rows", 0),
        stream_cap=r.get("stream_cap", 4096),
    )
