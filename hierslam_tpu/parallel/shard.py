"""Multi-chip SPMD steps via shard_map over an ICI mesh.

Two TPU-native scaling strategies for Gaussian-splatting SLAM (the
reference has none — SURVEY.md §2.3):

* **Keyframe-data-parallel mapping** (`make_dp_mapping_step`): each device
  renders/differentiates a different keyframe of the mapping window against
  the replicated Gaussian map; per-frame gradients are combined with one
  ``psum`` riding ICI, followed by a replicated Adam update.  This is the
  batched generalization of the reference's one-random-frame-per-iteration
  mapping (scripts/hierslam.py:1986-1989): batch size = mesh size.

* **Tile-sharded rendering** (`make_tile_sharded_render`): the image's tile
  rows are sharded across devices (sequence/pixel parallelism); Gaussians
  are replicated, each device bins and blends only its strip, and outputs
  concatenate without any cross-device blending (alpha compositing is
  pixel-local).  Backward induces a single gradient ``psum``.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import LossConfig, mapping_loss, render_gaussians


def make_dp_mapping_step(
    mesh: Mesh,
    camera,
    loss_cfg: LossConfig,
    raster_cfg: RasterConfig,
    lrs: Dict[str, float],
    axis: str = "data",
):
    """Build a jitted data-parallel mapping step.

    ``batch`` is a dict of per-frame arrays with a leading device-sharded
    axis of size ``mesh.shape[axis]``: im [D,3,H,W], depth [D,H,W], labels
    [D,L,H,W] (optional), quat [D,4], trans [D,3].
    Returns ``(params, opt_state, mlp, mlp_state, loss)``.
    """
    with_sem = bool(loss_cfg.sem_levels)
    n_dev = mesh.shape[axis]

    def device_fn(gp, active, batch, mlp, it):
        # one shard: leading axis 1
        frame = jax.tree_util.tree_map(lambda x: x[0], batch)

        def loss_fn(gp_, mlp_):
            out = render_gaussians(
                gp_, active, frame["quat"], frame["trans"], camera, raster_cfg,
                with_semantic=with_sem, gaussians_grad=True, camera_grad=False,
            )
            loss, _ = mapping_loss(
                out, frame["im"], frame["depth"], frame.get("labels"), mlp_, it, loss_cfg
            )
            return loss

        if with_sem and loss_cfg.use_mlp:
            loss, (ggp, gmlp) = jax.value_and_grad(loss_fn, argnums=(0, 1))(gp, mlp)
        else:
            loss, ggp = jax.value_and_grad(loss_fn)(gp, mlp)
            gmlp = None
        # Mean over the data axis — ONE psum over ICI.
        loss = jax.lax.pmean(loss, axis)
        ggp = jax.lax.pmean(ggp, axis)
        if gmlp is not None:
            gmlp = jax.lax.pmean(gmlp, axis)
        return loss, ggp, gmlp

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(params, variables, batch, opt_state, mlp, mlp_state, it):
        gauss_keys = [k for k in G.GAUSSIAN_KEYS if k in params]
        gp = {k: params[k] for k in gauss_keys}
        loss, ggp, gmlp = sharded(gp, variables["active"], batch, mlp, jnp.asarray(it))
        gp, opt_state = optim.adam_step(gp, ggp, opt_state, lrs, eps=1e-15)
        if gmlp is not None:
            mlp, mlp_state = optim.adam_step(
                mlp, gmlp, mlp_state, {"w": 5e-4, "b": 5e-4}, eps=1e-8
            )
        out = dict(params)
        out.update(gp)
        return out, opt_state, mlp, mlp_state, loss

    return step


def make_tile_sharded_render(mesh: Mesh, camera, raster_cfg: RasterConfig, axis: str = "data"):
    """Pixel-parallel rendering: shard the image's tile rows over devices.

    Gaussians are replicated; each device bins + blends only its strip of
    ``strip_h`` rows (one compiled renderer, strip selected by a dynamic
    ``pixel_offset_y``).  Alpha compositing is pixel-local, so the strips
    concatenate exactly into the full-image render.
    """
    from hierslam_tpu.core.camera import strip_camera

    n_dev = mesh.shape[axis]
    H, W = camera.height, camera.width
    th = raster_cfg.tile_shape[0]
    tiles_y = (H + th - 1) // th
    strip_h = ((tiles_y + n_dev - 1) // n_dev) * th
    cam_strip = strip_camera(camera, strip_h)

    def device_fn(params, dev_id):
        off = dev_id[0].astype(jnp.float32) * strip_h
        out = render_gaussians(
            params, None, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), cam_strip,
            raster_cfg, with_semantic=False, gaussians_grad=False,
            camera_grad=False, pixel_offset_y=off,
        )
        return out.im[None], out.depth[None]

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )

    @jax.jit
    def render(params):
        dev_ids = jnp.arange(n_dev, dtype=jnp.int32)
        ims, depths = sharded(params, dev_ids)
        im = ims.transpose(1, 0, 2, 3).reshape(3, n_dev * strip_h, W)[:, :H]
        depth = depths.reshape(n_dev * strip_h, W)[:H]
        return im, depth

    return render
