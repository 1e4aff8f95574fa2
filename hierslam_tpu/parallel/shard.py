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


def make_dp_mapper(
    mesh: Mesh,
    camera,
    loss_cfg: LossConfig,
    raster_cfg: RasterConfig,
    lrs: Dict[str, float],
    num_iters: int,
    prune_cfg,
    mlp_lr: float = 5e-4,
    bin_margin_px: float = 4.0,  # keep in sync with slam.mapping.make_mapper
    axis: str = "data",
):
    """Data-parallel mapping PHASE with the same signature/semantics as
    ``slam.mapping.make_mapper`` (minus classic clone/split densify).

    Each iteration optimizes a BATCH of ``D = mesh.shape[axis]`` window
    frames instead of the reference's single random frame
    (scripts/hierslam.py:1986-1989): every device renders + differentiates
    its own frame against the replicated Gaussian map, the per-frame
    gradients are combined with one ``pmean`` riding ICI, and the Adam /
    prune / bookkeeping updates run replicated — identical math on every
    device.  With all D columns of ``rand_idx`` equal this reduces EXACTLY
    to the single-device mapper (pmean of identical gradients), which is
    the equivalence contract ``tests/test_parallel.py`` asserts.

    ``rand_idx`` is [num_iters, D] int32 (one window index per device per
    iteration).  Returned losses are the per-iteration pmean'd parts.
    """
    from hierslam_tpu.core import transforms as _tf
    from hierslam_tpu.ops.rasterize import compute_binning as _cb
    from hierslam_tpu.slam.mapping import PruneConfig  # noqa: F401 (doc parity)

    with_sem = bool(loss_cfg.sem_levels)
    wants_mlp = with_sem and loss_cfg.use_mlp
    n_dev = mesh.shape[axis]

    @jax.jit
    def map_phase(params, variables, window, rand_idx, mlp, mlp_state, key=None):
        gauss_keys = [k for k in G.GAUSSIAN_KEYS if k in params]
        gp = {k: params[k] for k in gauss_keys}
        opt = optim.adam_init(gp)

        wq = jax.lax.stop_gradient(params["cam_unnorm_rots"][0].T[window["time_idx"]])
        wt = jax.lax.stop_gradient(params["cam_trans"][0].T[window["time_idx"]])

        from hierslam_tpu.ops.ssim import ssim_ref_stats

        w_ssim = jax.vmap(ssim_ref_stats)(window["im"])

        # Amortized per-window-frame binning, computed replicated (identical
        # on every device; see slam.mapping.make_mapper for the margin
        # semantics).
        sg = jax.lax.stop_gradient(gp)
        scales0 = jnp.exp(sg["log_scales"])
        opac0 = jax.nn.sigmoid(sg["logit_opacities"])

        def bin_one(qt):
            q, t_ = qt
            means_cam, _ = _tf.transform_to_frame(
                sg["means3D"], sg["unnorm_rotations"], q, t_,
                gaussians_grad=False, camera_grad=False,
            )
            if raster_cfg.backend == "stream":
                # stream binnings are replicated like ladder ones; the
                # per-device render dispatches to the ragged Pallas kernel
                # via the StreamBinning cache (ops/render_stream.py)
                from hierslam_tpu.ops.render_stream import (
                    compute_stream_binning as _csb,
                )

                return _csb(
                    means_cam, scales0, sg["unnorm_rotations"], camera,
                    raster_cfg, active=variables["active"],
                    margin_px=bin_margin_px, opacities=opac0,
                    compact=raster_cfg.visible_budget > 0,
                )
            return _cb(
                means_cam, scales0, sg["unnorm_rotations"], camera,
                raster_cfg, active=variables["active"],
                margin_px=bin_margin_px, opacities=opac0,
                compact=raster_cfg.visible_budget > 0,
            )

        binnings = jax.lax.map(bin_one, (wq, wt), batch_size=4)

        def device_grads(gp_r, mlp_r, active_r, idx_col, it):
            idx = idx_col[0]
            im_gt = window["im"][idx]
            depth_gt = window["depth"][idx]
            labels = window["labels"][idx] if "labels" in window else None
            q, t = wq[idx], wt[idx]
            gt_ssim = jax.tree_util.tree_map(lambda x: x[idx], w_ssim)
            bc = jax.tree_util.tree_map(lambda x: x[idx], binnings)

            def loss_fn(gp_, mlp_):
                full = dict(params)
                full.update(gp_)
                out = render_gaussians(
                    full, active_r, q, t, camera, raster_cfg,
                    with_semantic=with_sem, gaussians_grad=True,
                    camera_grad=False, binning_cache=bc,
                )
                loss, parts = mapping_loss(
                    out, im_gt, depth_gt, labels, mlp_, it, loss_cfg,
                    gt_ssim=gt_ssim,
                )
                parts = dict(parts)
                parts["n_grad_dropped"] = out.n_grad_dropped.astype(jnp.float32)
                return loss, (out.radii, parts)

            if wants_mlp:
                (loss, (radii, parts)), (ggp, gmlp) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(gp_r, mlp_r)
            else:
                (loss, (radii, parts)), ggp = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(gp_r, mlp_r)
                gmlp = None
            ggp = jax.lax.pmean(ggp, axis)
            parts = jax.lax.pmean(parts, axis)
            if raster_cfg.visible_budget:
                # compact radii live in per-frame rank spaces: not
                # comparable across devices, and the max_2D_radius
                # bookkeeping they feed is skipped under compaction
                radii = jnp.zeros((1,), jnp.int32)
            else:
                radii = jax.lax.pmax(radii, axis)
            if gmlp is not None:
                gmlp = jax.lax.pmean(gmlp, axis)
                return ggp, gmlp, radii, parts
            return ggp, radii, parts

        sharded = jax.shard_map(
            device_grads,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P()),
            out_specs=(P(),) * (4 if wants_mlp else 3),
            check_vma=False,
        )

        def body(carry, it):
            gp, variables, opt, mlp, mlp_state = carry
            outs = sharded(gp, mlp, variables["active"], rand_idx[it], it)
            if wants_mlp:
                ggp, gmlp, radii, parts = outs
            else:
                ggp, radii, parts = outs
                gmlp = None

            # prune (reference order: backward -> prune -> step) — identical
            # to the single-device mapper
            do_prune = (
                (it <= prune_cfg.stop_after)
                & (it >= prune_cfg.start_after)
                & (it % prune_cfg.prune_every == 0)
            )
            thresh = jnp.where(
                it == prune_cfg.stop_after,
                prune_cfg.final_removal_opacity_threshold,
                prune_cfg.removal_opacity_threshold,
            )
            small = jax.nn.sigmoid(gp["logit_opacities"][:, 0]) < thresh
            big = (
                jnp.exp(jnp.max(gp["log_scales"], axis=1))
                > 0.1 * variables["scene_radius"]
            ) & (it >= prune_cfg.remove_big_after)
            removed = do_prune & variables["active"] & (small | big)
            variables = dict(variables)
            variables["active"] = variables["active"] & ~removed
            opt = optim.zero_moment_rows(opt, removed)

            if prune_cfg.reset_opacities:
                do_reset = (
                    (it > 0)
                    & (it % prune_cfg.reset_opacities_every == 0)
                    & (it <= prune_cfg.stop_after)
                )
                reset_val = jnp.log(0.01 / 0.99)  # inverse_sigmoid(0.01)
                gp = dict(gp)
                gp["logit_opacities"] = jnp.where(
                    do_reset,
                    jnp.full_like(gp["logit_opacities"], reset_val),
                    gp["logit_opacities"],
                )
                zeroed = optim.zero_moments_for_key(opt, "logit_opacities")
                opt = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(do_reset, b, a), opt, zeroed
                )

            gp, opt = optim.adam_step(gp, ggp, opt, lrs, eps=1e-15)
            if gmlp is not None:
                mlp, mlp_state = optim.adam_step(
                    mlp, gmlp, mlp_state, {"w": mlp_lr, "b": mlp_lr}, eps=1e-8
                )
            if not raster_cfg.visible_budget:
                radf = radii.astype(jnp.float32)
                variables["max_2D_radius"] = jnp.where(
                    radii > 0,
                    jnp.maximum(variables["max_2D_radius"], radf),
                    variables["max_2D_radius"],
                )
            return (gp, variables, opt, mlp, mlp_state), parts

        carry = (gp, variables, opt, mlp, mlp_state)
        carry, losses = jax.lax.scan(
            body, carry, jnp.arange(num_iters, dtype=jnp.int32)
        )
        gp, variables, _, mlp, mlp_state = carry
        out_params = dict(params)
        out_params.update(gp)
        return out_params, variables, mlp, mlp_state, losses

    return map_phase


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
