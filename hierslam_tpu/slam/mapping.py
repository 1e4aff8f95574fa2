"""Densification + keyframe-window mapping as jitted scans.

Mirrors the mapping phase of scripts/hierslam.py:1929-2104:

* ``make_densifier`` — silhouette/depth-error non-presence mask
  (add_new_gaussians_semantic_newrender, :1307-1352) back-projected into
  free capacity slots (static shapes; overflow reported);
* ``make_mapper`` — the 30-60 iteration window optimization: random frame
  per iteration (indices precomputed host-side with the run seed, matching
  np.random.randint at :1989), mapping losses, mid-phase opacity/scale
  pruning with Adam-moment surgery (prune_gaussians,
  utils/slam_external.py:167-188), fresh eps=1e-15 Adam per phase
  (scripts/hierslam.py:417,1979), persistent lr=5e-4 Adam for the 1x1-conv
  semantic decoder (:1757).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core import transforms
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import (
    LossConfig,
    lower_median,
    mapping_loss,
    render_gaussians,
)

Params = Dict[str, jax.Array]


@dataclass(frozen=True)
class PruneConfig:
    """pruning_dict schema (configs/replica/hierslam_semantic_run.py:119-128)."""

    start_after: int = 0
    remove_big_after: int = 0
    stop_after: int = 20
    prune_every: int = 20
    removal_opacity_threshold: float = 0.005
    final_removal_opacity_threshold: float = 0.005
    reset_opacities: bool = False
    reset_opacities_every: int = 500


def make_densifier(camera, raster_cfg: RasterConfig, sil_thres: float, num_semantic: int):
    """Jitted add-new-gaussians step for the current frame.

    The non-presence render uses ``densify_max_per_tile`` (default 2x the
    optimization K): at real densities a truncated per-tile list leaves
    silhouette holes behind in-tile depth discontinuities, and every holed
    pixel is re-densified each phase — unbounded map bloat.  This render is
    forward-only, once per phase, so a generous K costs almost nothing."""
    from dataclasses import replace as _dc_replace

    k_dens = raster_cfg.densify_max_per_tile or min(
        2 * raster_cfg.max_per_tile, 4096
    )
    # one uniform class at the generous densify K (rank bucketing would
    # only re-shuffle a forward-only render that runs once per phase)
    dens_cfg = _dc_replace(
        raster_cfg, max_per_tile=k_dens, bucket_spec=((-1, k_dens),),
        escalate_tiles=0,
    )

    @jax.jit
    def densify(params: Params, variables: Dict, im_gt, depth_gt, time_idx, key):
        q = params["cam_unnorm_rots"][0, :, time_idx]
        t = params["cam_trans"][0, :, time_idx]
        out = render_gaussians(
            params, variables["active"], q, t, camera, dens_cfg,
            with_semantic=False, gaussians_grad=False, camera_grad=False,
        )
        sil = out.final_opacity
        depth_error = jnp.abs(depth_gt - out.depth) * (depth_gt > 0)
        non_presence = (sil < sil_thres) | (
            (out.depth > depth_gt) & (depth_error > 50 * lower_median(depth_error))
        )
        mask = non_presence.reshape(-1) & (depth_gt > 0).reshape(-1)

        w2c = transforms.build_w2c(transforms.normalize(q), t)
        fields = G.pointcloud_fields(
            im_gt, depth_gt, camera.intrinsics, w2c, num_semantic, key
        )
        params, variables, n_over = G.insert_gaussians(
            params, variables, fields, mask, time_idx.astype(jnp.float32)
        )
        n_bin_dropped = out.n_dropped
        # Reference re-zeroes the densify bookkeeping for ALL gaussians on
        # every densification (scripts/hierslam.py:1345-1348).
        variables = dict(variables)
        variables["means2D_gradient_accum"] = jnp.zeros_like(
            variables["means2D_gradient_accum"]
        )
        variables["denom"] = jnp.zeros_like(variables["denom"])
        variables["max_2D_radius"] = jnp.zeros_like(variables["max_2D_radius"])
        return params, variables, jnp.sum(mask.astype(jnp.int32)), n_over, n_bin_dropped

    return densify


def make_mapper(
    camera,
    loss_cfg: LossConfig,
    raster_cfg: RasterConfig,
    lrs: Dict[str, float],
    num_iters: int,
    prune_cfg: PruneConfig,
    mlp_lr: float = 5e-4,
    # rect margin covering intra-phase param drift: Adam moves means
    # ~lr*iters = 6e-3 world units (~2 px at fx=600/z=2) and scales ~6%
    # (~2 px on a 30 px gaussian) over a 60-iteration phase — 4 px is a
    # 2x bound.  Every margin pixel inflates pair emission, the stream
    # row need, and all [pairs]-sized gather/route/kernel buffers.
    bin_margin_px: float = 4.0,
    densify_cfg=None,
):
    """Build the jitted mapping-phase function.

    ``window`` is a dict of stacked device arrays over the selected
    keyframes: im [W,3,H,W], depth [W,H,W], labels [W,L+1,H,W] (optional),
    time_idx [W] int32.

    Tile binning is AMORTIZED per phase: one binning per window frame is
    built up-front with a ``bin_margin_px`` rect margin (Gaussian means
    drift only ~lr*iters during a phase); the per-iteration render re-applies
    the exact current-parameter rect/frustum culling, so semantics match
    fresh binning up to the margin (see ops/rasterize.py).

    ``densify_cfg`` (a :class:`~hierslam_tpu.slam.densify_classic
    .DensifyConfig`) enables classic 3DGS clone/split densification inside
    the phase — the ``use_gaussian_splatting_densification`` path of the
    reference (scripts/hierslam.py:2043-2051, utils/slam_external.py:191-243):
    per-iteration ``||dL/d means2D||`` accumulation over seen Gaussians,
    then clone/split/prune on the densify schedule.  The schedule is static
    (start/stop/every and num_iters are Python ints), so the iteration scan
    is SEGMENTED at densify events and the window binning is rebuilt per
    segment — newly inserted Gaussians render from the very next iteration,
    matching the reference's per-render re-sort.
    """
    with_sem = bool(loss_cfg.sem_levels)
    use_classic = densify_cfg is not None
    compacted = raster_cfg.visible_budget > 0
    if use_classic and compacted:
        raise ValueError(
            "use_gaussian_splatting_densification needs full-N means2D/"
            "radii bookkeeping — set raster.visible_budget=0 with it"
        )
    if use_classic and raster_cfg.backend == "stream":
        raise ValueError(
            "use_gaussian_splatting_densification needs full-N means2D "
            "bookkeeping — use raster.backend 'pallas' or 'xla' with it"
        )
    if use_classic:
        from hierslam_tpu.slam.densify_classic import (
            accumulate_mean2d_gradient,
            densify_step,
        )

    # The stream backend optimizes THE PACKED STREAM_COLS TABLE [N, 128]
    # directly (per-column Adam lrs): packing/unpacking the parameter
    # columns happens once per phase instead of once per iteration, which
    # was the single largest mapping cost at N=2M (BREAKDOWN_r04.md:
    # pack_cols_table fwd+VJP ~177 ms/iter).  Rotations are not packed —
    # isotropic covariance is rotation-invariant, so stream rendering
    # produces no rotation gradient (they stay constant, exactly as the
    # dict-space stream path behaved).
    use_packed = raster_cfg.backend == "stream"
    # Visible-rank compaction exists to make PER-GAUSSIAN per-iteration
    # work (transforms, column packs, gradient heads) scale with the
    # visible prefix V instead of capacity N — but the packed stream
    # path has none of that: its table is packed once per phase and its
    # render/backward costs scale with the PAIR stream.  The [N] -> [V]
    # row compact it would add costs 75 ms/iter at N=2M (XLA narrows the
    # gather through the table pad) and its budget TRUNCATES rendering
    # (gaussians ranked past V drop).  The stream mapper therefore bins
    # full-N; visible_budget keeps its meaning for the ladder backends.
    if use_packed:
        compacted = False

    @jax.jit
    def map_phase(
        params: Params,
        variables: Dict,
        window: Dict[str, jax.Array],
        rand_idx: jax.Array,          # [num_iters] int32 into the window
        mlp: Optional[Params],
        mlp_state: Optional[optim.AdamState],
        key: Optional[jax.Array] = None,
    ):
        gauss_keys = [k for k in G.GAUSSIAN_KEYS if k in params]
        if use_packed:
            from hierslam_tpu.ops import render_stream as _rs
            from hierslam_tpu.ops.gather_vjp import pack_cols_table
            from hierslam_tpu.slam.losses import render_packed_stream

            if params["log_scales"].shape[1] != 1:
                raise NotImplementedError(
                    "stream backend supports isotropic maps only"
                )
            sem_w = params["semantic"].shape[1] if (
                with_sem and "semantic" in params
            ) else 0
            n_feat = 3 + sem_w
            cols = (
                [params["means3D"][:, i] for i in range(3)]
                + [params["log_scales"][:, 0],
                   params["logit_opacities"][:, 0]]
                + [params["rgb_colors"][:, i] for i in range(3)]
            )
            if sem_w:
                cols += [params["semantic"][:, i] for i in range(sem_w)]
            # The scan CARRIES the table and its Adam moments at the
            # USED width padded to a sublane multiple — [N, 40] for
            # 3+1+1+3+26 columns — padding to the 128-lane gather width
            # per iteration (pad VJP = slice).  This is the ONLY N=2M /
            # 24-frame-window arrangement that survives on the v5e:
            # gather-width carry+moments (temp 12.2 GiB), full-width
            # carry + narrow moments via a lane-slice DUS write-back
            # (~7.4 GiB), and an optimization_barrier'd pad (7.7 GiB)
            # all reliably kill the TPU worker, while this layout (6.7
            # GiB) runs — see tools/stream_width_repro.py for the crash
            # matrix.  XLA narrows the compaction row gather through the
            # plain pad (a 40-lane gather, ~75 ms/iter vs 15 full-lane);
            # that cost is accepted until the runtime fault is cornered.
            gp = {"table": pack_cols_table(cols, width_mult=8)}
            cw = gp["table"].shape[1]
            width = 128  # the full-lane gather width (fixed: narrower
            # gather tables ride the slow narrow-row path and have
            # crashed the TPU runtime at scale)
            # Fold the active mask into the opacity-logit column ONCE per
            # phase: inactive capacity slots get the sentinel logit, so
            # they blend to nothing and route no gradient without a
            # per-iteration [V]-row boolean compact of the mask.  Prunes
            # inside the scan write the same sentinel (below); pruned
            # rows are never recycled within a phase (insert_gaussians
            # appends at n_active), so the fold is equivalent to the
            # reference's row removal.
            _logit_colmask = (
                jax.lax.broadcasted_iota(
                    jnp.int32, gp["table"].shape, 1
                ) == _rs.COL_LOGIT
            )
            gp["table"] = jnp.where(
                (~variables["active"])[:, None] & _logit_colmask,
                _rs.SENTINEL_LOGIT, gp["table"],
            )
            import numpy as _np

            lr_vec = _np.zeros((cw,), _np.float32)
            lr_vec[_rs.COL_MEAN:_rs.COL_MEAN + 3] = lrs["means3D"]
            lr_vec[_rs.COL_LOGS] = lrs["log_scales"]
            lr_vec[_rs.COL_LOGIT] = lrs["logit_opacities"]
            lr_vec[_rs.COL_FEAT:_rs.COL_FEAT + 3] = lrs["rgb_colors"]
            if sem_w:
                lr_vec[_rs.COL_FEAT + 3:_rs.COL_FEAT + 3 + sem_w] = (
                    lrs["semantic"]
                )
            lrs_eff = {"table": jnp.asarray(lr_vec)}
        else:
            gp = {k: params[k] for k in gauss_keys}
            lrs_eff = lrs
        opt = optim.adam_init(gp)

        # Window poses are fixed during mapping (camera lrs are zero in the
        # reference mapping config) — gather once.
        wq = params["cam_unnorm_rots"][0].T[window["time_idx"]]  # [W, 4]
        wt = params["cam_trans"][0].T[window["time_idx"]]        # [W, 3]
        wq = jax.lax.stop_gradient(wq)
        wt = jax.lax.stop_gradient(wt)

        # GT-side SSIM statistics are iteration-invariant; precomputing
        # them per phase trades two ~1 ms Gaussian filters per iteration
        # for two [W, 3, H, W] f32 buffers (~470 MB at the 24-frame
        # full-res window) — on the crash-margin N=2M phase the packed
        # path recomputes per iteration instead.
        if use_packed:
            w_ssim = None
        else:
            from hierslam_tpu.ops.ssim import ssim_ref_stats

            w_ssim = jax.vmap(ssim_ref_stats)(window["im"])

        # --- per-window-frame amortized binning (per scan segment) -------
        from hierslam_tpu.core import transforms as _tf
        from hierslam_tpu.ops.rasterize import compute_binning as _cb

        def bin_window(gp_now, variables_now):
            if use_packed:
                # the stream mapper has exactly ONE scan segment (classic
                # densify is disallowed), so binning always happens at
                # phase start where the packed table still equals the
                # incoming params — bin straight from them
                sg = jax.lax.stop_gradient(
                    {k: params[k] for k in (
                        "means3D", "log_scales", "logit_opacities",
                        "unnorm_rotations")}
                )
            else:
                sg = jax.lax.stop_gradient(gp_now)
            scales0 = jnp.exp(sg["log_scales"])
            opac0 = jax.nn.sigmoid(sg["logit_opacities"])

            def bin_one(qt):
                q, t_ = qt
                means_cam, _ = _tf.transform_to_frame(
                    sg["means3D"], sg["unnorm_rotations"], q, t_,
                    gaussians_grad=False, camera_grad=False,
                )
                if raster_cfg.backend == "stream":
                    from hierslam_tpu.ops.render_stream import (
                        compute_stream_binning as _csb,
                    )

                    return _csb(
                        means_cam, scales0, sg["unnorm_rotations"], camera,
                        raster_cfg, active=variables_now["active"],
                        margin_px=bin_margin_px, opacities=opac0,
                        compact=compacted,
                    )
                return _cb(
                    means_cam, scales0, sg["unnorm_rotations"], camera,
                    raster_cfg, active=variables_now["active"],
                    margin_px=bin_margin_px, opacities=opac0,
                    compact=compacted,
                )

            # Binning over the window in batches of 4 frames: full vmap
            # would materialize [W, N, R] pair arrays (24 frames x 2M slots
            # x 16 = 24GB at capacity — OOM), while a fully sequential map
            # loses the batched-sort amortization.  4 frames bounds the
            # peak at ~4*N*R pairs and still fuses the per-frame sorts.
            return jax.lax.map(bin_one, (wq, wt), batch_size=4)

        def body_with_binnings(binnings, carry, it):
            gp, variables, opt, mlp, mlp_state = carry
            k = rand_idx[it]
            im_gt = window["im"][k]
            depth_gt = window["depth"][k]
            labels = window["labels"][k] if "labels" in window else None
            q, t = wq[k], wt[k]
            gt_ssim = (
                None if w_ssim is None
                else jax.tree_util.tree_map(lambda x: x[k], w_ssim)
            )
            bc = jax.tree_util.tree_map(lambda x: x[k], binnings)
            n_slots = params["means3D"].shape[0]
            m2d0 = jnp.zeros((n_slots, 2), jnp.float32)

            def loss_fn(gp_, mlp_, m2d_):
                if use_packed:
                    # active/prune state is folded into the logit column
                    # (sentinel) by the phase setup and the prune step —
                    # no per-iteration [V] boolean compact (23.9 ms/iter)
                    tab128 = jnp.pad(
                        gp_["table"], ((0, 0), (0, width - cw))
                    )
                    out = render_packed_stream(
                        tab128, None, bc, q, t,
                        camera, raster_cfg, n_feat,
                    )
                else:
                    full = dict(params)
                    full.update(gp_)
                    out = render_gaussians(
                        full, variables["active"], q, t, camera, raster_cfg,
                        with_semantic=with_sem, gaussians_grad=True,
                        camera_grad=False, binning_cache=bc,
                        means2D_offset=m2d_ if use_classic else None,
                    )
                loss, parts = mapping_loss(
                    out, im_gt, depth_gt, labels, mlp_, it, loss_cfg,
                    gt_ssim=gt_ssim,
                )
                parts = dict(parts)
                # surface gradient-routing truncation (an undersized
                # grad_pair_budget silently biases mapping gradients —
                # VERDICT r2 weak #8); the runner warns on nonzero.
                parts["n_grad_dropped"] = out.n_grad_dropped.astype(jnp.float32)
                # ... and the mapping binning's own drops (class caps,
                # emission budgets, visible_budget): the runner warns when
                # they exceed its overflow threshold.
                parts["n_map_bin_dropped"] = out.n_dropped.astype(jnp.float32)
                return loss, (out.radii, parts)

            wants_mlp = with_sem and loss_cfg.use_mlp
            argnums = tuple(
                i for i, on in enumerate((True, wants_mlp, use_classic)) if on
            )
            (loss, (radii, parts)), grads = jax.value_and_grad(
                loss_fn, argnums=argnums, has_aux=True
            )(gp, mlp, m2d0)
            grads = list(grads)
            ggp = grads.pop(0)
            gmlp = grads.pop(0) if wants_mlp else None
            gm2d = grads.pop(0) if use_classic else None

            if use_classic:
                # reference: variables = accumulate_mean2d_gradient(...) on
                # seen (radius > 0) gaussians (utils/slam_external.py:100-104)
                variables = accumulate_mean2d_gradient(
                    variables, gm2d, radii > 0
                )

            # --- prune (reference order: backward -> prune -> step;
            # scripts/hierslam.py:2037-2053) ---
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
            if use_packed:
                logit_col = gp["table"][:, _rs.COL_LOGIT]
                scale_col = gp["table"][:, _rs.COL_LOGS]
            else:
                logit_col = gp["logit_opacities"][:, 0]
                scale_col = jnp.max(gp["log_scales"], axis=1)
            small = jax.nn.sigmoid(logit_col) < thresh
            big = (
                jnp.exp(scale_col) > 0.1 * variables["scene_radius"]
            ) & (it >= prune_cfg.remove_big_after)
            removed = do_prune & variables["active"] & (small | big)
            variables = dict(variables)
            variables["active"] = variables["active"] & ~removed
            opt = optim.zero_moment_rows(opt, removed)
            if use_packed:
                # row removal = sentinel logit (see the phase-start fold)
                gp = dict(gp)
                colmask_logit = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, gp["table"].shape, 1
                    ) == _rs.COL_LOGIT
                )
                gp["table"] = jnp.where(
                    removed[:, None] & colmask_logit,
                    _rs.SENTINEL_LOGIT, gp["table"],
                )

            if prune_cfg.reset_opacities:
                do_reset = (
                    (it > 0)
                    & (it % prune_cfg.reset_opacities_every == 0)
                    & (it <= prune_cfg.stop_after)
                )
                reset_val = jnp.log(0.01 / 0.99)  # inverse_sigmoid(0.01)
                gp = dict(gp)
                if use_packed:
                    colmask = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, gp["table"].shape, 1
                        ) == _rs.COL_LOGIT
                    )
                    gp["table"] = jnp.where(
                        do_reset & colmask, reset_val, gp["table"]
                    )
                    colmask_n = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, opt.mu["table"].shape, 1
                        ) == _rs.COL_LOGIT
                    )
                    opt = optim.AdamState(
                        mu={"table": jnp.where(
                            do_reset & colmask_n, 0.0, opt.mu["table"])},
                        nu={"table": jnp.where(
                            do_reset & colmask_n, 0.0, opt.nu["table"])},
                        count=opt.count,
                    )
                else:
                    gp["logit_opacities"] = jnp.where(
                        do_reset,
                        jnp.full_like(gp["logit_opacities"], reset_val),
                        gp["logit_opacities"],
                    )
                    zeroed = optim.zero_moments_for_key(
                        opt, "logit_opacities"
                    )
                    opt = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(do_reset, b, a), opt, zeroed
                    )

            gp, opt = optim.adam_step(gp, ggp, opt, lrs_eff, eps=1e-15)
            if gmlp is not None:
                mlp, mlp_state = optim.adam_step(
                    mlp, gmlp, mlp_state, {"w": mlp_lr, "b": mlp_lr}, eps=1e-8
                )

            if not compacted and not use_packed:
                # max_2D_radius is consumed ONLY by classic clone/split
                # densification (utils/slam_external.py:191-243) and is
                # re-zeroed by every silhouette densify — under visible-
                # rank compaction radii live in per-frame compact spaces
                # (and the stream kernel reports no radii at all), so the
                # (unconsumed) bookkeeping is skipped.
                radf = radii.astype(jnp.float32)
                variables["max_2D_radius"] = jnp.where(
                    radii > 0,
                    jnp.maximum(variables["max_2D_radius"], radf),
                    variables["max_2D_radius"],
                )
            # full per-iteration loss breakdown (the reference wandb-logs
            # every mapping iteration via report_loss[_semantic],
            # utils/eval_helpers.py:277-339)
            return (gp, variables, opt, mlp, mlp_state), parts

        # --- densify schedule (static) -> scan segments -------------------
        # Reference schedule (utils/slam_external.py:195): densify fires at
        # iterations i with start_after < i <= stop_after, i % every == 0.
        if use_classic:
            events = [
                i for i in range(num_iters)
                if densify_cfg.start_after < i <= densify_cfg.stop_after
                and i % densify_cfg.densify_every == 0
            ]
        else:
            events = []
        bounds = [0] + [e + 1 for e in events]
        if not bounds or bounds[-1] != num_iters:
            bounds.append(num_iters)
        segments = list(zip(bounds[:-1], bounds[1:]))

        carry = (gp, variables, opt, mlp, mlp_state)
        loss_chunks = []
        dkey = key if key is not None else jax.random.PRNGKey(0)
        n_classic_over = jnp.zeros((), jnp.int32)
        for si, (lo, hi) in enumerate(segments):
            gp, variables, opt, mlp, mlp_state = carry
            binnings = bin_window(gp, variables)
            carry, losses_seg = jax.lax.scan(
                functools.partial(body_with_binnings, binnings),
                carry,
                jnp.arange(lo, hi, dtype=jnp.int32),
            )
            loss_chunks.append(losses_seg)
            if use_classic and (hi - 1) in events:
                gp, variables, opt, mlp, mlp_state = carry
                dkey, sub = jax.random.split(dkey)
                full = dict(params)
                full.update(gp)
                full, variables, opt, n_over = densify_step(
                    full, variables, opt, hi - 1, densify_cfg, sub
                )
                n_classic_over = n_classic_over + n_over
                gp = {k: full[k] for k in gauss_keys}
                carry = (gp, variables, opt, mlp, mlp_state)

        gp, variables, _, mlp, mlp_state = carry
        losses = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *loss_chunks
        )
        if use_classic:
            losses = dict(losses)
            losses["classic_densify_overflow"] = jnp.broadcast_to(
                n_classic_over.astype(jnp.float32), (num_iters,)
            )
        out_params = dict(params)
        if use_packed:
            tb = gp["table"]
            out_params["means3D"] = tb[:, _rs.COL_MEAN:_rs.COL_MEAN + 3]
            out_params["log_scales"] = tb[:, _rs.COL_LOGS:_rs.COL_LOGS + 1]
            out_params["logit_opacities"] = (
                tb[:, _rs.COL_LOGIT:_rs.COL_LOGIT + 1]
            )
            out_params["rgb_colors"] = tb[:, _rs.COL_FEAT:_rs.COL_FEAT + 3]
            if sem_w:
                out_params["semantic"] = (
                    tb[:, _rs.COL_FEAT + 3:_rs.COL_FEAT + 3 + sem_w]
                )
        else:
            out_params.update(gp)
        return out_params, variables, mlp, mlp_state, losses

    return map_phase
