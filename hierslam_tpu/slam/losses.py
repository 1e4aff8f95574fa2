"""Tracking / mapping losses.

Numerical contract follows scripts/hierslam.py exactly:

* tracking (get_loss_semantic, :715-853): silhouette-gated masks, **sum**
  losses — depth ``|d-d̂|`` summed over mask (:784), RGB summed over the
  3-tiled mask (:794); no semantic term while tracking (:802).
* mapping (get_loss_semantic_mlp, :856-1107): depth masked **mean** (:927),
  RGB ``0.8 L1 + 0.2 (1-SSIM)`` unmasked (:939), semantic = per-tree-level
  cross-entropy (weight 1.0) plus, from mapping iter >= 14, leaf CE through
  the 1x1-conv decoder with weight 5.0 (:959-983).
* outlier-depth masking (ScanNet): error < 10 x median (:770-772) — the
  median is torch's lower-median over the full masked-product image.
* the presence mask threshold compares the rendered final opacity
  (1 - final transmittance) against sil_thres (:765).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from hierslam_tpu.core import transforms
from hierslam_tpu.ops.rasterize import RasterConfig, RenderOutput, rasterize
from hierslam_tpu.ops.ssim import calc_ssim

Params = Dict[str, jax.Array]


@dataclass(frozen=True)
class LossConfig:
    use_sil_for_loss: bool = True
    sil_thres: float = 0.99
    use_l1: bool = True
    ignore_outlier_depth_loss: bool = False
    w_im: float = 0.5
    w_depth: float = 1.0
    w_sem: float = 0.0
    sem_levels: Tuple[int, ...] = ()   # per-level class counts (tree: L entries; flat: 1)
    num_leaf: int = 0                  # leaf class count (MLP decoder output)
    use_mlp: bool = False
    mlp_gate_iter: int = 14
    weight_sem_level: float = 1.0
    weight_sem_leaf: float = 5.0


def lower_median(x: jax.Array) -> jax.Array:
    """torch.median semantics (lower median) over all elements."""
    return jnp.quantile(x.reshape(-1), 0.5, method="lower")


def cross_entropy_mean(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross-entropy, logits [P, C], int labels [P]
    (torch.nn.CrossEntropyLoss default reduction)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return -jnp.mean(picked)


def cross_entropy_mean_cmajor(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean cross-entropy with CHANNEL-MAJOR logits [C, H, W] (the native
    render layout) and int labels [H, W].

    Identical math to :func:`cross_entropy_mean` but gather-free: the label
    pick is a masked channel reduction.  TPU row-gathers cost ~20ns/row, so
    a per-pixel ``take_along_axis`` (H*W rows) would dominate the whole
    mapping loss stack; this form is pure VPU work."""
    lab = labels.astype(jnp.int32)[None]
    m = jnp.max(logits, axis=0, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(logits - m), axis=0)) + m[0]
    cls = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    picked = jnp.sum(jnp.where(cls == lab, logits, 0.0), axis=0)
    return jnp.mean(lse - picked)


def mlp_apply(mlp: Params, sem_img: jax.Array) -> jax.Array:
    """1x1 conv decoder: [S, H, W] -> [L, H, W]
    (torch.nn.Conv2d(num_semantic, num_leaf, 1), scripts/hierslam.py:1756)."""
    return (
        jnp.einsum("shw,ls->lhw", sem_img, mlp["w"],
                   precision=jax.lax.Precision.HIGHEST)
        + mlp["b"][:, None, None]
    )


def mlp_init(num_semantic: int, num_leaf: int, key: jax.Array) -> Params:
    """torch Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(num_semantic)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (num_leaf, num_semantic), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (num_leaf,), minval=-bound, maxval=bound),
    }


def render_packed_stream(
    table, active, binning_cache, cam_quat, cam_trans, camera, raster_cfg,
    n_feat: int,
):
    """Streamed render straight from a packed STREAM_COLS table [N, 128].

    The packed-table mapping scan (slam/mapping.py) keeps this table as THE
    optimization variable, so per-iteration renders skip the N-row column
    pack + its VJP entirely — the single largest cost of the class-ladder
    mapping iteration at N=2M (BREAKDOWN_r04.md: ~177 ms/iter).
    Differentiable w.r.t. ``table``; the pose is nondifferentiable (the
    stream kernel takes it as a scalar input).
    """
    from hierslam_tpu.ops import render_stream as _rs
    from hierslam_tpu.ops.gather_vjp import compact_rows

    lists = binning_cache.lists
    if lists.vis_ids is not None:
        table = compact_rows(table, lists.vis_ids, lists.rank_of)
        act = active[lists.vis_ids] if active is not None else None
    else:
        act = active
    if act is not None:
        # mid-phase prunes take effect IMMEDIATELY (the reference removes
        # rows from subsequent renders): inactive slots get the sentinel
        # opacity logit, so they blend to nothing and route no gradient
        # even while the amortized stream lists still carry them
        col_is_logit = (
            jax.lax.broadcasted_iota(jnp.int32, table.shape, 1)
            == _rs.COL_LOGIT
        )
        table = jnp.where(
            (~act)[:, None] & col_is_logit, _rs.SENTINEL_LOGIT, table
        )
    w2c = jax.lax.stop_gradient(
        transforms.build_w2c(transforms.normalize(cam_quat), cam_trans)
    )
    ch, ft, med = _rs.render_from_table(
        table, binning_cache, w2c, camera, raster_cfg, n_feat
    )
    sem_w = n_feat - 3
    return RenderOutput(
        im=ch[:3],
        radii=jnp.zeros((table.shape[0],), jnp.int32),
        depth=ch[-2],
        median_depth=med,
        final_opacity=1.0 - ft,
        mask=ch[-1],
        semantic=ch[3:3 + sem_w] if sem_w else None,
        n_dropped=lists.n_dropped,
        tile_count=lists.count,
        n_grad_dropped=(
            jnp.maximum(lists.n_refs - raster_cfg.grad_pair_budget, 0)
            if raster_cfg.grad_pair_budget
            else jnp.zeros((), jnp.int32)
        ),
    )


def render_gaussians(
    params: Params,
    active: jax.Array,
    cam_quat: jax.Array,
    cam_trans: jax.Array,
    camera,
    raster_cfg: RasterConfig,
    *,
    with_semantic: bool,
    gaussians_grad: bool,
    camera_grad: bool,
    pixel_offset_y=0.0,
    binning_cache=None,
    means2D_offset=None,
) -> RenderOutput:
    """transform_to_frame + activation packing + rasterize.

    Activations follow transformed_params2rendervar_semantic
    (utils/slam_helpers.py:195-219): sigmoid opacity, exp scale (isotropic
    tiled x3), normalized quats, raw semantic logits.

    ``means2D_offset`` ([N, 2], zeros) is the classic-densification gradient
    hook: its cotangent is dL/d(screen-space mean), the reference's
    retain_grad'ed dummy means2D (scripts/hierslam.py:754).

    When the binning cache was built in visible-rank space
    (``raster_cfg.visible_budget > 0``), the raw parameters are first
    COMPACTED to the cache's [V] visible prefix with one packed gather
    (scatter-free custom VJP routes gradients back through the inverse
    permutation), so the transform / activation / table / backward-head
    work all scales with V instead of N.  ``RenderOutput.radii`` is then
    in compact space.

    A :class:`~hierslam_tpu.ops.render_stream.StreamBinning` cache takes
    the STREAMED fast path instead: raw attributes feed the ragged
    per-tile Pallas kernel directly (projection happens in-kernel; no
    screen-space table is built) — see ops/render_stream.py."""
    from hierslam_tpu.ops import render_stream as _rs

    if isinstance(binning_cache, _rs.StreamBinning):
        if params["log_scales"].shape[1] != 1:
            raise NotImplementedError(
                "stream backend supports isotropic maps only"
            )
        if means2D_offset is not None:
            raise NotImplementedError(
                "classic densification is incompatible with the stream "
                "backend (needs full-N means2D bookkeeping)"
            )
        from hierslam_tpu.ops.gather_vjp import pack_cols_table

        sem_w = params["semantic"].shape[1] if (
            with_semantic and "semantic" in params
        ) else 0
        if camera_grad:
            # blend_stream's VJP routes cotangents to the attribute table
            # only (pose rides as a nondifferentiable scalar input) —
            # silently-zero pose gradients would corrupt tracking
            raise NotImplementedError(
                "stream backend does not provide camera gradients; "
                "tracking uses the render_tracked path"
            )
        gp = params if gaussians_grad else {
            k: jax.lax.stop_gradient(v) for k, v in params.items()
        }
        cols = (
            [gp["means3D"][:, i] for i in range(3)]
            + [gp["log_scales"][:, 0], gp["logit_opacities"][:, 0]]
            + [gp["rgb_colors"][:, i] for i in range(3)]
        )
        if sem_w:
            cols += [gp["semantic"][:, i] for i in range(sem_w)]
        table = pack_cols_table(cols)
        return render_packed_stream(
            table, active, binning_cache, cam_quat, cam_trans, camera,
            raster_cfg, 3 + sem_w,
        )

    vis = getattr(getattr(binning_cache, "lists", None), "vis_ids", None)
    if vis is not None:
        from hierslam_tpu.ops.gather_vjp import compact_rows, pack_cols_table

        if means2D_offset is not None:
            raise NotImplementedError(
                "classic densification (means2D gradients) needs full-N "
                "radii bookkeeping — incompatible with visible_budget"
            )
        s = params["log_scales"].shape[1]
        sem_w = params["semantic"].shape[1] if (
            with_semantic and "semantic" in params
        ) else 0
        # flat 1-D column packing (ops/gather_vjp.pack_cols_table): a 2-D
        # concat with [N, c<128] operands materializes lane-padded copies
        # under rematerialized autodiff (~1GB each at N=2M)
        cols = (
            [params["means3D"][:, i] for i in range(3)]          # 0:3
            + [params["unnorm_rotations"][:, i] for i in range(4)]  # 3:7
            + [params["rgb_colors"][:, i] for i in range(3)]     # 7:10
            + [params["logit_opacities"][:, 0]]                  # 10:11
            + [params["log_scales"][:, i] for i in range(s)]     # 11:11+s
        )
        if sem_w:
            cols += [params["semantic"][:, i] for i in range(sem_w)]
        if active is not None:
            cols.append(active.astype(jnp.float32))
        packed = pack_cols_table(cols)
        pc = compact_rows(packed, vis, binning_cache.lists.rank_of)
        params = dict(
            means3D=pc[:, 0:3],
            unnorm_rotations=pc[:, 3:7],
            rgb_colors=pc[:, 7:10],
            logit_opacities=pc[:, 10:11],
            log_scales=pc[:, 11:11 + s],
        )
        off = 11 + s
        if sem_w:
            params["semantic"] = pc[:, off:off + sem_w]
            off += sem_w
        if active is not None:
            active = jax.lax.stop_gradient(pc[:, off]) > 0.5

    means_cam, rots = transforms.transform_to_frame(
        params["means3D"],
        params["unnorm_rotations"],
        cam_quat,
        cam_trans,
        gaussians_grad=gaussians_grad,
        camera_grad=camera_grad,
        transform_rots=params["log_scales"].shape[1] != 1,
    )
    gp = params if gaussians_grad else {
        k: jax.lax.stop_gradient(v) for k, v in params.items()
    }
    sem = gp.get("semantic") if with_semantic else None
    return rasterize(
        means_cam,
        gp["rgb_colors"],
        jax.nn.sigmoid(gp["logit_opacities"][:, 0]),
        jnp.exp(gp["log_scales"]),
        transforms.normalize(rots),
        camera,
        semantics=sem,
        active=active,
        config=raster_cfg,
        pixel_offset_y=pixel_offset_y,
        binning_cache=binning_cache,
        means2D_offset=means2D_offset,
    )


def _valid_mask(out: RenderOutput, gt_depth: jax.Array, cfg: LossConfig, tracking: bool):
    depth = out.depth
    nan_mask = ~jnp.isnan(depth)
    if cfg.ignore_outlier_depth_loss:
        depth_error = jnp.abs(gt_depth - depth) * (gt_depth > 0)
        mask = (depth_error < 10 * lower_median(depth_error)) & (gt_depth > 0)
    else:
        mask = gt_depth > 0
    mask = mask & nan_mask
    if tracking and cfg.use_sil_for_loss:
        mask = mask & (out.final_opacity > cfg.sil_thres)
    return jax.lax.stop_gradient(mask)


def tracking_loss(
    out: RenderOutput, im_gt: jax.Array, depth_gt: jax.Array, cfg: LossConfig
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    mask = _valid_mask(out, depth_gt, cfg, tracking=True)
    losses = {}
    losses["depth"] = jnp.sum(jnp.abs(depth_gt - out.depth) * mask)
    if cfg.use_sil_for_loss or cfg.ignore_outlier_depth_loss:
        losses["im"] = jnp.sum(jnp.abs(im_gt - out.im) * mask[None])
    else:
        losses["im"] = jnp.sum(jnp.abs(im_gt - out.im))
    loss = cfg.w_im * losses["im"] + cfg.w_depth * losses["depth"]
    losses["loss"] = loss
    return loss, losses


def mapping_loss(
    out: RenderOutput,
    im_gt: jax.Array,
    depth_gt: jax.Array,
    labels_gt: Optional[jax.Array],   # [L(+1), H, W] int32 or None
    mlp: Optional[Params],
    iter_idx,
    cfg: LossConfig,
    gt_ssim=None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    mask = _valid_mask(out, depth_gt, cfg, tracking=False)
    losses = {}
    cnt = jnp.maximum(jnp.sum(mask), 1)
    losses["depth"] = jnp.sum(jnp.abs(depth_gt - out.depth) * mask) / cnt
    losses["im"] = 0.8 * jnp.mean(jnp.abs(out.im - im_gt)) + 0.2 * (
        1.0 - calc_ssim(out.im, im_gt, ref_stats=gt_ssim)
    )
    loss = cfg.w_im * losses["im"] + cfg.w_depth * losses["depth"]

    if cfg.sem_levels and labels_gt is not None:
        sem_img = out.semantic  # [S_total, H, W]
        level_loss = 0.0
        off = 0
        for i, n_cls in enumerate(cfg.sem_levels):
            level_loss = level_loss + cross_entropy_mean_cmajor(
                sem_img[off : off + n_cls], labels_gt[i]
            )
            off += n_cls
        sem_loss = cfg.weight_sem_level * level_loss
        if cfg.use_mlp and mlp is not None:
            leaf_ce = cross_entropy_mean_cmajor(mlp_apply(mlp, sem_img), labels_gt[-1])
            gate = (jnp.asarray(iter_idx) >= cfg.mlp_gate_iter).astype(jnp.float32)
            sem_loss = sem_loss + cfg.weight_sem_leaf * gate * leaf_ce
        losses["sem"] = sem_loss
        loss = loss + cfg.w_sem * sem_loss

    losses["loss"] = loss
    return loss, losses
