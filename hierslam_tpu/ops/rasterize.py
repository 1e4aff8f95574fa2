"""Public differentiable rasterizer API.

Equivalent of ``GaussianRasterizer`` / ``GaussianRasterizer_semantic``
(diff_gaussian_rasterization/__init__.py:175-431): forward returns
``(im, radii, depth, median_depth, final_opacity, mask[, semantic])`` with
the exact output conventions of the reference CUDA kernels, and is fully
differentiable w.r.t. means/colors/opacities/scales/rotations/semantics.

Unlike the reference, the semantic channel count is a runtime array width —
not a compile-time ``NUM_SEMANTIC`` #define (cuda_rasterizer/config.h:18) —
so one build serves every dataset/tree configuration.

TPU-first structure (replacing the CUDA duplicate+radix-sort pipeline,
rasterizer_impl.cu:281-312):

1. ``preprocess`` — elementwise screen-space projection (XLA fuses);
2. ``bin_gaussians`` — depth sort + static per-tile top-K lists, plus a
   scatter-free inverse map for gradient routing;
3. one custom-VJP gather into [T, K, ...] per-tile arrays;
4. ``blend_tiles`` — chunked cumprod transmittance + matmul accumulation.

Binning may be AMORTIZED: pass ``binning=`` (built with a pixel margin via
:func:`bin_for_params`) to reuse tile lists across optimizer iterations;
the blend re-applies the CURRENT pose's rect culling per slot, so results
remain exact as long as the margin covers the pose/param drift since the
lists were built.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hierslam_tpu.ops import binning, projection, render_xla
from hierslam_tpu.ops.gather_vjp import (
    InverseMap,
    build_inverse_map,
    gather_rows,
    pack_cols_table,
)


@dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer knobs (shape-defining: changing them recompiles)."""

    tile_shape: Tuple[int, int] = (16, 16)
    max_per_tile: int = 1024          # K: per-tile Gaussian capacity
    gaussian_chunk: int = 256         # G: blend chunk along the Gaussian axis
    tile_batch: int = 64              # tiles composited per scan step
    bin_chunk: int = 16384            # gaussians per binning scan step
    max_refs: int = 16                # DEPRECATED: unused — the segmented-scan
                                      # backward routes gradients exactly for
                                      # any number of per-gaussian references
    max_tiles_per_gaussian: int = 16  # per-gaussian tile-emission capacity
    backend: str = "pallas"           # blend backend: "pallas" (fused) | "xla"
    pallas_interpret: bool = False    # interpret-mode Pallas (CPU debugging)
    grad_pair_budget: int = 0         # backward gradient-routing cap on valid
                                      # (tile, slot) refs; 0 = route all T*K
                                      # (exact).  Overflow -> n_grad_dropped.
    grad_bf16: bool = False           # bf16 cotangent permutation (f32 accum)
    track_max_per_tile: int = 0       # pose-tracking per-tile K (0 = use
                                      # max_per_tile).  Tracking only reads
                                      # sil-saturated pixels, which blend to
                                      # opacity within the nearest few dozen
                                      # gaussians — a smaller K cuts the
                                      # per-iteration blend cost linearly;
                                      # drops are counted like any overflow.
    escalate_tiles: int = 0           # legacy knob: shorthand for the
                                      # 2-class bucket_spec
                                      # ((escalate_tiles, escalate_k),
                                      #  (-1, max_per_tile)) — the OB
                                      # highest-need tiles render at
                                      # escalate_k slots, the rest at K.
    escalate_k: int = 0               # K_big for escalated tiles (0 = 4x
                                      # max_per_tile when escalate_tiles > 0)
    track_bucket_spec: Optional[Tuple[Tuple[int, int], ...]] = None
                                      # capacity ladder for the tracking
                                      # fast path (None = bucket_spec /
                                      # track_max_per_tile translation)
    bucket_spec: Optional[Tuple[Tuple[int, int], ...]] = None
                                      # capacity-class ladder ((n, k), ...,
                                      # (-1, k_min)): tiles are RANKED by
                                      # per-tile need and assigned to
                                      # classes, each rendered once at its
                                      # class capacity on a virtual tile
                                      # grid.  The CUDA reference renders
                                      # every overlap but terminates pixels
                                      # at T < 1e-4 (forward.cu:358-366) —
                                      # its work is saturation-bounded;
                                      # this is the static-shape analogue.
                                      # None = derived from max_per_tile /
                                      # escalate knobs.
    sat_margin: float = 0.0           # > 0 enables the saturation bound on
                                      # per-tile need: keep sat_margin x
                                      # the provable all-pixels-saturated
                                      # depth rank (conservative corner
                                      # alpha bounds, see binning.py).  The
                                      # margin covers param drift while
                                      # amortized lists stay live.  0 = off
                                      # (need = true overlap count).
    sat_floor: int = 64               # minimum per-tile kept rank under
                                      # saturation capping
    track_sat_margin: float = -1.0    # tracking-cache saturation margin
                                      # override (-1 = use sat_margin;
                                      # 0 disables capping for tracking
                                      # only).  The tracking cache is
                                      # rebuilt per frame, so its margin
                                      # only needs to cover in-frame pose
                                      # drift — but an under-margined cap
                                      # truncates the silhouette-saturated
                                      # pixels tracking reads.
    visible_budget: int = 0           # > 0: amortized (cached) binning is
                                      # built in VISIBLE-RANK space — the
                                      # mapper compacts per-gaussian work
                                      # (transforms, tables, gradient
                                      # heads, emission sorts, inverse-map
                                      # probes) to the first V gaussians
                                      # of the touched-descending order.
                                      # Gaussians ranked past V drop
                                      # (counted in n_dropped; the runner
                                      # warns).  0 = off.  Fresh
                                      # (uncached) rasterize calls always
                                      # run full-N.
    densify_max_per_tile: int = 0     # per-tile K for the densify
                                      # non-presence render (0 = 2x
                                      # max_per_tile, capped at 4096).  At
                                      # real densities a truncated K leaves
                                      # silhouette holes behind in-tile
                                      # depth discontinuities, and those
                                      # pixels get re-densified every phase
                                      # (unbounded map bloat); the densify
                                      # render is forward-only and runs
                                      # once per phase, so a generous K is
                                      # near-free.

    stream_rows: int = 0              # stream backend: global pair budget in
                                      # 128-pair rows (ops/binning.bin_stream
                                      # waterfilling).  0 = dense fallback
                                      # (num_tiles x stream_cap/128 rows —
                                      # exact, for tests/small scenes).
    stream_cap: int = 4096            # stream backend: hard per-tile pair
                                      # cap (sets the backward kernel's
                                      # per-tile VMEM scratch)

    def __post_init__(self):
        if self.backend not in ("pallas", "xla", "stream"):
            raise ValueError(f"unknown blend backend {self.backend!r}")

    def stream_rows_for(self, grid: Tuple[int, int]) -> int:
        if self.stream_rows:
            return self.stream_rows
        return grid[0] * grid[1] * (self.stream_cap // 128)

    @property
    def esc_k(self) -> int:
        return self.escalate_k or 4 * self.max_per_tile

    def spec(self) -> Tuple[Tuple[int, int], ...]:
        """The unresolved capacity-class ladder for this config."""
        if self.bucket_spec is not None:
            return tuple(tuple(e) for e in self.bucket_spec)
        if self.escalate_tiles > 0:
            return ((self.escalate_tiles, self.esc_k), (-1, self.max_per_tile))
        return ((-1, self.max_per_tile),)

    def grid(self, height: int, width: int) -> Tuple[int, int]:
        th, tw = self.tile_shape
        return ((height + th - 1) // th, (width + tw - 1) // tw)


class Binning(NamedTuple):
    lists: binning.BucketedLists
    # ONE inverse map over ALL capacity classes (each class's lists
    # reshaped to k_min-wide virtual rows): one gather, one
    # gradient-routing pass, one set of rank probes — a second map's
    # probes alone cost ~35 ms/frame at N=2M because probe count (N),
    # not list size, dominates.
    inverse: InverseMap


class RenderOutput(NamedTuple):
    im: jax.Array                 # [3, H, W]
    radii: jax.Array              # [N] int32
    depth: jax.Array              # [H, W] alpha-blended depth
    median_depth: jax.Array       # [H, W] transmittance-median depth
    final_opacity: jax.Array      # [H, W] 1 - final transmittance
    mask: jax.Array               # [H, W] accumulated blend mass
    semantic: Optional[jax.Array]  # [S, H, W] or None
    n_dropped: jax.Array          # [] int32 binning overflow count
    tile_count: jax.Array         # [T] int32 per-tile gaussian counts
    # inverse-map gradient-route drops (0 whenever max_refs >=
    # max_tiles_per_gaussian, enforced at RasterConfig construction);
    # None for cached-tracking renders that bypass the inverse map.
    n_grad_dropped: Optional[jax.Array] = None


def _slot_ok(idx, g_rect, tx, ty):
    """Live-slot mask: real index + current-pose rect/frustum re-check."""
    return (
        (idx >= 0)
        & (g_rect[..., 4] > 0.5)
        & (tx >= g_rect[..., 0]) & (tx < g_rect[..., 2])
        & (ty >= g_rect[..., 1]) & (ty < g_rect[..., 3])
    )


def _assemble_buckets(strips, ids_list, grid, tile_shape, H, W):
    """Assemble a [C, H, W] image from per-class virtual-grid strips.

    strips[b]: [C, th, n_b*tw] (class b's tile j at columns [j*tw,
    (j+1)*tw)); ids_list[b]: [n_b] true tile ids.  Every tile id appears
    exactly once across the classes (the classes partition the rank
    order), so the assembly is ONE permutation gather of tile blocks —
    differentiable, exact for edge tiles (assembled on the padded tile
    grid, then cropped)."""
    gy, gx = grid
    th, tw = tile_shape
    pieces = []
    for s, ids in zip(strips, ids_list):
        nb = ids.shape[0]
        if nb == 0:
            continue
        C = s.shape[0]
        pieces.append(s.reshape(C, th, nb, tw).transpose(2, 0, 1, 3))
    tiles_all = jnp.concatenate(pieces, axis=0)       # [T, C, th, tw]
    pos = jnp.zeros((gy * gx,), jnp.int32)
    off = 0
    for ids in ids_list:
        nb = ids.shape[0]
        if nb == 0:
            continue
        pos = pos.at[ids].set(off + jnp.arange(nb, dtype=jnp.int32))
        off += nb
    merged = tiles_all[pos]                            # [T, C, th, tw]
    C = merged.shape[1]
    out = merged.reshape(gy, gx, C, th, tw).transpose(2, 0, 3, 1, 4)
    return out.reshape(C, gy * th, gx * tw)[:, :H, :W]


def _normalize_inputs(opacities, scales):
    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if scales.ndim == 2 and scales.shape[1] == 1:
        scales = jnp.tile(scales, (1, 3))
    return opacities, scales


def _bin_from_prep(prep, grid, config: RasterConfig, opacities=None,
                   visible_budget: int = 0):
    sat = config.sat_margin > 0.0 and opacities is not None
    return binning.bin_bucketed(
        prep.rect_min, prep.rect_max, prep.valid,
        jax.lax.stop_gradient(prep.depth), grid, config.spec(),
        config.tile_shape,
        max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        sat_margin=config.sat_margin if sat else 0.0,
        sat_floor=config.sat_floor,
        xy=jax.lax.stop_gradient(prep.xy) if sat else None,
        conic=jax.lax.stop_gradient(prep.conic) if sat else None,
        opacity=jax.lax.stop_gradient(opacities) if sat else None,
        visible_budget=visible_budget,
    )


def compute_binning(
    means3D: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    camera,
    config: RasterConfig,
    active: Optional[jax.Array] = None,
    margin_px: float = 0.0,
    pixel_offset_y=0.0,
    opacities: Optional[jax.Array] = None,
    compact: bool = False,
) -> Binning:
    """Tile lists + inverse gradient map for the given (camera-frame) means.

    ``margin_px`` inflates the screen rects so the lists stay valid while
    the pose/params drift during an optimization window (amortized binning).
    ``opacities`` (post-sigmoid, [N] or [N, 1]) enables the saturation
    bound when ``config.sat_margin > 0``.  ``compact=True`` applies
    ``config.visible_budget`` and returns VISIBLE-RANK lists — only for
    callers that compact their per-gaussian inputs to the cache's
    ``vis_ids`` prefix (``slam.losses.render_gaussians`` does this
    automatically when the cache carries one).
    """
    _, scales = _normalize_inputs(jnp.zeros(means3D.shape[0]), scales)
    prep = projection.preprocess(
        jax.lax.stop_gradient(means3D),
        jax.lax.stop_gradient(scales),
        jax.lax.stop_gradient(rotations),
        camera, config.tile_shape, active=active,
        pixel_offset_y=pixel_offset_y, radius_margin_px=margin_px,
    )
    grid = config.grid(camera.height, camera.width)
    lists = _bin_from_prep(
        prep, grid, config, opacities,
        visible_budget=config.visible_budget if compact else 0,
    )
    n_rows = (
        lists.vis_ids.shape[0] if lists.vis_ids is not None
        else means3D.shape[0]
    )
    inverse = build_inverse_map(
        _combined_idx(lists), n_rows, config.max_tiles_per_gaussian
    )
    return Binning(lists=lists, inverse=inverse)


def _combined_idx(lists: binning.BucketedLists):
    """All capacity classes' lists reshaped to k_min-wide virtual rows —
    one index array for one gather + one inverse map.  k_min is the LAST
    class's capacity (every class k is a multiple of it by construction)."""
    k_min = lists.idx[-1].shape[1]
    return jnp.concatenate(
        [x.reshape(-1, k_min) for x in lists.idx if x.shape[0] > 0], axis=0
    )


def rasterize(
    means3D: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    camera,
    semantics: Optional[jax.Array] = None,
    active: Optional[jax.Array] = None,
    config: RasterConfig = RasterConfig(),
    pixel_offset_y=0.0,
    binning_cache: Optional[Binning] = None,
    means2D_offset: Optional[jax.Array] = None,
) -> RenderOutput:
    """Rasterize N Gaussians into the camera.

    Args:
        means3D: [N, 3] (world frame; usually pre-transformed to the current
            camera frame with ``camera.w2c = I``, as the reference does).
        colors: [N, 3] precomputed RGB (sh_degree is 0 in the SLAM path).
        opacities: [N] or [N, 1] post-sigmoid opacity.
        scales: [N, 3] or [N, 1] post-exp scales (isotropic tiles to 3).
        rotations: [N, 4] unit quaternions (w, x, y, z).
        semantics: optional [N, S] per-Gaussian semantic embedding
            (raw logits, blended linearly like colors — forward.cu:507-508).
        active: optional [N] bool — capacity-slot liveness mask.
        binning_cache: optional amortized tile lists from
            :func:`compute_binning`; when omitted, binning runs fresh.
    """
    H, W = camera.height, camera.width
    grid = config.grid(H, W)
    opacities, scales = _normalize_inputs(opacities, scales)

    pc = projection.preprocess_cols(
        means3D, scales, rotations, camera, config.tile_shape, active=active,
        pixel_offset_y=pixel_offset_y,
    )

    if binning_cache is None:
        lists = _bin_from_prep(
            pc.stacked(), grid, config, jax.lax.stop_gradient(opacities)
        )
        inverse = build_inverse_map(
            _combined_idx(lists), means3D.shape[0], config.max_tiles_per_gaussian
        )
    else:
        lists, inverse = binning_cache.lists, binning_cache.inverse

    # One fused gather of all per-gaussian blend quantities (custom VJP —
    # backward routes cotangents through the inverse map, never a scatter).
    # The current-pose rect-culling data rides the SAME gather as extra
    # columns (row-gathers cost ~20ns/row regardless of width): the per-slot
    # re-check is then pure dense math — no second gather.  (No-op for fresh
    # binning; restores exact rect semantics for amortized lists.)
    # The table is assembled from 1-D COLUMNS in flat space (pack_cols_table)
    # so exactly one lane-padded buffer materializes — stacking [N, c<128]
    # pieces left ~14 padded 732MB remat copies live at once (N=2M OOM).
    px, py = pc.x, pc.y
    if means2D_offset is not None:
        # zero-valued hook whose gradient is dL/d(screen-space mean) — the
        # reference's retain_grad'ed dummy means2D (slam_helpers.py:119,
        # scripts/hierslam.py:754) feeding classic densification.
        px = px + means2D_offset[:, 0]
        py = py + means2D_offset[:, 1]
    feat_cols = [colors[:, i] for i in range(colors.shape[1])]
    if semantics is not None:
        feat_cols += [semantics[:, i] for i in range(semantics.shape[1])]
    rect_cols = [
        jax.lax.stop_gradient(c.astype(jnp.float32))
        for c in (pc.rect_min_x, pc.rect_min_y, pc.rect_max_x, pc.rect_max_y,
                  pc.valid)
    ]
    c_main = 7 + len(feat_cols)
    table = pack_cols_table(
        [px, py, pc.conic_a, pc.conic_b, pc.conic_c, opacities, pc.depth]
        + feat_cols + rect_cols
    )
    c_rect_end = c_main + 5
    g_comb = gather_rows(
        table, _combined_idx(lists),
        inverse.spos, inverse.ends, inverse.run_masks,
        config.max_tiles_per_gaussian,
        c_main, config.grad_pair_budget, config.grad_bf16,
    )
    k_min = lists.idx[-1].shape[1]
    grid_y, grid_x = grid
    th_, tw_ = config.tile_shape
    interp = config.pallas_interpret or jax.default_backend() == "cpu"

    # Every capacity class renders once, on its own (1, n_b) virtual tile
    # grid: each tile's screen coordinates are translated so class tile j
    # lands at columns [j*tw, (j+1)*tw) — the blend math only sees
    # (xy - pixel), so the translated render is exactly the tile's render
    # at the class capacity.  The strips then assemble by one permutation
    # gather of tile blocks.
    strips_acc, ids_list = [], []
    row_off = 0
    for ids_b, idx_b in zip(lists.tile_ids, lists.idx):
        nb, kb = idx_b.shape
        rows = nb * kb // k_min
        if nb == 0:
            continue
        gb_all = g_comb[row_off:row_off + rows].reshape(nb, kb, -1)
        row_off += rows
        gb = gb_all[..., :c_main]
        gb_rect = jax.lax.stop_gradient(gb_all[..., c_main:c_rect_end])
        btx = (ids_b % grid_x).astype(jnp.float32)[:, None]
        bty = (ids_b // grid_x).astype(jnp.float32)[:, None]
        slot_ok_b = _slot_ok(idx_b, gb_rect, btx, bty)
        j = jnp.arange(nb, dtype=jnp.float32)[:, None]
        shift_x = (j - btx) * tw_
        shift_y = -bty * th_
        gb = gb.at[..., 0].add(shift_x).at[..., 1].add(shift_y)
        if config.backend != "xla":  # "stream" falls back to the fused
            # pallas class blend here: rasterize()'s per-class path serves
            # fresh/densify/eval renders; the streamed path lives behind a
            # StreamBinning cache (slam/losses.render_gaussians)
            from hierslam_tpu.ops.render_pallas import render_tiles_pallas

            acc_b, ft_b, med_b = render_tiles_pallas(
                gb, slot_ok_b, image_shape=(th_, nb * tw_),
                tile_shape=config.tile_shape, grid=(1, nb),
                interpret=interp, chunk=config.gaussian_chunk,
                counts=lists.count[ids_b],
            )
        else:
            acc_b, ft_b, med_b = render_xla.blend_tiles(
                gb[..., 0:2], gb[..., 2:5],
                jnp.where(slot_ok_b, gb[..., 5], 0.0), gb[..., 6],
                gb[..., 7:], slot_ok_b,
                image_shape=(th_, nb * tw_), tile_shape=config.tile_shape,
                grid=(1, nb), chunk=config.gaussian_chunk,
                tile_batch=config.tile_batch,
            )
        # ONE assembly pass: ft/med ride as two extra channels
        strips_acc.append(
            jnp.concatenate([acc_b, ft_b[None], med_b[None]], axis=0)
        )
        ids_list.append(ids_b)

    merged = _assemble_buckets(strips_acc, ids_list, grid, config.tile_shape, H, W)
    acc, final_T, med = merged[:-2], merged[-2], merged[-1]

    im = acc[:3]
    sem = acc[3 : 3 + semantics.shape[1]] if semantics is not None else None
    depth_im = acc[-2]
    mask_im = acc[-1]

    return RenderOutput(
        im=im,
        radii=pc.radius,
        depth=depth_im,
        median_depth=med,
        final_opacity=1.0 - final_T,
        mask=mask_im,
        semantic=sem,
        n_dropped=lists.n_dropped,
        tile_count=lists.count,
        # the segmented-scan backward is exact unless a grad_pair_budget
        # truncates routing below the true valid-reference count (all
        # capacity classes share one inverse map)
        n_grad_dropped=(
            jnp.maximum(lists.n_refs - config.grad_pair_budget, 0)
            if config.grad_pair_budget
            else jnp.zeros((), jnp.int32)
        ),
    )
