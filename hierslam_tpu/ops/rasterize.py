"""Public differentiable rasterizer API.

Equivalent of ``GaussianRasterizer`` / ``GaussianRasterizer_semantic``
(diff_gaussian_rasterization/__init__.py:175-431): forward returns
``(im, radii, depth, median_depth, final_opacity, mask[, semantic])`` with
the exact output conventions of the reference CUDA kernels, and is fully
differentiable w.r.t. means/colors/opacities/scales/rotations/semantics.

Unlike the reference, the semantic channel count is a runtime array width —
not a compile-time ``NUM_SEMANTIC`` #define (cuda_rasterizer/config.h:18) —
so one build serves every dataset/tree configuration.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from hierslam_tpu.ops import binning, projection, render_xla


@dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer knobs (shape-defining: changing them recompiles)."""

    tile_shape: Tuple[int, int] = (16, 16)
    max_per_tile: int = 1024          # K: per-tile Gaussian capacity
    gaussian_chunk: int = 256         # G: blend chunk along the Gaussian axis
    tile_batch: int = 64              # tiles composited per scan step
    bin_chunk: int = 16384            # gaussians per binning scan step

    def grid(self, height: int, width: int) -> Tuple[int, int]:
        th, tw = self.tile_shape
        return ((height + th - 1) // th, (width + tw - 1) // tw)


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
    """
    H, W = camera.height, camera.width
    th, tw = config.tile_shape
    grid = config.grid(H, W)

    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if scales.ndim == 2 and scales.shape[1] == 1:
        scales = jnp.tile(scales, (1, 3))

    prep = projection.preprocess(
        means3D, scales, rotations, camera, config.tile_shape, active=active,
        pixel_offset_y=pixel_offset_y,
    )

    lists = binning.bin_gaussians(
        prep.rect_min,
        prep.rect_max,
        prep.valid,
        jax.lax.stop_gradient(prep.depth),
        grid,
        config.max_per_tile,
        chunk=config.bin_chunk,
    )

    feats = colors if semantics is None else jnp.concatenate([colors, semantics], axis=1)
    acc, final_T, med = render_xla.render_tiles(
        lists.idx,
        prep.xy,
        prep.conic,
        opacities,
        prep.depth,
        feats,
        image_shape=(H, W),
        tile_shape=config.tile_shape,
        grid=grid,
        chunk=config.gaussian_chunk,
        tile_batch=config.tile_batch,
    )

    im = acc[:3]
    sem = acc[3 : 3 + semantics.shape[1]] if semantics is not None else None
    depth_im = acc[-2]
    mask_im = acc[-1]

    return RenderOutput(
        im=im,
        radii=prep.radius,
        depth=depth_im,
        median_depth=med,
        final_opacity=1.0 - final_T,
        mask=mask_im,
        semantic=sem,
        n_dropped=lists.n_dropped,
        tile_count=lists.count,
    )
