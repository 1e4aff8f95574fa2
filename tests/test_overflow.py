"""Binning-overflow quality regression: truncating the per-tile list at K
must not materially change the render, because transmittance terminates
blending after ~tens of hits (T < 1e-4 stop, forward.cu:357-362).  This
bounds the image-space error of the static caps (VERDICT round-1 item 3)."""
import numpy as np
import pytest
import jax.numpy as jnp

from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig, rasterize


def _dense_scene(n=3000, seed=0):
    """Near-opaque surfel clutter (SLAM maps after densification are
    dominated by high-opacity surface gaussians), dense enough that per-tile
    counts far exceed K=64: per-pixel transmittance saturates within the
    kept nearest-K, so the far tail the cap drops is invisible."""
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-0.6, 0.6, n), rng.uniform(-0.45, 0.45, n),
         rng.uniform(1.0, 3.0, n)], -1,
    ).astype(np.float32)
    return dict(
        means3D=jnp.asarray(means),
        colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        opacities=jnp.asarray(
            1 / (1 + np.exp(-rng.normal(3.5, 0.5, n))).astype(np.float32)
        ),
        scales=jnp.asarray(rng.uniform(0.05, 0.12, (n, 1)).astype(np.float32)),
        rotations=jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)),
    )


@pytest.mark.slow
def test_overflow_truncation_bounded_error():
    camera = setup_camera(64, 48, intrinsics_matrix(40, 40, 32, 24), np.eye(4))
    s = _dense_scene()

    def render(k):
        rc = RasterConfig(max_per_tile=k, gaussian_chunk=64, tile_batch=4,
                          max_tiles_per_gaussian=16)
        return rasterize(
            s["means3D"], s["colors"], s["opacities"], s["scales"],
            s["rotations"], camera, config=rc,
        )

    lo = render(64)
    hi = render(1024)
    assert int(lo.n_dropped) > 0, "test scene must actually overflow at K=64"
    assert int(hi.n_dropped) < int(lo.n_dropped)
    mse = float(jnp.mean((jnp.clip(lo.im, 0, 1) - jnp.clip(hi.im, 0, 1)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    # depth-sorted truncation only drops far-tail gaussians behind an
    # almost-opaque front -> tiny image error
    assert psnr > 30.0, f"overflow-induced PSNR {psnr:.1f} dB too low"
    # depth image agrees too
    d_mae = float(jnp.mean(jnp.abs(lo.depth - hi.depth)))
    assert d_mae < 0.05, d_mae


@pytest.mark.slow
def test_escalated_k_matches_big_k_exactly():
    """With escalate_tiles covering every overflowing tile and escalate_k
    >= the max true count, the two-population render must EQUAL the plain
    big-K render — same depth order, same math, merged per tile
    (VERDICT r2 item 3: bound the truncation error at shipped K)."""
    import jax

    camera = setup_camera(64, 48, intrinsics_matrix(40, 40, 32, 24), np.eye(4))
    s = _dense_scene()

    def render(rc):
        return rasterize(
            s["means3D"], s["colors"], s["opacities"], s["scales"],
            s["rotations"], camera, config=rc,
        )

    rc_small = RasterConfig(max_per_tile=32, gaussian_chunk=32, tile_batch=4,
                            max_tiles_per_gaussian=16)
    rc_esc = RasterConfig(max_per_tile=32, gaussian_chunk=32, tile_batch=4,
                          max_tiles_per_gaussian=16,
                          escalate_tiles=12, escalate_k=4096)
    rc_big = RasterConfig(max_per_tile=4096, gaussian_chunk=32, tile_batch=4,
                          max_tiles_per_gaussian=16)
    lo, esc, big = render(rc_small), render(rc_esc), render(rc_big)

    # scene overflows at K=32 on all 12 tiles; escalation recovers every
    # dropped pair (12 tiles cover the whole 4x3-tile image)
    assert int(lo.n_dropped) > 0
    assert int(esc.n_dropped) == 0, int(esc.n_dropped)
    np.testing.assert_allclose(np.asarray(esc.im), np.asarray(big.im), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(esc.depth), np.asarray(big.depth), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(esc.median_depth), np.asarray(big.median_depth), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(esc.final_opacity), np.asarray(big.final_opacity), atol=1e-5
    )

    # gradients agree with the big-K render too (both exact routings)
    def loss(rc):
        def f(means, colors, opa):
            out = rasterize(
                means, colors, opa, s["scales"], s["rotations"], camera,
                config=rc,
            )
            return jnp.sum(out.im**2) + jnp.sum(out.depth**2)
        return jax.grad(f, argnums=(0, 1, 2))(
            s["means3D"], s["colors"], s["opacities"]
        )

    g_esc = loss(rc_esc)
    g_big = loss(rc_big)
    # forward is bit-exact; gradients differ only in fp summation order
    # (escalated tiles route through the combined inverse map with their
    # discarded base rows contributing exact zeros)
    for a, b in zip(g_esc, g_big):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=5e-3
        )


@pytest.mark.slow
def test_escalation_with_amortized_binning():
    """compute_binning carries the escalated lists through the cache path
    (the mapper's amortized window binning)."""
    from hierslam_tpu.ops.rasterize import compute_binning

    camera = setup_camera(64, 48, intrinsics_matrix(40, 40, 32, 24), np.eye(4))
    s = _dense_scene()
    rc = RasterConfig(max_per_tile=32, gaussian_chunk=32, tile_batch=4,
                      max_tiles_per_gaussian=16,
                      escalate_tiles=12, escalate_k=1024)
    bc = compute_binning(
        s["means3D"], jnp.tile(s["scales"], (1, 3)), s["rotations"], camera, rc
    )
    # legacy escalate knobs translate to a 2-class capacity ladder
    assert len(bc.lists.idx) == 2 and bc.lists.idx[0].shape[1] == 1024
    cached = rasterize(
        s["means3D"], s["colors"], s["opacities"], s["scales"],
        s["rotations"], camera, config=rc, binning_cache=bc,
    )
    fresh = rasterize(
        s["means3D"], s["colors"], s["opacities"], s["scales"],
        s["rotations"], camera, config=rc,
    )
    np.testing.assert_allclose(
        np.asarray(cached.im), np.asarray(fresh.im), atol=1e-5
    )


def _big_splat_scene(n=1500, seed=0):
    """Dense near-opaque BIG splats (sigma >= the 8px quadrant size): the
    conservative quadrant alpha bounds only bind when gaussians cover
    whole quadrants — the regime where saturation capping pays off
    (close-up surfaces, post-densification foreground splats)."""
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-0.6, 0.6, n), rng.uniform(-0.45, 0.45, n),
         rng.uniform(1.0, 3.0, n)], -1,
    ).astype(np.float32)
    return dict(
        means3D=jnp.asarray(means),
        colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        opacities=jnp.asarray(
            1 / (1 + np.exp(-rng.normal(3.5, 0.5, n))).astype(np.float32)
        ),
        scales=jnp.asarray(rng.uniform(0.5, 1.0, (n, 1)).astype(np.float32)),
        rotations=jnp.asarray(np.tile([1.0, 0, 0, 0], (n, 1)).astype(np.float32)),
    )


@pytest.mark.slow
def test_saturation_masking_is_invisible():
    """sat_margin masks only pairs whose transmittance PROVABLY saturates
    above them (conservative quadrant alpha bounds, binning.py): at the
    binning parameters the saturated render must match the full render to
    fp noise — those pairs fail the blend's own committed test
    (forward.cu:358-366) and contribute nothing forward or backward."""
    import jax

    from hierslam_tpu.ops.rasterize import compute_binning

    camera = setup_camera(64, 48, intrinsics_matrix(40, 40, 32, 24), np.eye(4))
    s = _big_splat_scene()

    def render_and_grads(rc):
        def f(means, colors, opa):
            out = rasterize(
                means, colors, opa, s["scales"], s["rotations"], camera,
                config=rc,
            )
            return (
                jnp.sum(out.im**2) + jnp.sum(out.depth**2),
                (out.im, out.depth, out.final_opacity, out.median_depth,
                 out.n_dropped),
            )

        grads, aux = jax.grad(f, argnums=(0, 1, 2), has_aux=True)(
            s["means3D"], s["colors"], s["opacities"]
        )
        return aux, grads

    rc_full = RasterConfig(max_per_tile=4096, gaussian_chunk=32, tile_batch=4,
                           max_tiles_per_gaussian=16)
    rc_sat = RasterConfig(max_per_tile=4096, gaussian_chunk=32, tile_batch=4,
                          max_tiles_per_gaussian=16,
                          sat_margin=2.0, sat_floor=8)
    (im_f, d_f, fo_f, md_f, drop_f), g_f = render_and_grads(rc_full)
    (im_s, d_s, fo_s, md_s, drop_s), g_s = render_and_grads(rc_sat)

    # the dense scene must actually trigger saturation masking
    bc = compute_binning(
        s["means3D"], jnp.tile(s["scales"], (1, 3)), s["rotations"], camera,
        rc_sat, opacities=s["opacities"],
    )
    assert int(bc.lists.n_sat_masked) > 0, "scene must saturate"
    assert int(np.asarray(bc.lists.k_eff).max()) < int(
        np.asarray(bc.lists.count).max()
    )

    np.testing.assert_allclose(np.asarray(im_s), np.asarray(im_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_s), np.asarray(d_f), atol=1e-4)
    np.testing.assert_allclose(np.asarray(md_s), np.asarray(md_f), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fo_s), np.asarray(fo_f), atol=1e-5)
    for a, b in zip(g_s, g_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3
        )


def test_saturation_respects_floor_and_margin():
    """k_eff >= sat_floor everywhere and k_eff == count where nothing
    saturates (transparent scenes are never truncated)."""
    from hierslam_tpu.ops.rasterize import compute_binning

    camera = setup_camera(64, 48, intrinsics_matrix(40, 40, 32, 24), np.eye(4))
    s = _dense_scene()
    # near-transparent: no pair can be provably invisible
    faint = jnp.full_like(s["opacities"], 0.02)
    rc = RasterConfig(max_per_tile=4096, gaussian_chunk=32, tile_batch=4,
                      max_tiles_per_gaussian=16, sat_margin=2.0, sat_floor=8)
    bc = compute_binning(
        s["means3D"], jnp.tile(s["scales"], (1, 3)), s["rotations"], camera,
        rc, opacities=faint,
    )
    assert int(bc.lists.n_sat_masked) == 0
    np.testing.assert_array_equal(
        np.asarray(bc.lists.k_eff), np.asarray(bc.lists.count)
    )
