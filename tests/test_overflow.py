"""Binning-overflow quality regression: truncating the per-tile list at K
must not materially change the render, because transmittance terminates
blending after ~tens of hits (T < 1e-4 stop, forward.cu:357-362).  This
bounds the image-space error of the static caps (VERDICT round-1 item 3)."""
import numpy as np
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
    assert bc.esc is not None
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
