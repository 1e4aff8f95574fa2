"""Golden-value tests: XLA tile renderer vs an independent numpy port of the
reference CUDA semantics, plus gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierslam_tpu.core.camera import setup_camera, intrinsics_matrix
from hierslam_tpu.ops.rasterize import RasterConfig, rasterize

from golden import golden_render, make_scene


def to_camera(cam):
    K = intrinsics_matrix(cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    return setup_camera(cam["W"], cam["H"], K, cam["w2c"])


@pytest.mark.parametrize("sem", [0, 6])
@pytest.mark.parametrize("seed", [0, 1])
def test_forward_matches_golden(sem, seed):
    scene, cam = make_scene(n=80, seed=seed, W=40, H=24, sem=sem)
    ref = golden_render(
        scene["means3D"], scene["colors"], scene["opacities"], scene["scales"],
        scene["rotations"], cam["w2c"], cam["full_proj"], cam["fx"], cam["fy"],
        cam["tan_fovx"], cam["tan_fovy"], cam["W"], cam["H"],
        semantics=scene["semantics"],
    )
    camera = to_camera(cam)
    out = rasterize(
        jnp.asarray(scene["means3D"], jnp.float32),
        jnp.asarray(scene["colors"], jnp.float32),
        jnp.asarray(scene["opacities"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rotations"], jnp.float32),
        camera,
        semantics=None if sem == 0 else jnp.asarray(scene["semantics"], jnp.float32),
        config=RasterConfig(max_per_tile=128, gaussian_chunk=32, tile_batch=2),
    )
    assert int(out.n_dropped) == 0
    np.testing.assert_allclose(np.asarray(out.im), ref["im"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.depth), ref["depth"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.median_depth), ref["median_depth"], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.final_opacity), ref["final_opacity"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.mask), ref["mask"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.radii), ref["radii"])
    if sem:
        np.testing.assert_allclose(np.asarray(out.semantic), ref["semantic"], atol=2e-3)


@pytest.mark.slow
def test_active_mask_removes_gaussians():
    scene, cam = make_scene(n=50, seed=3)
    camera = to_camera(cam)
    args = [
        jnp.asarray(scene["means3D"], jnp.float32),
        jnp.asarray(scene["colors"], jnp.float32),
        jnp.asarray(scene["opacities"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rotations"], jnp.float32),
    ]
    cfg = RasterConfig(max_per_tile=128, gaussian_chunk=32, tile_batch=2)
    active = jnp.arange(50) < 25
    out_masked = rasterize(*args, camera, active=active, config=cfg)
    out_subset = rasterize(*[a[:25] for a in args], camera, config=cfg)
    np.testing.assert_allclose(
        np.asarray(out_masked.im), np.asarray(out_subset.im), atol=1e-5
    )
    assert np.all(np.asarray(out_masked.radii[25:]) == 0)


def sequential_reference_render(means, colors, opac, scales, rots, camera, tile=(16, 16)):
    """Trivially-faithful differentiable port of the CUDA per-pixel loop:
    a lax.scan over depth-sorted Gaussians carrying per-pixel transmittance.
    Used as the gradient oracle for the vectorized tile renderer."""
    from hierslam_tpu.ops import projection

    H, W = camera.height, camera.width
    th, tw = tile
    prep = projection.preprocess(means, scales, rots, camera, tile)
    order = jnp.argsort(jnp.where(prep.valid, prep.depth, jnp.inf), stable=True)

    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    ptx, pty = xs // tw, ys // th

    def step(carry, i):
        T, done, C, D, Mm, med = carry
        xy, con, dep = prep.xy[i], prep.conic[i], prep.depth[i]
        rmin, rmax = prep.rect_min[i], prep.rect_max[i]
        in_tile = (ptx >= rmin[0]) & (ptx < rmax[0]) & (pty >= rmin[1]) & (pty < rmax[1])
        dx, dy = xy[0] - xs, xy[1] - ys
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(0.99, opac[i] * jnp.exp(power))
        can = prep.valid[i] & in_tile & (power <= 0) & (alpha >= 1 / 255.0) & ~done
        test_T = T * (1 - alpha)
        trigger = can & (test_T < 1e-4)
        apply = can & ~trigger
        w = jnp.where(apply, alpha * T, 0.0)
        C = C + w[None] * colors[i][:, None, None]
        D = D + w * dep
        Mm = Mm + w
        med = jnp.where(apply & (T > 0.5) & (test_T < 0.5), dep, med)
        T = jnp.where(apply, test_T, T)
        done = done | trigger
        return (T, done, C, D, Mm, med), None

    init = (
        jnp.ones((H, W)),
        jnp.zeros((H, W), bool),
        jnp.zeros((3, H, W)),
        jnp.zeros((H, W)),
        jnp.zeros((H, W)),
        jnp.full((H, W), 15.0),
    )
    (T, done, C, D, Mm, med), _ = jax.lax.scan(step, init, order)
    return C, D, med, 1.0 - T, Mm


@pytest.mark.slow
def test_gradients_vs_sequential_reference():
    """Forward AND gradients of the vectorized chunked renderer must match an
    independent sequential scan implementation."""
    scene, cam = make_scene(n=70, seed=11, W=40, H=24)
    camera = to_camera(cam)
    cfg = RasterConfig(max_per_tile=128, gaussian_chunk=16, tile_batch=3)
    inputs = (
        jnp.asarray(scene["means3D"], jnp.float32),
        jnp.asarray(scene["colors"], jnp.float32),
        jnp.asarray(scene["opacities"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rotations"], jnp.float32),
    )

    def loss_tile(means, colors, opac, scales, rots):
        out = rasterize(means, colors, opac, scales, rots, camera, config=cfg)
        return (
            jnp.sum(out.im**2)
            + jnp.sum(jnp.sin(out.depth))
            + jnp.sum(out.median_depth * 0.01)
            + jnp.sum(out.final_opacity)
        )

    def loss_seq(means, colors, opac, scales, rots):
        C, D, med, fo, _ = sequential_reference_render(means, colors, opac, scales, rots, camera)
        return jnp.sum(C**2) + jnp.sum(jnp.sin(D)) + jnp.sum(med * 0.01) + jnp.sum(fo)

    v1, g1 = jax.value_and_grad(loss_tile, argnums=(0, 1, 2, 3, 4))(*inputs)
    v2, g2 = jax.value_and_grad(loss_seq, argnums=(0, 1, 2, 3, 4))(*inputs)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_gradients_vs_finite_difference():
    scene, cam = make_scene(n=12, seed=4, W=16, H=16)
    camera = to_camera(cam)
    cfg = RasterConfig(tile_shape=(16, 16), max_per_tile=32, gaussian_chunk=8, tile_batch=1)
    target = jnp.zeros((3, 16, 16))

    @jax.jit
    def loss_fn(means, colors, opac):
        out = rasterize(
            means,
            colors,
            opac,
            jnp.asarray(scene["scales"], jnp.float32),
            jnp.asarray(scene["rotations"], jnp.float32),
            camera,
            config=cfg,
        )
        return jnp.sum((out.im - target) ** 2) + 0.1 * jnp.sum(out.depth)

    means = jnp.asarray(scene["means3D"], jnp.float32)
    colors = jnp.asarray(scene["colors"], jnp.float32)
    opac = jnp.asarray(scene["opacities"], jnp.float32)

    grads = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))(means, colors, opac)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)

    # Spot-check against central differences on a few coordinates.
    rng = np.random.default_rng(0)
    eps = 1e-3
    f0 = loss_fn(means, colors, opac)
    for _ in range(4):
        i = int(rng.integers(12))
        j = int(rng.integers(3))
        e = jnp.zeros_like(colors).at[i, j].set(eps)
        fd = (loss_fn(means, colors + e, opac) - loss_fn(means, colors - e, opac)) / (2 * eps)
        np.testing.assert_allclose(float(grads[1][i, j]), float(fd), rtol=0.05, atol=1e-3)
    assert np.isfinite(float(f0))


@pytest.mark.slow
def test_overflow_is_reported():
    scene, cam = make_scene(n=400, seed=5, W=16, H=16)
    camera = to_camera(cam)
    cfg = RasterConfig(tile_shape=(16, 16), max_per_tile=16, gaussian_chunk=8, tile_batch=1)
    out = rasterize(
        jnp.asarray(scene["means3D"], jnp.float32),
        jnp.asarray(scene["colors"], jnp.float32),
        jnp.asarray(scene["opacities"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rotations"], jnp.float32),
        camera,
        config=cfg,
    )
    assert int(out.n_dropped) > 0


@pytest.mark.slow
def test_grad_pair_budget():
    """A grad_pair_budget >= the true valid-reference count must leave
    gradients EXACTLY unchanged; an under-budget run reports the shortfall
    in n_grad_dropped and still returns finite gradients."""
    scene, cam = make_scene(n=70, seed=11, W=40, H=24)
    camera = to_camera(cam)
    inputs = (
        jnp.asarray(scene["means3D"], jnp.float32),
        jnp.asarray(scene["colors"], jnp.float32),
        jnp.asarray(scene["opacities"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rotations"], jnp.float32),
    )

    def loss(budget):
        cfg = RasterConfig(max_per_tile=128, gaussian_chunk=16, tile_batch=3,
                           grad_pair_budget=budget)

        def f(*args):
            out = rasterize(*args, camera, config=cfg)
            return jnp.sum(out.im**2) + jnp.sum(jnp.sin(out.depth)), out

        (v, out), g = jax.value_and_grad(f, argnums=(0, 1, 2), has_aux=True)(*inputs)
        return v, g, out

    v0, g0, out0 = loss(0)
    n_valid = int(jnp.sum(jnp.minimum(out0.tile_count, 128)))
    assert int(out0.n_grad_dropped) == 0

    v1, g1, out1 = loss(n_valid + 8)
    assert int(out1.n_grad_dropped) == 0
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    v2, g2, out2 = loss(max(8, n_valid // 2))
    assert int(out2.n_grad_dropped) > 0
    assert all(np.all(np.isfinite(np.asarray(g))) for g in g2)


@pytest.mark.slow
def test_xla_backend_matches_pallas_with_ladder():
    """The XLA fallback blend renders the bucketed capacity-class path
    identically to the (interpret-mode) Pallas blend."""
    from dataclasses import replace as dc_replace

    scene, cam = make_scene(n=120, seed=2, W=64, H=48, sem=0)
    camera = to_camera(cam)
    args = [
        jnp.asarray(scene["means3D"], jnp.float32),
        jnp.asarray(scene["colors"], jnp.float32),
        jnp.asarray(scene["opacities"], jnp.float32),
        jnp.asarray(scene["scales"], jnp.float32),
        jnp.asarray(scene["rotations"], jnp.float32),
        camera,
    ]
    rc = RasterConfig(max_per_tile=128, gaussian_chunk=32, tile_batch=2,
                      bucket_spec=((3, 256), (5, 128), (-1, 64)))
    a = rasterize(*args, config=rc)
    b = rasterize(*args, config=dc_replace(rc, backend="xla"))
    np.testing.assert_allclose(np.asarray(a.im), np.asarray(b.im), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(a.final_opacity), np.asarray(b.final_opacity), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(a.median_depth), np.asarray(b.median_depth), atol=1e-4
    )
