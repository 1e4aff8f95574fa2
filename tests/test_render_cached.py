"""Amortized-binning and pose-only cached rendering vs the exact renderer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierslam_tpu.core import transforms
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig, compute_binning, rasterize
from hierslam_tpu.ops.render_tracked import build_track_cache, render_tracked

from golden import make_scene

RC = RasterConfig(max_per_tile=128, gaussian_chunk=32, tile_batch=2, max_refs=16)


def _scene_and_camera(seed=0, n=80):
    scene, cam = make_scene(n=n, seed=seed, W=40, H=24)
    K = intrinsics_matrix(cam["fx"], cam["fy"], cam["cx"], cam["cy"])
    camera = setup_camera(cam["W"], cam["H"], K, cam["w2c"])
    params = {
        "means3D": jnp.asarray(scene["means3D"], jnp.float32),
        "rgb_colors": jnp.asarray(scene["colors"], jnp.float32),
        "unnorm_rotations": jnp.asarray(scene["rotations"], jnp.float32),
        "logit_opacities": jnp.asarray(
            np.log(scene["opacities"] / (1 - scene["opacities"]))[:, None], jnp.float32
        ),
        "log_scales": jnp.asarray(np.log(scene["scales"][:, :1]), jnp.float32),
    }
    return params, camera


def _exact_render(params, camera, q, t, binning_cache=None, camera_grad=False):
    means_cam, _ = transforms.transform_to_frame(
        params["means3D"], params["unnorm_rotations"], q, t,
        gaussians_grad=False, camera_grad=camera_grad,
    )
    return rasterize(
        means_cam,
        params["rgb_colors"],
        jax.nn.sigmoid(params["logit_opacities"][:, 0]),
        jnp.exp(jnp.tile(params["log_scales"], (1, 3))),
        transforms.normalize(params["unnorm_rotations"]),
        camera,
        config=RC,
        binning_cache=binning_cache,
    )


def test_amortized_binning_same_pose_exact():
    params, camera = _scene_and_camera()
    q = jnp.array([1.0, 0, 0, 0])
    t = jnp.zeros(3)
    fresh = _exact_render(params, camera, q, t)
    means_cam, _ = transforms.transform_to_frame(
        params["means3D"], params["unnorm_rotations"], q, t,
        gaussians_grad=False, camera_grad=False,
    )
    cache = compute_binning(
        means_cam, jnp.exp(params["log_scales"]), params["unnorm_rotations"],
        camera, RC, margin_px=8.0,
    )
    cached = _exact_render(params, camera, q, t, binning_cache=cache)
    np.testing.assert_allclose(np.asarray(cached.im), np.asarray(fresh.im), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cached.depth), np.asarray(fresh.depth), atol=1e-4)


def test_amortized_binning_perturbed_pose_close():
    params, camera = _scene_and_camera(seed=2)
    q0 = jnp.array([1.0, 0, 0, 0])
    t0 = jnp.zeros(3)
    q1 = transforms.normalize(jnp.array([1.0, 0.004, -0.003, 0.002]))
    t1 = jnp.array([0.01, -0.008, 0.004])
    means_cam0, _ = transforms.transform_to_frame(
        params["means3D"], params["unnorm_rotations"], q0, t0,
        gaussians_grad=False, camera_grad=False,
    )
    cache = compute_binning(
        means_cam0, jnp.exp(params["log_scales"]), params["unnorm_rotations"],
        camera, RC, margin_px=12.0,
    )
    fresh = _exact_render(params, camera, q1, t1)
    cached = _exact_render(params, camera, q1, t1, binning_cache=cache)
    # identical pair sets (margin covers the drift), possibly different
    # blending order for equal depths -> allow tiny tolerance
    np.testing.assert_allclose(np.asarray(cached.im), np.asarray(fresh.im), atol=1e-3)


def test_render_tracked_matches_exact_at_cache_pose():
    params, camera = _scene_and_camera(seed=3)
    q = transforms.normalize(jnp.array([1.0, 0.01, 0.02, -0.01]))
    t = jnp.array([0.05, -0.02, 0.03])
    cache = build_track_cache(params, None, q, t, camera, RC, margin_px=0.0)
    im, dep, med, fo, mask = render_tracked(cache, q, t, camera, RC)
    exact = _exact_render(params, camera, q, t)
    np.testing.assert_allclose(np.asarray(im), np.asarray(exact.im), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(exact.depth), atol=1e-3)
    np.testing.assert_allclose(np.asarray(med), np.asarray(exact.median_depth), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(fo), np.asarray(exact.final_opacity), atol=1e-4
    )


def test_render_tracked_perturbed_pose_close():
    params, camera = _scene_and_camera(seed=4)
    q0 = jnp.array([1.0, 0, 0, 0])
    t0 = jnp.zeros(3)
    cache = build_track_cache(params, None, q0, t0, camera, RC, margin_px=12.0)
    q1 = transforms.normalize(jnp.array([1.0, 0.005, -0.002, 0.003]))
    t1 = jnp.array([0.012, 0.006, -0.01])
    im, dep, med, fo, mask = render_tracked(cache, q1, t1, camera, RC)
    exact = _exact_render(params, camera, q1, t1)
    np.testing.assert_allclose(np.asarray(im), np.asarray(exact.im), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(exact.depth), atol=1e-2)


def _aniso_scene_and_camera(seed=0, n=80):
    params, camera = _scene_and_camera(seed=seed, n=n)
    rng = np.random.default_rng(seed + 100)
    log_s = np.asarray(params["log_scales"])  # [n, 1]
    per_axis = rng.uniform(np.log(0.5), np.log(2.0), (log_s.shape[0], 3))
    params["log_scales"] = jnp.asarray(log_s + per_axis, jnp.float32)
    return params, camera


def _exact_render_aniso(params, camera, q, t, camera_grad=False):
    means_cam, rots_cam = transforms.transform_to_frame(
        params["means3D"], params["unnorm_rotations"], q, t,
        gaussians_grad=False, camera_grad=camera_grad, transform_rots=True,
    )
    return rasterize(
        means_cam,
        params["rgb_colors"],
        jax.nn.sigmoid(params["logit_opacities"][:, 0]),
        jnp.exp(params["log_scales"]),
        transforms.normalize(rots_cam),
        camera,
        config=RC,
    )


def test_render_tracked_anisotropic_matches_exact_at_cache_pose():
    params, camera = _aniso_scene_and_camera(seed=7)
    q = transforms.normalize(jnp.array([1.0, 0.01, 0.02, -0.01]))
    t = jnp.array([0.05, -0.02, 0.03])
    cache = build_track_cache(params, None, q, t, camera, RC, margin_px=0.0)
    assert cache.scale[0].ndim == 3 and cache.scale[0].shape[-1] == 6
    im, dep, med, fo, mask = render_tracked(cache, q, t, camera, RC)
    exact = _exact_render_aniso(params, camera, q, t)
    np.testing.assert_allclose(np.asarray(im), np.asarray(exact.im), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dep), np.asarray(exact.depth), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(fo), np.asarray(exact.final_opacity), atol=1e-4
    )


@pytest.mark.slow
def test_render_tracked_anisotropic_pose_gradients():
    params, camera = _aniso_scene_and_camera(seed=8)
    q0 = jnp.array([1.0, 0, 0, 0])
    t0 = jnp.zeros(3)
    cache = build_track_cache(params, None, q0, t0, camera, RC, margin_px=12.0)
    target = _exact_render_aniso(params, camera, q0, t0).im

    def loss_cached(q, t):
        im, dep, med, fo, mask = render_tracked(cache, q, t, camera, RC)
        return jnp.sum((im - target) ** 2) + jnp.sum(jnp.sin(dep))

    def loss_exact(q, t):
        out = _exact_render_aniso(params, camera, q, t, camera_grad=True)
        return jnp.sum((out.im - target) ** 2) + jnp.sum(jnp.sin(out.depth))

    q = transforms.normalize(jnp.array([1.0, 0.003, -0.001, 0.002]))
    t = jnp.array([0.005, 0.004, -0.006])
    g1 = jax.grad(loss_cached, argnums=(0, 1))(q, t)
    g2 = jax.grad(loss_exact, argnums=(0, 1))(q, t)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_render_tracked_pose_gradients():
    params, camera = _scene_and_camera(seed=5)
    q0 = jnp.array([1.0, 0, 0, 0])
    t0 = jnp.zeros(3)
    cache = build_track_cache(params, None, q0, t0, camera, RC, margin_px=12.0)
    target = _exact_render(params, camera, q0, t0).im

    def loss_cached(q, t):
        im, dep, med, fo, mask = render_tracked(cache, q, t, camera, RC)
        return jnp.sum((im - target) ** 2) + jnp.sum(jnp.sin(dep))

    def loss_exact(q, t):
        out = _exact_render(params, camera, q, t, camera_grad=True)
        return jnp.sum((out.im - target) ** 2) + jnp.sum(jnp.sin(out.depth))

    q = transforms.normalize(jnp.array([1.0, 0.003, -0.001, 0.002]))
    t = jnp.array([0.005, 0.004, -0.006])
    g1 = jax.grad(loss_cached, argnums=(0, 1))(q, t)
    g2 = jax.grad(loss_exact, argnums=(0, 1))(q, t)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)
