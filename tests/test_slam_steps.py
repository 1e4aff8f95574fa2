"""Unit + behavioral tests of the SLAM layer: Adam parity with torch,
densify/prune slot machinery, tracking convergence on a synthetic scene."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core import transforms
from hierslam_tpu.core.camera import intrinsics_matrix, setup_camera
from hierslam_tpu.ops.rasterize import RasterConfig
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.losses import LossConfig, render_gaussians
from hierslam_tpu.slam.mapping import PruneConfig, make_densifier, make_mapper
from hierslam_tpu.slam.tracking import make_tracker, propagate_pose

RC = RasterConfig(max_per_tile=256, gaussian_chunk=64, tile_batch=4)


def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 3)).astype(np.float32)
    grads = [rng.normal(size=(7, 3)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    params = {"x": jnp.asarray(p0)}
    st = optim.adam_init(params)
    for g in grads:
        params, st = optim.adam_step(params, {"x": jnp.asarray(g)}, st, {"x": 1e-2}, eps=1e-15)
    np.testing.assert_allclose(np.asarray(params["x"]), tp.detach().numpy(), atol=1e-6)


def test_insert_and_overflow():
    params = G.empty_params(10, 4, num_semantic=0)
    variables = G.empty_variables(10)
    fields = {
        "means3D": jnp.arange(24, dtype=jnp.float32).reshape(8, 3),
        "rgb_colors": jnp.ones((8, 3)),
        "unnorm_rotations": jnp.zeros((8, 4)).at[:, 0].set(1.0),
        "logit_opacities": jnp.zeros((8, 1)),
        "log_scales": jnp.zeros((8, 1)),
    }
    mask = jnp.array([1, 0, 1, 1, 0, 1, 1, 1], bool)  # 6 requested
    params, variables, over = G.insert_gaussians(params, variables, fields, mask, 0.0)
    assert int(variables["n_active"]) == 6 and int(over) == 0
    np.testing.assert_allclose(
        np.asarray(params["means3D"][:6]),
        np.asarray(fields["means3D"][np.asarray(mask)]),
    )
    # Second insert overflows capacity 10.
    params, variables, over = G.insert_gaussians(params, variables, fields, mask, 1.0)
    assert int(variables["n_active"]) == 10
    assert int(over) == 2
    assert np.asarray(variables["active"])[:10].all()


def _synthetic_map(key, n=600, num_semantic=0):
    """A gaussian cloud forming a rough wall + floor in front of the camera."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    wall = jnp.stack(
        [
            jax.random.uniform(k1, (n // 2,), minval=-1.5, maxval=1.5),
            jax.random.uniform(k2, (n // 2,), minval=-1.0, maxval=1.0),
            2.5 + 0.05 * jax.random.normal(k3, (n // 2,)),
        ],
        -1,
    )
    floor = jnp.stack(
        [
            jax.random.uniform(k2, (n - n // 2,), minval=-1.5, maxval=1.5),
            1.0 + 0.02 * jax.random.normal(k1, (n - n // 2,)),
            jax.random.uniform(k3, (n - n // 2,), minval=0.8, maxval=2.5),
        ],
        -1,
    )
    means = jnp.concatenate([wall, floor])
    colors = jax.random.uniform(k4, (n, 3))
    params = {
        "means3D": means,
        "rgb_colors": colors,
        "unnorm_rotations": jnp.zeros((n, 4)).at[:, 0].set(1.0),
        "logit_opacities": jnp.full((n, 1), 4.0),  # near-opaque
        "log_scales": jnp.full((n, 1), jnp.log(0.06)),
        "cam_unnorm_rots": jnp.zeros((1, 4, 4)).at[:, 0, :].set(1.0),
        "cam_trans": jnp.zeros((1, 3, 4)),
    }
    if num_semantic:
        params["semantic"] = jax.random.uniform(k4, (n, num_semantic))
    return params


def _camera(W=64, H=48, f=40.0):
    return setup_camera(W, H, intrinsics_matrix(f, f, W / 2, H / 2), np.eye(4))


@pytest.mark.slow
def test_tracking_recovers_pose():
    camera = _camera()
    gt = _synthetic_map(jax.random.PRNGKey(0))
    active = jnp.ones((600,), bool)

    # GT frame rendered at a slightly rotated/translated pose.
    q_gt = transforms.normalize(jnp.array([1.0, 0.01, -0.02, 0.005]))
    t_gt = jnp.array([0.03, -0.02, 0.01])
    out = render_gaussians(
        gt, active, q_gt, t_gt, camera, RC,
        with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    im_gt, depth_gt = out.im, out.depth

    cfg = LossConfig(use_sil_for_loss=True, sil_thres=0.99, w_im=0.5, w_depth=1.0)
    tracker = make_tracker(camera, cfg, RC, lr_quat=4e-4, lr_trans=2e-3, num_iters=200)
    maxrad = jnp.zeros((600,))
    # track frame 1 starting from the identity pose stored in the trajectory
    out_params, bloss, maxrad, (losses, _, _), _carry = tracker(
        gt, active, maxrad, im_gt, depth_gt, 1
    )
    bt = out_params["cam_trans"][0, :, 1]
    err0 = float(jnp.linalg.norm(t_gt))
    err1 = float(jnp.linalg.norm(bt - t_gt))
    assert err1 < 0.1 * err0, (err0, err1)
    assert float(losses[-1]) < float(losses[0]) * 0.1
    assert float(jnp.max(maxrad)) > 0


@pytest.mark.slow
def test_depth_loss_thres_continues_same_optimizer():
    """The escape hatch doubles the SAME Adam run (scripts/hierslam.py:
    1877-1888): track(N) + continue_round(N) must equal one track(2N) —
    moments, step count and best-candidate bookkeeping all carry over."""
    camera = _camera()
    gt = _synthetic_map(jax.random.PRNGKey(0))
    active = jnp.ones((600,), bool)
    q_gt = transforms.normalize(jnp.array([1.0, 0.01, -0.02, 0.005]))
    t_gt = jnp.array([0.03, -0.02, 0.01])
    out = render_gaussians(
        gt, active, q_gt, t_gt, camera, RC,
        with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    im_gt, depth_gt = out.im, out.depth
    cfg = LossConfig(use_sil_for_loss=True, sil_thres=0.99, w_im=0.5, w_depth=1.0)
    maxrad = jnp.zeros((600,))
    # use_cache=False so both trajectories evaluate the identical loss fn
    # (the cached fast path would rebind at the midpoint pose).
    t_n = make_tracker(camera, cfg, RC, 4e-4, 2e-3, num_iters=20, use_cache=False)
    t_2n = make_tracker(camera, cfg, RC, 4e-4, 2e-3, num_iters=40, use_cache=False)
    p1, _, mr1, tr1, carry = t_n(gt, active, maxrad, im_gt, depth_gt, 1)
    p1, bl1, mr1, tr1b, _ = t_n.continue_round(p1, active, im_gt, depth_gt, 1, carry)
    p2, bl2, mr2, tr2, _ = t_2n(gt, active, maxrad, im_gt, depth_gt, 1)
    np.testing.assert_allclose(
        np.asarray(p1["cam_trans"][0, :, 1]),
        np.asarray(p2["cam_trans"][0, :, 1]), atol=1e-6,
    )
    np.testing.assert_allclose(float(bl1), float(bl2), atol=1e-6)
    # the continuation's loss trace must equal the 2N run's second half
    np.testing.assert_allclose(
        np.asarray(tr1b[0]), np.asarray(tr2[0][20:]), atol=1e-5,
    )


def test_raster_config_invariants():
    import pytest

    with pytest.raises(ValueError):
        RasterConfig(backend="cuda")
    from hierslam_tpu.config import raster_config

    rc = raster_config({"raster": {"max_tiles_per_gaussian": 32, "max_per_tile": 64}})
    assert rc.max_tiles_per_gaussian == 32
    assert rc.max_per_tile == 64 and rc.backend == "pallas"


@pytest.mark.slow
def test_gather_rows_backward_exact():
    """The segmented-scan backward must equal autodiff through a plain
    gather — for every run length up to the cap (including > 16 refs)."""
    from hierslam_tpu.ops.gather_vjp import build_inverse_map, gather_rows

    rng = np.random.default_rng(3)
    n, t, k, c = 40, 12, 8, 5
    max_run = 32
    # heavy reuse: some gaussians appear dozens of times, some never
    idx = rng.integers(-1, 12, size=(t, k)).astype(np.int32)  # ids 0..11 + pads
    arr = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(t, k, c)).astype(np.float32))
    # zero cotangents at padded slots, as the blend kernel guarantees
    cot = cot * (jnp.asarray(idx) >= 0)[:, :, None]

    inv = build_inverse_map(jnp.asarray(idx), n, max_run)

    def f(a):
        out = gather_rows(a, jnp.asarray(idx), inv.spos, inv.ends,
                          inv.run_masks, max_run)
        return jnp.sum(out * cot)

    def f_ref(a):
        return jnp.sum(a[jnp.maximum(jnp.asarray(idx), 0)] * cot)

    g1 = jax.grad(f)(arr)
    g2 = jax.grad(f_ref)(arr)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_densify_fills_unseen_regions():
    camera = _camera()
    n_cap = 4096
    params = G.empty_params(n_cap, 4)
    variables = G.empty_variables(n_cap)

    im_gt = jnp.ones((3, 48, 64)) * 0.5
    depth_gt = jnp.full((48, 64), 2.0)
    dens = make_densifier(camera, RC, sil_thres=0.5, num_semantic=0)
    params, variables, n_added, n_over, n_bin_drop = dens(
        params, variables, im_gt, depth_gt, jnp.asarray(0), jax.random.PRNGKey(0)
    )
    assert int(n_bin_drop) >= 0
    assert int(n_added) == 48 * 64
    assert int(n_over) == 0
    assert int(variables["n_active"]) == 48 * 64
    # Back-projected depth must reconstruct the GT depth at identity pose.
    z = np.asarray(params["means3D"][: 48 * 64, 2])
    np.testing.assert_allclose(z, 2.0, atol=1e-5)


@pytest.mark.slow
def test_mapping_improves_render_and_prunes():
    camera = _camera()
    key = jax.random.PRNGKey(1)
    gt = _synthetic_map(key)
    active_gt = jnp.ones((600,), bool)
    out = render_gaussians(
        gt, active_gt, jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), camera, RC,
        with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    im_gt, depth_gt = out.im, out.depth

    # Start from a perturbed copy of the map inside a capacity buffer.
    n_cap = 1024
    params = G.empty_params(n_cap, 4)
    variables = G.empty_variables(n_cap)
    fields = {k: gt[k] for k in ("means3D", "rgb_colors", "unnorm_rotations", "logit_opacities", "log_scales")}
    fields = dict(fields)
    fields["rgb_colors"] = jnp.clip(
        fields["rgb_colors"] + 0.3 * jax.random.normal(key, fields["rgb_colors"].shape), 0, 1
    )
    # a handful of transparent gaussians that pruning should remove
    fields["logit_opacities"] = fields["logit_opacities"].at[:50].set(-8.0)
    params, variables, _ = G.insert_gaussians(
        params, variables, fields, jnp.ones((600,), bool), 0.0
    )
    variables["scene_radius"] = jnp.asarray(3.0)

    cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0)
    lrs = {
        "means3D": 1e-4, "rgb_colors": 2.5e-3, "unnorm_rotations": 1e-3,
        "logit_opacities": 0.05, "log_scales": 1e-3,
    }
    mapper = make_mapper(camera, cfg, RC, lrs, num_iters=30, prune_cfg=PruneConfig())
    window = {
        "im": im_gt[None],
        "depth": depth_gt[None],
        "time_idx": jnp.zeros((1,), jnp.int32),
    }
    rand_idx = jnp.zeros((30,), jnp.int32)
    n_active_before = int(jnp.sum(variables["active"]))
    params2, variables2, _, _, losses = mapper(params, variables, window, rand_idx, None, None)
    losses = losses["loss"]
    assert float(losses[-1]) < float(losses[0])
    n_active_after = int(jnp.sum(variables2["active"]))
    assert n_active_after < n_active_before  # low-opacity slots pruned


@pytest.mark.slow
def test_mapping_converges_with_bf16_grads_and_budget():
    """grad_bf16 + a tight grad_pair_budget must still reduce the mapping
    loss (bf16 only quantizes the cotangent permutation; accumulation is
    f32, and budget drops only tail references)."""
    from dataclasses import replace

    camera = _camera()
    key = jax.random.PRNGKey(3)
    gt = _synthetic_map(key)
    out = render_gaussians(
        gt, jnp.ones((600,), bool), jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
        camera, RC, with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    n_cap = 1024
    params = G.empty_params(n_cap, 4)
    variables = G.empty_variables(n_cap)
    fields = {k: gt[k] for k in (
        "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities", "log_scales")}
    fields = dict(fields)
    fields["rgb_colors"] = jnp.clip(
        fields["rgb_colors"] + 0.3 * jax.random.normal(key, fields["rgb_colors"].shape), 0, 1
    )
    params, variables, _ = G.insert_gaussians(
        params, variables, fields, jnp.ones((600,), bool), 0.0
    )
    variables["scene_radius"] = jnp.asarray(3.0)

    rc = replace(RC, grad_bf16=True, grad_pair_budget=2000)
    cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0)
    lrs = {
        "means3D": 1e-4, "rgb_colors": 2.5e-3, "unnorm_rotations": 1e-3,
        "logit_opacities": 0.05, "log_scales": 1e-3,
    }
    mapper = make_mapper(camera, cfg, rc, lrs, num_iters=20, prune_cfg=PruneConfig())
    window = {"im": out.im[None], "depth": out.depth[None],
              "time_idx": jnp.zeros((1,), jnp.int32)}
    _, _, _, _, losses = mapper(
        params, variables, window, jnp.zeros((20,), jnp.int32), None, None)
    losses = losses["loss"]
    assert float(losses[-1]) < float(losses[0])
    assert np.isfinite(float(losses[-1]))


def test_compact_slots_reclaims_holes():
    """Stable compaction: live rows move to the front in order, n_active
    shrinks to the live count, and freed slots accept new insertions."""
    cap = 16
    params = G.empty_params(cap, 2)
    variables = G.empty_variables(cap)
    fields = {
        "means3D": jnp.arange(36, dtype=jnp.float32).reshape(12, 3),
        "rgb_colors": jnp.ones((12, 3)),
        "unnorm_rotations": jnp.zeros((12, 4)).at[:, 0].set(1.0),
        "logit_opacities": jnp.arange(12, dtype=jnp.float32)[:, None],
        "log_scales": jnp.zeros((12, 1)),
    }
    params, variables, _ = G.insert_gaussians(
        params, variables, fields, jnp.ones(12, bool), 0.0)
    # prune rows 1, 4, 5 (holes inside the prefix)
    variables["active"] = variables["active"].at[jnp.array([1, 4, 5])].set(False)
    assert int(variables["n_active"]) == 12

    params2, variables2 = G.compact_slots(params, variables)
    assert int(variables2["n_active"]) == 9
    assert bool(variables2["active"][:9].all())
    assert not bool(variables2["active"][9:].any())
    live = [0, 2, 3, 6, 7, 8, 9, 10, 11]
    np.testing.assert_allclose(
        np.asarray(params2["logit_opacities"][:9, 0]), live)
    np.testing.assert_allclose(
        np.asarray(params2["means3D"][:9]),
        np.asarray(fields["means3D"])[live])

    # freed slots are appendable again
    params3, variables3, over = G.insert_gaussians(
        params2, variables2, fields, jnp.ones(12, bool)[:12].at[5:].set(False), 1.0)
    assert int(over) == 0
    assert int(variables3["n_active"]) == 14


def test_emergency_prune_frees_least_opaque():
    cap = 32
    params = G.empty_params(cap, 2)
    variables = G.empty_variables(cap)
    fields = {
        "means3D": jnp.zeros((20, 3)),
        "rgb_colors": jnp.ones((20, 3)),
        "unnorm_rotations": jnp.zeros((20, 4)).at[:, 0].set(1.0),
        "logit_opacities": jnp.arange(20, dtype=jnp.float32)[:, None],
        "log_scales": jnp.zeros((20, 1)),
    }
    params, variables, _ = G.insert_gaussians(
        params, variables, fields, jnp.ones(20, bool), 0.0)
    v2, n_freed = G.emergency_prune(params, variables, 3)
    assert int(n_freed) == 3
    act = np.asarray(v2["active"][:20])
    assert not act[:3].any() and act[3:].all()  # lowest logits dropped
    # the 20% cap binds when asking for more
    v3, n_freed3 = G.emergency_prune(params, variables, 100)
    assert int(n_freed3) == 4  # floor(0.2 * 20)


@pytest.mark.slow
def test_mapping_visible_compaction_matches_full():
    """visible_budget covering every gaussian must reproduce the full-N
    mapping EXACTLY (same per-iteration losses, same final params): the
    compact render is the same math over the visible-rank permutation,
    with gradients routed back through the inverse permutation."""
    from dataclasses import replace as dc_replace

    camera = _camera()
    key = jax.random.PRNGKey(1)
    gt = _synthetic_map(key)
    out = render_gaussians(
        gt, jnp.ones((600,), bool), jnp.array([1.0, 0, 0, 0]), jnp.zeros(3),
        camera, RC, with_semantic=False, gaussians_grad=False,
        camera_grad=False,
    )
    n_cap = 1024
    params = G.empty_params(n_cap, 4)
    variables = G.empty_variables(n_cap)
    fields = {k: gt[k] for k in (
        "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
        "log_scales")}
    fields["rgb_colors"] = jnp.clip(
        fields["rgb_colors"]
        + 0.3 * jax.random.normal(key, fields["rgb_colors"].shape), 0, 1
    )
    params, variables, _ = G.insert_gaussians(
        params, variables, fields, jnp.ones((600,), bool), 0.0
    )
    variables["scene_radius"] = jnp.asarray(3.0)
    cfg = LossConfig(use_sil_for_loss=False, sil_thres=0.5, w_im=0.5, w_depth=1.0)
    lrs = {
        "means3D": 1e-4, "rgb_colors": 2.5e-3, "unnorm_rotations": 1e-3,
        "logit_opacities": 0.05, "log_scales": 1e-3,
    }
    window = {
        "im": out.im[None], "depth": out.depth[None],
        "time_idx": jnp.zeros((1,), jnp.int32),
    }
    rand_idx = jnp.zeros((12,), jnp.int32)
    prune = PruneConfig(start_after=10**9)

    def run(rc):
        mapper = make_mapper(camera, cfg, rc, lrs, num_iters=12, prune_cfg=prune)
        p2, _, _, _, losses = mapper(
            params, variables, window, rand_idx, None, None
        )
        return p2, losses["loss"]

    p_full, l_full = run(RC)
    p_comp, l_comp = run(dc_replace(RC, visible_budget=n_cap))
    np.testing.assert_allclose(
        np.asarray(l_comp), np.asarray(l_full), rtol=2e-5
    )
    # fp summation-order noise only: gradients travel a permuted route
    np.testing.assert_allclose(
        np.asarray(p_comp["means3D"]), np.asarray(p_full["means3D"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(p_comp["rgb_colors"]), np.asarray(p_full["rgb_colors"]),
        atol=1e-5,
    )

    # an undersized budget still converges; the overflow is counted
    p_small, l_small = run(dc_replace(RC, visible_budget=256))
    assert float(l_small[-1]) < float(l_small[0])


@pytest.mark.slow
def test_tracking_bucketed_cache_matches_single_class():
    """The pose-cache fast path with a capacity-class ladder must
    reproduce the single-class tracker: same per-iteration losses (to fp
    noise) and the same recovered pose, because every tile renders the
    same depth-ordered list — only partitioned across class strips."""
    from dataclasses import replace as dc_replace

    camera = _camera()
    gt = _synthetic_map(jax.random.PRNGKey(0))
    active = jnp.ones((600,), bool)
    q_gt = transforms.normalize(jnp.array([1.0, 0.01, -0.02, 0.005]))
    t_gt = jnp.array([0.03, -0.02, 0.01])
    out = render_gaussians(
        gt, active, q_gt, t_gt, camera, RC,
        with_semantic=False, gaussians_grad=False, camera_grad=False,
    )
    cfg = LossConfig(use_sil_for_loss=True, sil_thres=0.99, w_im=0.5, w_depth=1.0)

    def run(rc):
        tracker = make_tracker(camera, cfg, rc, lr_quat=4e-4, lr_trans=2e-3,
                               num_iters=40)
        p2, _, _, (losses, _, _), _ = tracker(
            gt, active, jnp.zeros((600,)), out.im, out.depth, 1
        )
        return p2["cam_trans"][0, :, 1], losses

    # both configs cover every tile's (margin-inflated) count, so neither
    # truncates and the partitioned render must equal the single-class one
    rc_single = dc_replace(RC, max_per_tile=1024)
    rc_ladder = dc_replace(
        RC, track_bucket_spec=((4, 1024), (6, 512), (-1, 256))
    )
    t_single, l_single = run(rc_single)
    t_ladder, l_ladder = run(rc_ladder)
    # fp reduce-order noise across partitions, compounded by 40 coupled
    # Adam steps: per-iteration losses agree to ~3e-4 relative
    np.testing.assert_allclose(
        np.asarray(l_ladder), np.asarray(l_single), rtol=1e-3, atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(t_ladder), np.asarray(t_single), atol=1e-4
    )
