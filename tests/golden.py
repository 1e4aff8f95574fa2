"""Independent numpy golden model of the reference rasterizer.

A direct, loop-based port of the CUDA algorithm's *semantics* (not its code):
per-Gaussian preprocess (cuda_rasterizer/forward.cu:156-256), 16x16-tile
front-to-back blending with every cutoff/termination rule
(forward.cu:261-538).  Used only on tiny scenes to validate the XLA/Pallas
renderers to float tolerance.
"""
import numpy as np


def quat_to_rot(q):
    q = q / np.linalg.norm(q)
    r, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def golden_render(
    means3D,
    colors,
    opacities,
    scales,
    rotations,
    w2c,
    full_proj,
    fx,
    fy,
    tan_fovx,
    tan_fovy,
    W,
    H,
    semantics=None,
    tile=(16, 16),
):
    n = means3D.shape[0]
    th, tw = tile
    gx, gy = (W + tw - 1) // tw, (H + th - 1) // th

    xy = np.zeros((n, 2))
    conic = np.zeros((n, 3))
    depth = np.zeros(n)
    radius = np.zeros(n, dtype=np.int64)
    rect = np.zeros((n, 4), dtype=np.int64)  # min_x, min_y, max_x, max_y
    ok = np.zeros(n, dtype=bool)

    for i in range(n):
        p = means3D[i]
        p_view = w2c[:3, :3] @ p + w2c[:3, 3]
        if p_view[2] <= 0.2:
            continue
        p_hom = full_proj @ np.append(p, 1.0)
        p_w = 1.0 / (p_hom[3] + 1e-7)
        p_proj = p_hom[:3] * p_w

        R = quat_to_rot(rotations[i])
        S = np.diag(scales[i])
        cov3d = R @ S @ S @ R.T

        tz = p_view[2]
        tx = min(1.3 * tan_fovx, max(-1.3 * tan_fovx, p_view[0] / tz)) * tz
        ty = min(1.3 * tan_fovy, max(-1.3 * tan_fovy, p_view[1] / tz)) * tz
        J = np.array(
            [
                [fx / tz, 0, -fx * tx / tz**2],
                [0, fy / tz, -fy * ty / tz**2],
            ]
        )
        T = J @ w2c[:3, :3]
        cov2d = T @ cov3d @ T.T
        cov2d[0, 0] += 0.3
        cov2d[1, 1] += 0.3
        det = cov2d[0, 0] * cov2d[1, 1] - cov2d[0, 1] ** 2
        if det == 0:
            continue
        conic[i] = np.array([cov2d[1, 1], -cov2d[0, 1], cov2d[0, 0]]) / det
        mid = 0.5 * (cov2d[0, 0] + cov2d[1, 1])
        l1 = mid + np.sqrt(max(0.1, mid * mid - det))
        l2 = mid - np.sqrt(max(0.1, mid * mid - det))
        r = np.ceil(3.0 * np.sqrt(max(l1, l2)))
        px = ((p_proj[0] + 1) * W - 1) * 0.5
        py = ((p_proj[1] + 1) * H - 1) * 0.5
        rmin_x = min(gx, max(0, int((px - r) / tw)))
        rmin_y = min(gy, max(0, int((py - r) / th)))
        rmax_x = min(gx, max(0, int((px + r + tw - 1) / tw)))
        rmax_y = min(gy, max(0, int((py + r + th - 1) / th)))
        if (rmax_x - rmin_x) * (rmax_y - rmin_y) == 0:
            continue
        xy[i] = (px, py)
        depth[i] = tz
        radius[i] = int(r)
        rect[i] = (rmin_x, rmin_y, rmax_x, rmax_y)
        ok[i] = True

    S_dim = 0 if semantics is None else semantics.shape[1]
    out_color = np.zeros((3, H, W))
    out_depth = np.zeros((H, W))
    out_med = np.full((H, W), 15.0)
    out_T = np.ones((H, W))
    out_mask = np.zeros((H, W))
    out_sem = np.zeros((S_dim, H, W))

    order = np.argsort(depth + np.where(ok, 0, 1e12), kind="stable")

    for ty_ in range(gy):
        for tx_ in range(gx):
            glist = [
                i
                for i in order
                if ok[i]
                and rect[i][0] <= tx_ < rect[i][2]
                and rect[i][1] <= ty_ < rect[i][3]
            ]
            for yy in range(ty_ * th, min((ty_ + 1) * th, H)):
                for xx in range(tx_ * tw, min((tx_ + 1) * tw, W)):
                    T = 1.0
                    for i in glist:
                        dx = xy[i][0] - xx
                        dy = xy[i][1] - yy
                        a, b, c = conic[i]
                        power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
                        if power > 0:
                            continue
                        alpha = min(0.99, opacities[i] * np.exp(power))
                        if alpha < 1.0 / 255.0:
                            continue
                        test_T = T * (1 - alpha)
                        if test_T < 1e-4:
                            break
                        out_color[:, yy, xx] += colors[i] * alpha * T
                        out_depth[yy, xx] += depth[i] * alpha * T
                        out_mask[yy, xx] += alpha * T
                        if semantics is not None:
                            out_sem[:, yy, xx] += semantics[i] * alpha * T
                        if T > 0.5 and test_T < 0.5:
                            out_med[yy, xx] = depth[i]
                        T = test_T
                    out_T[yy, xx] = T

    return dict(
        im=out_color,
        depth=out_depth,
        median_depth=out_med,
        final_opacity=1.0 - out_T,
        mask=out_mask,
        semantic=out_sem if semantics is not None else None,
        radii=np.where(ok, radius, 0),
    )


def make_scene(n=60, seed=0, W=40, H=24, sem=0):
    """Random tiny scene in front of an identity camera."""
    rng = np.random.default_rng(seed)
    fx = fy = 30.0
    cx, cy = W / 2, H / 2
    means = np.stack(
        [
            rng.uniform(-1.0, 1.0, n),
            rng.uniform(-0.6, 0.6, n),
            rng.uniform(0.5, 4.0, n),
        ],
        -1,
    )
    colors = rng.uniform(0, 1, (n, 3))
    opac = rng.uniform(0.2, 0.95, n)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.25), (n, 1))) * np.ones((1, 3))
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    semantics = rng.normal(size=(n, sem)) if sem else None
    w2c = np.eye(4)
    proj = np.array(
        [
            [2 * fx / W, 0.0, -(W - 2 * cx) / W, 0.0],
            [0.0, 2 * fy / H, -(H - 2 * cy) / H, 0.0],
            [0.0, 0.0, 100.0 / (100.0 - 0.01), -(100.0 * 0.01) / (100.0 - 0.01)],
            [0.0, 0.0, 1.0, 0.0],
        ]
    )
    cam = dict(
        w2c=w2c, full_proj=proj @ w2c, fx=fx, fy=fy,
        tan_fovx=W / (2 * fx), tan_fovy=H / (2 * fy), W=W, H=H,
        cx=cx, cy=cy,
    )
    return dict(
        means3D=means, colors=colors, opacities=opac, scales=scales,
        rotations=q, semantics=semantics,
    ), cam
