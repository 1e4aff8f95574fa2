"""Final evaluation drivers — equivalent of eval_newrender /
eval_semantic_newrender / eval_semantic_tree_newrender
(utils/eval_helpers.py:645, :869, :1184).

Protocol parity:
* evaluate frame 0 plus every ``eval_every``-th frame (:1212-1234);
* render with the FINAL map at the per-frame estimated poses;
* PSNR / MS-SSIM (/ LPIPS when weights available) on valid-depth-masked
  RGB (:1265-1279); depth RMSE & L1 on the valid mask, reported in cm
  (:1282-1297);
* semantic mIoU / boundary-mIoU per-class accumulation (:1399-1496), with
  leaf decoding through the 1x1-conv decoder (flag_mlp, :1251-1255) or by
  per-level argmax + tuple->leaf lookup (transfer_tree_2_label, :135-185);
* trajectory ATE from the estimated trajectory vs GT w2c (:1554-1584),
  reported in cm; falls back to 100.0 on failure (:1582-1584);
* summary row: [ATE RMSE] [PSNR] [MS-SSIM] [LPIPS] [Depth L1] [Depth RMSE]
  [miou] [mbiou] (:1608-1611).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hierslam_tpu.config import raster_config
from hierslam_tpu.core import transforms
from hierslam_tpu.core.camera import setup_camera
from hierslam_tpu.eval import ate as ate_lib
from hierslam_tpu.eval import metrics as M
from hierslam_tpu.slam.losses import mlp_apply, render_gaussians


def run_nvs_eval(
    dataset,
    params_np: Dict[str, np.ndarray],
    config: Dict,
    eval_dir: str,
    sil_thres: float = 0.5,
) -> Dict[str, float]:
    """Novel-view synthesis evaluation (eval_nvs, utils/eval_helpers.py:1648):
    render held-out views at their GT poses and score only pixels the map
    actually covers (rendered presence > sil_thres AND valid GT depth — the
    hole-validity test of :1732-1738)."""
    os.makedirs(eval_dir, exist_ok=True)
    first = dataset[0]
    _, depth0, K4, _ = first[:4]
    H, W = depth0.shape
    intrinsics = np.asarray(K4)[:3, :3]
    camera = setup_camera(W, H, intrinsics, params_np["w2c"])
    rc = raster_config(config)

    gauss = {
        k: jnp.asarray(params_np[k])
        for k in (
            "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
            "log_scales",
        )
    }

    @jax.jit
    def render(q, t):
        return render_gaussians(
            gauss, None, q, t, camera, rc,
            with_semantic=False, gaussians_grad=False, camera_grad=False,
        )

    psnr_j = jax.jit(M.masked_psnr)
    ms_ssim_j = jax.jit(M.ms_ssim)
    psnrs, msssims, d_l1 = [], [], []
    for t in range(len(dataset)):
        item = dataset[t]
        color, depth_gt, _, pose = item[:4]
        gt_w2c = np.linalg.inv(np.asarray(pose))
        q = transforms.matrix_to_quaternion(jnp.asarray(gt_w2c[:3, :3], jnp.float32))
        out = render(q, jnp.asarray(gt_w2c[:3, 3], jnp.float32))
        valid = (np.asarray(depth_gt) > 0) & (np.asarray(out.final_opacity) > sil_thres)
        im_gt = jnp.asarray(color.transpose(2, 0, 1) / 255.0, jnp.float32)
        psnrs.append(float(psnr_j(out.im, im_gt, jnp.asarray(valid))))
        msssims.append(float(ms_ssim_j(jnp.clip(out.im, 0, 1), im_gt)))
        _, l1 = M.depth_metrics(np.asarray(out.depth), np.asarray(depth_gt), valid)
        d_l1.append(l1)
    results = {
        "nvs_psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "nvs_ms_ssim": float(np.mean(msssims)) if msssims else 0.0,
        "nvs_depth_l1_cm": float(np.mean(d_l1)) * 100 if d_l1 else 0.0,
    }
    print("[NVS] PSNR {nvs_psnr:.3f} MS-SSIM {nvs_ms_ssim:.4f} "
          "Depth L1 {nvs_depth_l1_cm:.3f} cm".format(**results))
    return results


def _build_renderer(camera, rc, with_semantic):
    @jax.jit
    def render(params, time_idx):
        t_idx = jnp.asarray(time_idx, jnp.int32)
        q = params["cam_unnorm_rots"][0, :, t_idx]
        tr = params["cam_trans"][0, :, t_idx]
        return render_gaussians(
            params, None, q, tr, camera, rc,
            with_semantic=with_semantic, gaussians_grad=False, camera_grad=False,
        )

    return render


def _depth_colormap(depth: np.ndarray, vmin: float = 0.0, vmax: float = 6.0) -> np.ndarray:
    """JET-colormapped depth image (eval_helpers.py:1521-1525)."""
    import cv2

    normalized = np.clip((depth - vmin) / (vmax - vmin), 0, 1)
    bgr = cv2.applyColorMap((normalized * 255).astype(np.uint8), cv2.COLORMAP_JET)
    return bgr[..., ::-1]  # store as RGB


def _save_frame_artifacts(
    eval_dir: str, t: int, out, color_hwc: np.ndarray, depth_gt: np.ndarray,
    pred_label=None, gt_label=None, colors_map=None,
):
    """Per-frame rendered/GT RGB, depth and semantic dumps
    (eval_helpers.py:1518-1537, 1330-1340)."""
    import imageio.v2 as imageio

    dirs = {n: os.path.join(eval_dir, n) for n in
            ("renders", "renders_depth", "rgb", "depth", "rendered_semantic")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    imageio.imwrite(
        os.path.join(dirs["renders"], f"gs_{t:04d}.png"),
        (np.clip(np.asarray(out.im).transpose(1, 2, 0), 0, 1) * 255).astype(np.uint8),
    )
    imageio.imwrite(
        os.path.join(dirs["renders_depth"], f"gs_{t:04d}.png"),
        _depth_colormap(np.asarray(out.depth)),
    )
    imageio.imwrite(
        os.path.join(dirs["rgb"], f"gt_{t:04d}.png"),
        np.clip(color_hwc, 0, 255).astype(np.uint8),
    )
    imageio.imwrite(
        os.path.join(dirs["depth"], f"gt_{t:04d}.png"), _depth_colormap(depth_gt)
    )
    if pred_label is not None and colors_map is not None:
        from hierslam_tpu.eval.semantic_viz import visualize_label

        imageio.imwrite(
            os.path.join(dirs["rendered_semantic"], f"sem_{t:04d}.png"),
            visualize_label(pred_label, colors_map),
        )
        if gt_label is not None:
            imageio.imwrite(
                os.path.join(dirs["rendered_semantic"], f"sem_{t:04d}_gt.png"),
                visualize_label(gt_label, colors_map),
            )


def run_final_eval(
    dataset,
    params_np: Dict[str, np.ndarray],
    config: Dict,
    eval_dir: str,
    mlp: Optional[Dict] = None,
    num_frames: Optional[int] = None,
    save_frames: bool = False,
    verbose_iou: bool = True,
) -> Dict[str, float]:
    os.makedirs(eval_dir, exist_ok=True)
    eval_every = config.get("eval_every", 5)
    num_frames = num_frames or len(dataset)
    semantic = hasattr(dataset, "num_semantic")
    tree_mode = semantic and isinstance(dataset.num_semantic, list)
    gt_transfer = bool(config.get("model", {}).get("eval_gt_transfer", False))
    # ScanNet tree_large: iterate the SPARSE semantic_id list
    # (eval_helpers.py:1406-1444) instead of a dense class range.
    sparse_ids = getattr(dataset, "semantic_id", None)
    class_names = getattr(dataset, "semantic_class", None)

    first = dataset[0]
    _, depth0, K4, _ = first[:4]
    H, W = depth0.shape
    intrinsics = np.asarray(K4)[:3, :3]
    camera = setup_camera(W, H, intrinsics, params_np["w2c"])
    rc = raster_config(config)

    gauss = {
        k: jnp.asarray(params_np[k])
        for k in (
            "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
            "log_scales", "semantic",
        )
        if k in params_np and params_np[k].ndim >= 2
    }
    gauss["cam_unnorm_rots"] = jnp.asarray(params_np["cam_unnorm_rots"])
    gauss["cam_trans"] = jnp.asarray(params_np["cam_trans"])
    render = _build_renderer(camera, rc, with_semantic=semantic and "semantic" in gauss)
    mlp_j = {k: jnp.asarray(v) for k, v in mlp.items()} if mlp else None

    psnrs, msssims, lpips_vals, d_rmse, d_l1 = [], [], [], [], []
    iou_acc = M.IoUAccumulator()
    lpips = M.lpips_fn(config.get("lpips_weights"))

    # reference metric formulas: PSNR + MS-SSIM on valid-mask-WEIGHTED
    # images (eval_helpers.py:1263-1274), depth stats as masked mean |diff|
    ms_ssim_j = jax.jit(
        lambda a, b, m: M.ms_ssim(a * m[None], b * m[None])
    )
    psnr_j = jax.jit(M.reference_psnr)
    iou_txt = os.path.join(eval_dir, "sem_iou_2flat.txt")

    for t in range(num_frames):
        if t != 0 and (t + 1) % eval_every != 0:
            continue
        item = dataset[t]
        color, depth_gt, _, _ = item[:4]
        label_gt = item[4] if semantic else None
        im_gt = jnp.asarray(color.transpose(2, 0, 1) / 255.0, jnp.float32)
        out = render(gauss, t)

        valid = np.asarray(depth_gt) > 0
        valid_j = jnp.asarray(valid)
        psnrs.append(float(psnr_j(out.im, im_gt, valid_j)))
        msssims.append(float(ms_ssim_j(jnp.clip(out.im, 0, 1), im_gt, valid_j)))
        if lpips is not None:
            lpips_vals.append(
                lpips(
                    np.clip(np.asarray(out.im) * valid[None], 0, 1),
                    np.asarray(im_gt) * valid[None],
                )
            )
        rmse, l1 = M.reference_depth_metrics(
            np.asarray(out.depth), np.asarray(depth_gt), valid
        )
        d_rmse.append(rmse)
        d_l1.append(l1)

        if semantic and out.semantic is not None:
            sem_img = np.asarray(out.semantic)
            if tree_mode:
                if mlp_j is not None:
                    leaf_logits = np.asarray(mlp_apply(mlp_j, out.semantic))
                    pred = np.argmax(leaf_logits, axis=0)
                else:
                    levels = M.decode_tree_labels(sem_img, dataset.num_semantic)
                    pred = M.tree_tuple_to_leaf(levels, dataset.label_mapping_tree) \
                        if getattr(dataset, "label_mapping_tree", None) else levels[-1]
                gt_leaf = np.asarray(label_gt[-1])
            else:
                pred = np.argmax(sem_img, axis=0)
                gt_leaf = np.asarray(label_gt[0])
            n_cls = dataset.num_semantic_class if hasattr(dataset, "num_semantic_class") else (
                dataset.num_semantic if not tree_mode else dataset.num_semantic[-1]
            )
            if sparse_ids is not None:
                # dense leaf index -> sparse raw id space for both pred & GT
                sid = np.asarray(sparse_ids)
                pred = sid[np.clip(pred, 0, len(sid) - 1)]
                gt_leaf = sid[np.clip(gt_leaf, 0, len(sid) - 1)]
                class_ids = list(sparse_ids)
            else:
                class_ids = list(range(int(n_cls)))
            if gt_transfer:
                # SGS-SLAM protocol (eval_helpers.py:1355-1396)
                from hierslam_tpu.eval.semantic_viz import gt_transfer_labels

                cmap = np.asarray(dataset.colors_map_all)
                if sparse_ids is not None:
                    # palette is indexed densely; transfer in dense space
                    pred = gt_transfer_labels(
                        np.searchsorted(np.asarray(sparse_ids), pred),
                        np.searchsorted(np.asarray(sparse_ids), gt_leaf), cmap,
                    )
                    pred = np.asarray(sparse_ids)[np.clip(pred, 0, len(sparse_ids) - 1)]
                else:
                    pred = gt_transfer_labels(pred, gt_leaf, cmap)
            if verbose_iou:
                print(f"current frame is: {t}")
            f_miou, f_mbiou, f_iou, f_biou = iou_acc.add_frame(
                pred, gt_leaf, class_ids, class_names, verbose=verbose_iou,
            )
            if verbose_iou:
                print(f"mean_iou: {f_miou:.4f}, mean_biou: {f_mbiou:.4f}")
            # per-frame IoU log (sem_iou_2flat.txt, eval_helpers.py:1502-1509)
            with open(iou_txt, "a") as f:
                f.write(f"frame: {t}\n")
                f.write(f"mean_iou: {f_miou:.4f}, mean_biou: {f_mbiou:.4f}\n")
                f.write(f"mean_iou_per_class: {f_iou}\n")
                f.write(f"mean_biou_per_class: {f_biou}\n\n")

        if save_frames:
            _save_frame_artifacts(
                eval_dir, t, out, np.asarray(color), np.asarray(depth_gt),
                pred_label=(pred if semantic and out.semantic is not None else None),
                gt_label=(gt_leaf if semantic and out.semantic is not None else None),
                colors_map=(np.asarray(dataset.colors_map_all)
                            if semantic and hasattr(dataset, "colors_map_all") else None),
            )

    # --- qualitative semantic surface --------------------------------------
    if semantic and tree_mode and save_frames:
        from hierslam_tpu.eval.semantic_viz import plot_semantic_legend, show_semantic

        try:
            if hasattr(dataset, "colors_map_all"):
                n_leaf = int(dataset.num_semantic[-1])
                names = class_names or [str(i) for i in range(n_leaf)]
                plot_semantic_legend(
                    range(min(n_leaf, len(names))), names,
                    np.asarray(dataset.colors_map_all), eval_dir,
                    "semantic_class_Legend_leaf",
                )

            def render_sem(t):
                return np.asarray(render(gauss, t).semantic)

            show_semantic(
                render_sem, dataset, num_frames, eval_dir, mlp=mlp_j,
                frames=config.get("show_semantic_frames"),
            )
        except Exception as e:
            print(f"show_semantic failed: {e}")

    # --- trajectory ATE ----------------------------------------------------
    try:
        gt_all = params_np["gt_w2c_all_frames"]
        valid_t = [
            i for i in range(gt_all.shape[0]) if np.isfinite(gt_all[i]).all()
        ]
        est_traj = ate_lib.trajectory_from_params(
            params_np["cam_unnorm_rots"], params_np["cam_trans"]
        )
        ate_m = ate_lib.evaluate_ate(
            [gt_all[i] for i in valid_t], [est_traj[i] for i in valid_t]
        )
        ate_cm = ate_m * 100
    except Exception as e:  # matches the reference's failure fallback
        print(f"ATE evaluation failed: {e}")
        ate_cm = 100.0

    miou, mbiou, miou_c, mbiou_c = iou_acc.summary()
    results = {
        "ate_rmse_cm": ate_cm,
        "psnr": float(np.mean(psnrs)) if psnrs else 0.0,
        "ms_ssim": float(np.mean(msssims)) if msssims else 0.0,
        "lpips": float(np.mean(lpips_vals)) if lpips_vals else float("nan"),
        "depth_l1_cm": float(np.mean(d_l1)) * 100 if d_l1 else 0.0,
        "depth_rmse_cm": float(np.mean(d_rmse)) * 100 if d_rmse else 0.0,
        "miou_pct": miou * 100,
        "mbiou_pct": mbiou * 100,
    }

    for name, arr in (
        ("psnr", psnrs), ("ms_ssim", msssims), ("depth_l1", d_l1), ("depth_rmse", d_rmse),
    ):
        np.savetxt(os.path.join(eval_dir, f"{name}.txt"), np.asarray(arr))

    print(
        "[ATE RMSE cm] [PSNR] [MS-SSIM] [LPIPS] [Depth L1 cm] [Depth RMSE cm] [mIoU%] [mbIoU%]"
    )
    print(
        "{ate_rmse_cm:.4f} {psnr:.3f} {ms_ssim:.4f} {lpips:.4f} "
        "{depth_l1_cm:.4f} {depth_rmse_cm:.4f} {miou_pct:.2f} {mbiou_pct:.2f}".format(**results)
    )
    return results
