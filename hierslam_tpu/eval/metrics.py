"""Image / depth / semantic metrics (utils/eval_helpers.py).

* masked PSNR (:1271-1279), depth RMSE & L1 (:1282-1297);
* MS-SSIM (5-scale, standard weights — replacing the pytorch_msssim dep);
* per-class IoU + boundary IoU with per-frame accumulation
  (:37-98, :1399-1496);
* LPIPS is gated: it needs pretrained AlexNet weights which this
  environment cannot download — ``lpips()`` returns None unless a local
  torchmetrics/lpips install with cached weights is present.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hierslam_tpu.ops.ssim import calc_ssim, _filter, _window

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def masked_psnr(img: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """PSNR over mask-selected pixels of [C,H,W] images in [0,1]."""
    m = mask.astype(img.dtype)
    cnt = jnp.maximum(jnp.sum(m) * img.shape[0], 1.0)
    mse = jnp.sum(((img - gt) * m[None]) ** 2) / cnt
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def reference_psnr(img: jax.Array, gt: jax.Array, mask: jax.Array) -> jax.Array:
    """The reference's eval PSNR: calc_psnr on mask-WEIGHTED images
    (utils/slam_external.py:49-51 called at eval_helpers.py:1263-1271) —
    per-channel MSE over ALL pixels of the masked products (zeros outside
    the mask count toward the denominator), PSNR averaged over channels."""
    m = mask.astype(img.dtype)[None]
    mse = jnp.mean((img * m - gt * m) ** 2, axis=(1, 2))
    return jnp.mean(20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12))))


def reference_depth_metrics(depth: np.ndarray, gt: np.ndarray, mask: np.ndarray):
    """(rmse, l1) with the reference's exact formulas
    (eval_helpers.py:1282-1297): the rendered depth is pre-multiplied by the
    valid mask, the difference re-masked, and BOTH stats are masked means of
    the elementwise ``sqrt(diff^2)`` — i.e. the printed 'RMSE' is the same
    masked mean-absolute-difference as L1 (sqrt of square is abs)."""
    diff = np.abs(depth * mask - gt) * mask
    denom = max(mask.sum(), 1)
    v = float(diff.sum() / denom)
    return v, v


def _avgpool2(img: jax.Array) -> jax.Array:
    c, h, w = img.shape
    h2, w2 = h // 2, w // 2
    return img[:, : h2 * 2, : w2 * 2].reshape(c, h2, 2, w2, 2).mean((2, 4))


def ms_ssim(img1: jax.Array, img2: jax.Array, levels: int = 5) -> jax.Array:
    """Multi-scale SSIM of [C,H,W] images (standard Wang et al. weights)."""
    win = jnp.asarray(_window(11, 1.5))
    weights = MSSSIM_WEIGHTS[:levels]
    mcs = []
    val = None
    for i in range(levels):
        mu1, mu2 = _filter(img1, win), _filter(img2, win)
        s1 = _filter(img1 * img1, win) - mu1 * mu1
        s2 = _filter(img2 * img2, win) - mu2 * mu2
        s12 = _filter(img1 * img2, win) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        cs = jnp.mean((2 * s12 + c2) / (s1 + s2 + c2))
        ssim = jnp.mean(
            ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        )
        if i == levels - 1:
            val = ssim
        else:
            mcs.append(jnp.maximum(cs, 0.0))
            img1, img2 = _avgpool2(img1), _avgpool2(img2)
    out = jnp.maximum(val, 0.0) ** weights[-1]
    for w, cs in zip(weights[:-1], mcs):
        out = out * cs**w
    return out


def depth_metrics(depth: np.ndarray, gt: np.ndarray, mask: np.ndarray):
    """(rmse, l1) over valid mask, in the input units."""
    d = (depth - gt)[mask]
    if d.size == 0:
        return 0.0, 0.0
    return float(np.sqrt(np.mean(d**2))), float(np.mean(np.abs(d)))


def mask_to_boundary(mask: np.ndarray, dilation_ratio: float = 0.02) -> np.ndarray:
    """Binary mask -> boundary band via erosion (eval_helpers.py:37-57)."""
    import cv2

    h, w = mask.shape
    dilation = max(1, int(round(dilation_ratio * np.sqrt(h**2 + w**2))))
    padded = cv2.copyMakeBorder(mask, 1, 1, 1, 1, cv2.BORDER_CONSTANT, value=0)
    eroded = cv2.erode(padded, np.ones((3, 3), np.uint8), iterations=dilation)
    return mask - eroded[1 : h + 1, 1 : w + 1]


def boundary_iou(gt: np.ndarray, dt: np.ndarray, dilation_ratio: float = 0.02) -> float:
    gt = (gt > 0).astype(np.uint8)
    dt = (dt > 0).astype(np.uint8)
    gb = mask_to_boundary(gt, dilation_ratio)
    db = mask_to_boundary(dt, dilation_ratio)
    union = ((gb + db) > 0).sum()
    if union == 0:
        return 0.0
    return float(((gb * db) > 0).sum() / union)


def calculate_iou(mask1: np.ndarray, mask2: np.ndarray) -> float:
    a, b = mask1 > 0, mask2 > 0
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 0.0
    return float(np.logical_and(a, b).sum() / union)


class IoUAccumulator:
    """Per-class IoU/boundary-IoU accumulation across frames, skipping
    classes absent in both prediction and GT (eval_helpers.py:1447-1496).

    ``class_ids`` may be dense (``range(num_classes)``) or the sparse raw
    ``dataset.semantic_id`` list of the ScanNet tree_large protocol
    (eval_helpers.py:1406-1444)."""

    def __init__(self):
        self.iou: Dict[int, List[float]] = {}
        self.biou: Dict[int, List[float]] = {}

    def add_frame(
        self,
        pred_label: np.ndarray,
        gt_label: np.ndarray,
        class_ids,
        class_names=None,
        verbose: bool = False,
    ):
        """Accumulate one frame; returns the per-frame summary
        (frame_miou, frame_mbiou, per_class_iou, per_class_biou) — the
        reference's per-frame overall_mean_iou (eval_helpers.py:1488-1496).

        ``verbose`` reproduces the per-class stdout lines
        (eval_helpers.py:1427-1443), with pixel counts for iou==0 classes.
        """
        f_iou: Dict[int, float] = {}
        f_biou: Dict[int, float] = {}
        counts: Dict[int, int] = {}
        for idx, c in enumerate(class_ids):
            pm = pred_label == c
            gm = gt_label == c
            if not pm.any() and not gm.any():
                continue
            iou = calculate_iou(gm, pm)
            biou = boundary_iou(gm.astype(np.uint8), pm.astype(np.uint8))
            self.iou.setdefault(c, []).append(iou)
            self.biou.setdefault(c, []).append(biou)
            f_iou[c] = iou
            f_biou[c] = biou
            counts[c] = len(self.iou[c])
            if verbose:
                name = class_names[idx] if class_names is not None else c
                if iou == 0:
                    print(
                        f" semantic label {c} ({name}): iou: {iou:.3f}, "
                        f"biou: {biou:.3f}, class_counts: {counts[c]}, "
                        f"pixel num gt vs est: {gm.sum()} vs {pm.sum()}"
                    )
                else:
                    print(
                        f" semantic label {c} ({name}): iou: {iou:.3f}, "
                        f"biou: {biou:.3f}, class_counts: {counts[c]}"
                    )
        f_miou = float(np.mean(list(f_iou.values()))) if f_iou else 0.0
        f_mbiou = float(np.mean(list(f_biou.values()))) if f_biou else 0.0
        return f_miou, f_mbiou, f_iou, f_biou

    def summary(self):
        miou_c = {c: float(np.mean(v)) for c, v in self.iou.items()}
        mbiou_c = {c: float(np.mean(v)) for c, v in self.biou.items()}
        miou = float(np.mean(list(miou_c.values()))) if miou_c else 0.0
        mbiou = float(np.mean(list(mbiou_c.values()))) if mbiou_c else 0.0
        return miou, mbiou, miou_c, mbiou_c


def eval_semantic_single(
    pred_label: np.ndarray,
    gt_label: np.ndarray,
    class_ids,
    class_names=None,
    verbose: bool = True,
):
    """Single-frame per-class IoU/bIoU report (eval_semantic_single,
    utils/eval_helpers.py:1865-1931): per-class scores over the classes
    present in either image, with the reference's stdout lines."""
    acc = IoUAccumulator()
    miou, mbiou, per_iou, per_biou = acc.add_frame(
        pred_label, gt_label, class_ids, class_names, verbose
    )
    if verbose:
        num_wrong = sum(
            (pred_label == c).sum() for c, v in per_iou.items() if v == 0
        )
        print(f"mean_iou: {miou:.4f}, mean_biou: {mbiou:.4f}")
        print("num 0 worng is: ", num_wrong)  # sic — reference string
    return miou, mbiou, per_iou, per_biou


def lpips_fn(weights_path: Optional[str] = None):
    """Optional LPIPS (AlexNet): pure-JAX forward from a local weights npz
    (see hierslam_tpu.eval.lpips), falling back to torchmetrics, else None."""
    from hierslam_tpu.eval.lpips import lpips_fn as _lpips

    return _lpips(weights_path)


def decode_tree_labels(sem_img: np.ndarray, num_semantic: List[int]) -> np.ndarray:
    """Per-level argmax over the concatenated tree embedding
    (transfer_tree_label, eval_helpers.py:187-209): [S,H,W] -> [L,H,W]."""
    out = []
    off = 0
    for n_cls in num_semantic[:-1]:
        out.append(np.argmax(sem_img[off : off + n_cls], axis=0))
        off += n_cls
    return np.stack(out)


def tree_tuple_to_leaf(level_labels: np.ndarray, mapping: Dict[str, tuple]) -> np.ndarray:
    """Per-pixel level-id tuple -> leaf base id (transfer_tree_2_label,
    eval_helpers.py:135-185); unmatched tuples map to -1."""
    lut: Dict[tuple, int] = {tuple(v): int(k) for k, v in mapping.items()}
    L, H, W = level_labels.shape
    flat = level_labels.reshape(L, -1).T
    out = np.full(flat.shape[0], -1, dtype=np.int64)
    uniq, inv = np.unique(flat, axis=0, return_inverse=True)
    lu = np.array([lut.get(tuple(row), -1) for row in uniq])
    out = lu[inv]
    return out.reshape(H, W)
