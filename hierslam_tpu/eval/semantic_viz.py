"""Semantic visualization + SGS-SLAM gt_transfer protocol.

Equivalents of the reference's qualitative semantic surface:

* ``visualize_label`` / ``semantic_label_vis`` — palette colorization;
* ``plot_semantic_legend`` — the class legend figure
  (datasets/gradslam_datasets/replica.py:521-612, visual_semantic_legend);
* ``gt_transfer_labels`` — the SGS-SLAM color-transfer eval protocol
  (utils/eval_helpers.py:1355-1396): snap each predicted pixel to the
  nearest palette color present in the GT frame ("Not Recommended" per the
  reference, but supported behind ``eval_gt_transfer``);
* ``show_semantic`` — multi-level semantic replay imagery
  (utils/eval_helpers.py:1933-2102): per-tree-level pred/GT label images,
  optionally alpha-blended over the RGB frame, saved as
  ``sem_{t:04d}_level{i}[_gt].png``.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def visualize_label(label: np.ndarray, colors_map: np.ndarray) -> np.ndarray:
    """[H, W] int label image -> [H, W, 3] uint8 palette colors."""
    idx = np.clip(label.astype(np.int64), 0, len(colors_map) - 1)
    return colors_map[idx].astype(np.uint8)


def blend_over_rgb(
    label_vis: np.ndarray, rgb: np.ndarray, w_color: float = 0.35, w_sem: float = 0.65
) -> np.ndarray:
    """cv2.addWeighted equivalent (eval_helpers.py:2054-2056): rgb and the
    colorized labels mixed 0.35/0.65."""
    out = rgb.astype(np.float32) * w_color + label_vis.astype(np.float32) * w_sem
    return np.clip(out, 0, 255).astype(np.uint8)


def plot_semantic_legend(
    class_ids: Sequence[int],
    class_names: Sequence[str],
    colormap: np.ndarray,
    save_path: str,
    save_name: str = "semantic_class_Legend",
    ncol: Optional[int] = None,
) -> str:
    """Legend figure of class color patches (replica.py:521-612)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.patches as mpatches
    import matplotlib.pyplot as plt

    os.makedirs(save_path, exist_ok=True)
    patches = [
        mpatches.Patch(
            color=np.asarray(colormap[int(c)], np.float32) / 255.0,
            label=f"{c}: {n}",
        )
        for c, n in zip(class_ids, class_names)
    ]
    n = max(len(patches), 1)
    ncol = ncol or max(1, int(np.ceil(n / 25)))
    fig = plt.figure(figsize=(3 * ncol, min(25, n) * 0.25 + 1))
    plt.legend(handles=patches, loc="center", ncol=ncol, fontsize=7)
    plt.axis("off")
    out = os.path.join(save_path, f"{save_name}.png")
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out


def gt_transfer_labels(
    pred_label: np.ndarray, gt_label: np.ndarray, colors_map: np.ndarray
) -> np.ndarray:
    """SGS-SLAM protocol (eval_helpers.py:1355-1396): re-assign every
    predicted pixel to the class whose palette color is nearest among the
    classes PRESENT in this frame's GT.  Identical math to the reference's
    color-space argmin because palette rows are unique per class."""
    gt_classes = np.unique(gt_label.astype(np.int64))
    refer = colors_map[np.clip(gt_classes, 0, len(colors_map) - 1)].astype(np.float32)
    pred_colors = colors_map[
        np.clip(pred_label.astype(np.int64), 0, len(colors_map) - 1)
    ].astype(np.float32)
    # [H, W, G] distances to the GT-present palette colors
    d = np.linalg.norm(pred_colors[..., None, :] - refer[None, None], axis=-1)
    return gt_classes[np.argmin(d, axis=-1)]


def _combined_prefix_ids(levels_a: np.ndarray, levels_b: np.ndarray):
    """Shared dense ids for the tuples of per-level labels (the reference's
    transfer_eachlevel_1 prefix flattening, eval_helpers.py:2010-2018) —
    computed jointly over pred+GT so colors match across the two images."""
    L = levels_a.shape[0]
    both = np.concatenate(
        [levels_a.reshape(L, -1), levels_b.reshape(L, -1)], axis=1
    ).T  # [2P, L]
    uniq, inv = np.unique(both, axis=0, return_inverse=True)
    P = levels_a.shape[1] * levels_a.shape[2]
    ia = inv[:P].reshape(levels_a.shape[1:])
    ib = inv[P:].reshape(levels_b.shape[1:])
    return ia, ib, len(uniq)


def show_semantic(
    render_sem_fn,
    dataset,
    num_frames: int,
    eval_dir: str,
    mlp: Optional[Dict] = None,
    frames: Optional[Sequence[int]] = None,
    blend_rgb: bool = True,
    w_color: float = 0.35,
    w_sem: float = 0.65,
) -> List[str]:
    """Multi-level semantic imagery for selected frames
    (show_semantic, eval_helpers.py:1933-2102).

    ``render_sem_fn(t) -> [S, H, W]`` renders the semantic channels at the
    estimated pose of frame ``t``.  Saves, per frame and tree level,
    ``sem_{t:04d}_level{i}.png`` (prediction) + ``..._gt.png`` under
    ``eval_dir/rendered_semantic_multilevel[_mlp]``; returns written paths.
    """
    import imageio.v2 as imageio

    from hierslam_tpu.datasets import tree as tree_lib
    from hierslam_tpu.eval import metrics as M
    from hierslam_tpu.slam.losses import mlp_apply

    sub = "rendered_semantic_multilevel_mlp" if mlp is not None else \
        "rendered_semantic_multilevel"
    out_dir = os.path.join(eval_dir, sub)
    os.makedirs(out_dir, exist_ok=True)
    num_semantic = dataset.num_semantic
    n_levels = len(num_semantic) - 1
    written: List[str] = []
    frames = list(frames) if frames is not None else [0, num_frames // 2]

    for t in frames:
        if t >= num_frames:
            continue
        item = dataset[t]
        color = np.asarray(item[0])  # [H, W, 3] 0-255
        label_gt = np.asarray(item[4])  # [L+1, H, W]
        sem_img = np.asarray(render_sem_fn(t))  # [S, H, W]
        pred_levels = M.decode_tree_labels(sem_img, num_semantic)  # [L, H, W]
        if mlp is not None:
            import jax.numpy as jnp

            leaf = np.argmax(
                np.asarray(mlp_apply(
                    {k: jnp.asarray(v) for k, v in mlp.items()}, jnp.asarray(sem_img)
                )), axis=0,
            )
        else:
            leaf = pred_levels[-1]

        base = f"sem_{t:04d}"
        for i_level in range(n_levels):
            if i_level == n_levels - 1:
                # leaf level: dataset palette (eval_helpers.py:2040-2046)
                cmap = np.asarray(dataset.colors_map_all)
                vis_pred = visualize_label(leaf, cmap)
                vis_gt = visualize_label(label_gt[-1], cmap)
            else:
                ia, ib, n_ids = _combined_prefix_ids(
                    pred_levels[: i_level + 1], label_gt[: i_level + 1]
                )
                cmap = tree_lib.label_colormap(max(n_ids, 2))
                vis_pred = visualize_label(ia, cmap)
                vis_gt = visualize_label(ib, cmap)
            if blend_rgb:
                vis_pred = blend_over_rgb(vis_pred, color, w_color, w_sem)
                vis_gt = blend_over_rgb(vis_gt, color, w_color, w_sem)
            p1 = os.path.join(out_dir, f"{base}_level{i_level}.png")
            p2 = os.path.join(out_dir, f"{base}_level{i_level}_gt.png")
            imageio.imwrite(p1, vis_pred)
            imageio.imwrite(p2, vis_gt)
            written += [p1, p2]
    return written
