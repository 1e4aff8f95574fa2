"""ScanNet loaders (plain + semantic nyu40/tree/tree_large).

Directory contract (datasets/gradslam_datasets/scannet.py): ``color/*.jpg``,
``depth/*.png`` (/1000), per-frame ``pose/*.txt`` (:26-77); semantics from
``label-filt/*.png`` raw-id images (:112-116) remapped to NYU40 via column
4 of ``scannetv2-labels.combined.tsv`` (:575-599) and optionally to tree
levels via the tree TSVs (:719-966).  Labels are remapped lazily per frame
via LUT (results identical to the reference's eager preload, :271-341).
"""
from __future__ import annotations

import glob
import os
from typing import Dict

import imageio.v2 as imageio
import numpy as np

from hierslam_tpu.datasets.base import RGBDDataset, natsorted
from hierslam_tpu.datasets import tree as tree_lib


# NYU40 label colour code (standard palette used by ScanNet tooling).
NYU40_COLOUR_CODE = np.array(
    [
        (0, 0, 0), (174, 199, 232), (152, 223, 138), (31, 119, 180), (255, 187, 120),
        (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40), (197, 176, 213),
        (148, 103, 189), (196, 156, 148), (23, 190, 207), (178, 76, 76), (247, 182, 210),
        (66, 188, 102), (219, 219, 141), (140, 57, 197), (202, 185, 52), (51, 176, 203),
        (200, 54, 131), (92, 193, 61), (78, 71, 183), (172, 114, 82), (255, 127, 14),
        (91, 163, 138), (153, 98, 156), (140, 153, 101), (158, 218, 229), (100, 125, 154),
        (178, 127, 135), (120, 185, 128), (146, 111, 194), (44, 160, 44), (112, 128, 144),
        (96, 207, 209), (227, 119, 194), (213, 92, 176), (94, 106, 211), (82, 84, 163),
        (100, 85, 144),
    ],
    dtype=np.uint8,
)


class ScannetDataset(RGBDDataset):
    def __init__(self, config_dict, basedir, sequence, **kwargs):
        self.input_folder = os.path.join(basedir, sequence)
        super().__init__(config_dict, **kwargs)

    def get_filepaths(self):
        color = natsorted(glob.glob(f"{self.input_folder}/color/*.jpg"))
        depth = natsorted(glob.glob(f"{self.input_folder}/depth/*.png"))
        return color, depth

    def load_poses(self):
        files = natsorted(glob.glob(f"{self.input_folder}/pose/*.txt"))
        return [np.loadtxt(p) for p in files]


class ScannetSemanticDataset(ScannetDataset):
    """ScanNet + semantics.  ``sem_mode``:

    * ``nyu40`` — flat 41-class labels (raw ids -> NYU40);
    * ``tree`` — 4-level hierarchy over NYU40 (embedding width =
      sum of per-level counts, e.g. 16);
    * ``tree_large`` — 5-level hierarchy over raw ids (~550 classes,
      width 74).
    """

    def __init__(self, config_dict, basedir, sequence, **kwargs):
        self.sem_mode = config_dict.get("sem_mode", "nyu40")
        self.dataset_name = config_dict["dataset_name"]
        self.input_folder = os.path.join(basedir, sequence)
        tsv_dir = config_dict.get("labels_tsv_dir", basedir)

        raw_tsv = os.path.join(self.input_folder, "scannetv2-labels.combined.tsv")
        if not os.path.isfile(raw_tsv):
            raw_tsv = os.path.join(tsv_dir, "scannetv2-labels.combined.tsv")
        self.raw_to_nyu40 = tree_lib.load_scannet_raw_to_nyu40(raw_tsv)

        if self.sem_mode == "nyu40":
            self.num_semantic = 41
            self.num_semantic_class = 41
            self.tree_mapping = None
            self.num_levels = 0
        elif self.sem_mode == "tree":
            tree_tsv = os.path.join(tsv_dir, "scannetv2-labels.combined.tree.tsv")
            mapping, _, _ = tree_lib.load_scannet_tree(tree_tsv, levels=4, key="nyu40")
            self.tree_mapping = mapping
            counts = tree_lib.find_max_level(
                {str(k): v for k, v in mapping.items()}, add_one=True
            )
            self.num_semantic = counts + [41]
            self.num_semantic_class = 41
            self.num_levels = 4
        elif self.sem_mode == "tree_large":
            tree_tsv = os.path.join(tsv_dir, "scannetv2-labels.combined.tree-large.tsv")
            mapping, _, names_by_id = tree_lib.load_scannet_tree(
                tree_tsv, levels=5, key="raw"
            )
            self.tree_mapping = mapping
            counts = tree_lib.find_max_level(
                {str(k): v for k, v in mapping.items()}, add_one=True
            )
            self.num_semantic = counts + [len(mapping)]
            self.num_semantic_class = len(mapping)
            self.num_levels = 5
            # sparse raw-id eval protocol (scannet.py:211-216 in the
            # reference): dense leaf index i <-> raw id semantic_id[i]
            self.semantic_id = list(mapping.keys())
            self.semantic_class = [names_by_id[k] for k in self.semantic_id]
            # raw id -> dense leaf index LUT for label remapping
            max_raw = max(self.semantic_id)
            self._raw_to_dense = np.zeros(max_raw + 1, dtype=np.int64)
            for i, k in enumerate(self.semantic_id):
                self._raw_to_dense[k] = i
        else:
            raise ValueError(f"unknown sem_mode {self.sem_mode}")
        self.colour_map_np = NYU40_COLOUR_CODE

        super().__init__(config_dict, basedir, sequence, **kwargs)
        paths = natsorted(glob.glob(f"{self.input_folder}/label-filt/*.png"))
        self.label_paths = [paths[i] for i in self.retained_inds]
        assert len(self.label_paths) == self.num_imgs

    def load_label(self, index: int) -> np.ndarray:
        raw = np.asarray(imageio.imread(self.label_paths[index]), dtype=np.int64)
        raw = self._preprocess_label(raw)
        if self.sem_mode == "tree_large":
            # large tree keys raw ids directly; the LEAF row is the dense
            # class index (so CE logits [num_leaf] index safely) — raw ids
            # are recovered in eval via semantic_id[dense]
            out = tree_lib.remap_levels(raw, self.tree_mapping, self.num_levels)
            out[-1] = self._raw_to_dense[
                np.clip(out[-1], 0, len(self._raw_to_dense) - 1)
            ]
            return out
        # raw -> nyu40
        lut = np.zeros(max(self.raw_to_nyu40.keys()) + 1, dtype=np.int64)
        for k, v in self.raw_to_nyu40.items():
            lut[k] = v
        nyu = lut[np.clip(raw, 0, len(lut) - 1)]
        if self.sem_mode == "nyu40":
            return nyu[None].astype(np.int32)
        return tree_lib.remap_levels(nyu, self.tree_mapping, self.num_levels)

    def __getitem__(self, index: int):
        color, depth, K4, pose = super().__getitem__(index)
        return color, depth, K4, pose, self.load_label(index)
