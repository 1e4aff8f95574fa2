"""End-to-end SLAM driver — the equivalent of hierslam_main
(scripts/hierslam.py:1495-2237), re-architected for TPU:

* all per-iteration math lives in three jitted functions (tracker /
  densifier / mapper) compiled once per run; the host loop only loads
  frames, selects keyframes and shuttles data;
* the Gaussian map is a fixed-capacity slot buffer (no reallocation);
* the mapping window is padded to a static size so every mapping phase
  reuses one executable;
* keyframe images are host-resident (numpy) and uploaded per phase.

Schedule parity: tracking every frame (skip frame 0), densify+mapping when
``time_idx == 0 or (time_idx+1) % map_every == 0`` (:1929), keyframe
admission every ``keyframe_every`` (+ frame 0 and num_frames-2) gated on
finite GT pose (:2108-2124), checkpoints every ``checkpoint_interval``.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hierslam_tpu.config import apply_defaults, raster_config
from hierslam_tpu.core import gaussians as G
from hierslam_tpu.core import transforms
from hierslam_tpu.core.camera import setup_camera
from hierslam_tpu.datasets import get_dataset
from hierslam_tpu.datasets.base import load_dataset_config
from hierslam_tpu.slam import optim
from hierslam_tpu.slam.keyframes import Keyframe, KeyframeStore, keyframe_selection_overlap
from hierslam_tpu.slam.losses import LossConfig, mlp_init
from hierslam_tpu.slam.mapping import PruneConfig, make_densifier, make_mapper
from hierslam_tpu.slam.tracking import apply_gt_pose, est_w2c, make_tracker, propagate_pose
from hierslam_tpu.utils import io as uio


class SLAMRunner:
    def __init__(self, config: Dict):
        from hierslam_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache(config.get("jax_cache_dir"))
        self.config = config = apply_defaults(config)
        uio.seed_everything(config["seed"])
        self.rng = np.random.default_rng(config["seed"])
        self.key = jax.random.PRNGKey(config["seed"])

        self.output_dir = os.path.join(config["workdir"], config["run_name"])
        self.eval_dir = os.path.join(self.output_dir, "eval")
        os.makedirs(self.eval_dir, exist_ok=True)

        # ---- dataset -----------------------------------------------------
        dc = config["data"]
        if "gradslam_data_cfg" in dc:
            data_cfg = load_dataset_config(dc["gradslam_data_cfg"])
            data_cfg = {**data_cfg, **dc}
        else:
            data_cfg = dict(dc)
            data_cfg["dataset_name"] = dc["dataset_name"]
        data_cfg["results_dir"] = self.output_dir
        self.semantic = "semantic" in data_cfg["dataset_name"]
        self.dataset = get_dataset(
            config_dict=data_cfg,
            basedir=dc["basedir"],
            sequence=os.path.basename(dc["sequence"]),
            start=dc["start"],
            end=dc["end"],
            stride=dc["stride"],
            desired_height=dc["desired_image_height"],
            desired_width=dc["desired_image_width"],
            relative_pose=True,
        )
        self.num_frames = dc.get("num_frames", -1)
        if self.num_frames == -1:
            self.num_frames = len(self.dataset)

        # ---- semantics ---------------------------------------------------
        self.num_semantic = 0
        self.sem_levels: tuple = ()
        self.num_leaf = 0
        self.use_mlp = False
        if self.semantic:
            ns = self.dataset.num_semantic
            if isinstance(ns, list):
                self.sem_levels = tuple(int(x) for x in ns[:-1])
                self.num_semantic = int(sum(ns[:-1]))
                self.num_leaf = int(self.dataset.num_semantic_class)
                self.use_mlp = config.get("model", {}).get("flag_use_embedding", 0) == 1
            else:
                self.num_semantic = int(ns)
                self.sem_levels = (self.num_semantic,)
                self.num_leaf = int(ns)

        # ---- first frame / camera / map init ----------------------------
        first = self.dataset[0]
        color0, depth0, K4, pose0 = first[:4]
        self.intrinsics = np.asarray(K4)[:3, :3]
        w2c0 = np.linalg.inv(np.asarray(pose0))
        H, W = depth0.shape
        self.H, self.W = H, W
        self.camera = setup_camera(W, H, self.intrinsics, w2c0)
        self.first_frame_w2c = w2c0

        capacity = int(config["map_capacity"])
        self.params = G.empty_params(capacity, self.num_frames, self.num_semantic)
        self.variables = G.empty_variables(capacity)

        intr_np, w2c0_np, nsem = self.intrinsics, w2c0, self.num_semantic

        @jax.jit
        def init_first(params, variables, im, d, key):
            fields = G.pointcloud_fields(im, d, intr_np, w2c0_np, nsem, key)
            return G.insert_gaussians(params, variables, fields, (d > 0).reshape(-1), 0.0)

        im0 = jnp.asarray(color0.transpose(2, 0, 1) / 255.0, jnp.float32)
        d0 = jnp.asarray(depth0, jnp.float32)
        self.key, sub = jax.random.split(self.key)
        self.params, self.variables, over = init_first(
            self.params, self.variables, im0, d0, sub
        )
        if int(over) > 0:
            raise ValueError(f"map_capacity {capacity} too small for first frame")
        self.variables["scene_radius"] = jnp.asarray(
            float(np.max(depth0)) / config["scene_radius_depth_ratio"], jnp.float32
        )

        # ---- jitted step functions --------------------------------------
        rc = raster_config(config)
        # Opacity resets invalidate the saturation bound mid-phase (every
        # per-pair alpha collapses to 0.01 while the amortized lists keep
        # the pre-reset truncation): disable saturation capping then.
        if rc.sat_margin > 0 and config.get("mapping", {}).get(
            "pruning_dict", {}
        ).get("reset_opacities", False):
            import warnings

            warnings.warn(
                "reset_opacities invalidates amortized saturation capping; "
                "disabling raster.sat_margin for this run"
            )
            from dataclasses import replace as _dcr

            rc = _dcr(rc, sat_margin=0.0)
        self.rc = rc
        tcfg = config["tracking"]
        self.tracking_cfg = tcfg
        track_loss = LossConfig(
            use_sil_for_loss=tcfg["use_sil_for_loss"],
            sil_thres=tcfg["sil_thres"],
            use_l1=tcfg["use_l1"],
            ignore_outlier_depth_loss=tcfg["ignore_outlier_depth_loss"],
            w_im=tcfg["loss_weights"]["im"],
            w_depth=tcfg["loss_weights"]["depth"],
        )
        # Pose-only cached fast path: isotropic maps cache one scale per
        # pair, anisotropic ones the frame-constant world covariance
        # (ops/render_tracked.py) — both avoid per-iteration gathers.
        self.tracker = make_tracker(
            self.camera, track_loss, rc,
            lr_quat=tcfg["lrs"]["cam_unnorm_rots"],
            lr_trans=tcfg["lrs"]["cam_trans"],
            num_iters=tcfg["num_iters"],
            use_cache=bool(config.get("track_use_cache", True)),
        )

        mcfg = config["mapping"]
        self.mapping_cfg = mcfg
        map_loss = LossConfig(
            use_sil_for_loss=mcfg["use_sil_for_loss"],
            sil_thres=mcfg["sil_thres"],
            use_l1=mcfg["use_l1"],
            ignore_outlier_depth_loss=mcfg["ignore_outlier_depth_loss"],
            w_im=mcfg["loss_weights"]["im"],
            w_depth=mcfg["loss_weights"]["depth"],
            w_sem=mcfg["loss_weights"].get("sem", 0.0),
            sem_levels=self.sem_levels if self.semantic else (),
            num_leaf=self.num_leaf,
            use_mlp=self.use_mlp,
        )
        prune = PruneConfig(**{
            k: mcfg["pruning_dict"][k]
            for k in PruneConfig.__dataclass_fields__
            if k in mcfg.get("pruning_dict", {})
        }) if mcfg.get("prune_gaussians", False) else None
        self.prune_enabled = prune is not None
        map_lrs = {k: v for k, v in mcfg["lrs"].items() if k in G.GAUSSIAN_KEYS}
        # classic 3DGS clone/split densification
        # (use_gaussian_splatting_densification, scripts/hierslam.py:2047)
        densify_cfg = None
        if mcfg.get("use_gaussian_splatting_densification", False):
            from hierslam_tpu.slam.densify_classic import DensifyConfig

            densify_cfg = DensifyConfig(**{
                k: mcfg.get("densify_dict", {})[k]
                for k in DensifyConfig.__dataclass_fields__
                if k in mcfg.get("densify_dict", {})
            })
        # Multi-device mapping (config["parallel"]["map_data_devices"] = D):
        # the mapping phase runs keyframe-data-parallel over a D-device mesh
        # — D window frames per iteration, gradients pmean'd over ICI.  The
        # reference has no distributed path at all (SURVEY.md §2.3); with
        # D=1-equivalent indices the math reduces exactly to the
        # single-device mapper (tests/test_parallel.py).
        self.map_dp = int(config.get("parallel", {}).get("map_data_devices", 0))
        if self.map_dp > 1:
            n_dev = len(jax.devices())
            if n_dev < self.map_dp:
                raise ValueError(
                    f"parallel.map_data_devices={self.map_dp} but only "
                    f"{n_dev} devices are visible"
                )
            if densify_cfg is not None:
                raise ValueError(
                    "parallel.map_data_devices does not support "
                    "use_gaussian_splatting_densification"
                )
            from hierslam_tpu.parallel import make_dp_mapper, make_mesh

            self.mesh = make_mesh(self.map_dp)
            self.mapper = make_dp_mapper(
                self.mesh, self.camera, map_loss, rc, map_lrs,
                num_iters=mcfg["num_iters"],
                prune_cfg=prune or PruneConfig(start_after=10**9),
            )
        else:
            self.mapper = make_mapper(
                self.camera, map_loss, rc, map_lrs,
                num_iters=mcfg["num_iters"],
                prune_cfg=prune or PruneConfig(start_after=10**9),
                densify_cfg=densify_cfg,
            )
        self.densifier = make_densifier(
            self.camera, rc, mcfg["sil_thres"], self.num_semantic
        )

        # ---- semantic decoder -------------------------------------------
        self.mlp = None
        self.mlp_state = None
        if self.use_mlp:
            self.key, sub = jax.random.split(self.key)
            self.mlp = mlp_init(self.num_semantic, self.num_leaf, sub)
            self.mlp_state = optim.adam_init(self.mlp)

        self.keyframes = KeyframeStore()
        self.gt_w2c_all: List[np.ndarray] = []

        from hierslam_tpu.utils.logging import RunLogger

        self.logger = RunLogger(
            self.output_dir, use_wandb=config.get("use_wandb", False),
            wandb_cfg=config.get("wandb"),
        )

        # online progress reporting (report_progress_newrender call sites,
        # scripts/hierslam.py:1896-1925, 2086-2104)
        from hierslam_tpu.eval.runner import _build_renderer

        self._progress_render = _build_renderer(self.camera, rc, with_semantic=False)
        self.plot_dir = os.path.join(self.eval_dir, "plots")

        # ---- resume (scripts/hierslam.py:1716-1752) ----------------------
        self.start_idx = 0
        if config.get("load_checkpoint", False):
            self.start_idx = int(config["checkpoint_time_idx"])
            self._resume(self.start_idx)
        self.stats = dict(
            tracking_iter_time_sum=0.0, tracking_iter_time_count=0,
            tracking_frame_time_sum=0.0, tracking_frame_time_count=0,
            mapping_iter_time_sum=0.0, mapping_iter_time_count=0,
            mapping_frame_time_sum=0.0, mapping_frame_time_count=0,
            densify_added=0, densify_overflow=0,
            bin_overflow_last=0, bin_overflow_max=0,
            compactions=0, slots_reclaimed=0, emergency_pruned=0,
        )
        self.overflow_warn_threshold = int(
            self.config.get("raster", {}).get("overflow_warn_threshold", 100_000)
        )

        # ---- active-prefix compute bucket --------------------------------
        # Used slots always form a prefix [0, n_active) (inserts append,
        # pruning only clears bits), so every per-gaussian stage can run on
        # a sliced prefix rounded up to a bucket — per-iteration cost then
        # scales with the LIVE map, not map_capacity (at 2.5M capacity and
        # 800k live this is a ~3x cut of preprocess/binning/adam work).
        # Each distinct bucket size is one extra XLA compile (persistently
        # cached); the step size bounds how many exist.
        self.capacity = capacity
        self.bucket_step = int(config.get("bucket_step", 512 * 1024))
        self.bucket_headroom = int(config.get("bucket_headroom", 256 * 1024))
        self.bucket = self._choose_bucket()
        # compact when pruning has opened this many reclaimable holes
        self.hole_compact_threshold = int(
            config.get("hole_compact_threshold", self.bucket_step)
        )

    # ------------------------------------------------------------------
    def _choose_bucket(self) -> int:
        need = int(self.variables["n_active"]) + self.bucket_headroom
        b = -(-need // self.bucket_step) * self.bucket_step
        return min(self.capacity, b)

    def _sliced_state(self):
        b = self.bucket
        p = {
            k: (v[:b] if k in G.GAUSSIAN_KEYS else v)
            for k, v in self.params.items()
        }
        v = {
            k: (val[:b] if val.ndim >= 1 and val.shape[0] == self.capacity else val)
            for k, val in self.variables.items()
        }
        return p, v

    def _merge_params(self, p_b) -> None:
        b = self.bucket
        for k, v in p_b.items():
            if k in G.GAUSSIAN_KEYS:
                self.params[k] = self.params[k].at[:b].set(v)
            else:
                self.params[k] = v

    def _merge_variables(self, v_b) -> None:
        b = self.bucket
        for k, v in v_b.items():
            if hasattr(v, "ndim") and v.ndim >= 1 and self.variables[k].shape[0] == self.capacity:
                self.variables[k] = self.variables[k].at[:b].set(v)
            else:
                self.variables[k] = v

    # ------------------------------------------------------------------
    # capacity-slot maintenance (VERDICT r2 #4: react to densify overflow)
    def _holes(self) -> int:
        """Dead slots inside the used prefix (pruned but not reclaimed)."""
        return int(self.variables["n_active"]) - int(
            jnp.sum(self.variables["active"])
        )

    def _compact(self, reason: str) -> None:
        """Stable-partition live rows to the front, reclaiming prune holes
        as append slots; shrinks the compute bucket when possible."""
        holes = self._holes()
        self.params, self.variables = G.compact_slots(self.params, self.variables)
        self.stats["compactions"] += 1
        self.stats["slots_reclaimed"] += holes
        self.bucket = self._choose_bucket()
        self.logger.log(
            -1, compaction_reason=reason, slots_reclaimed=holes,
            n_active=int(self.variables["n_active"]),
        )

    def _escalated_prune(self, need_free: int, t: int) -> bool:
        """Escalating prune pressure under capacity saturation: drop the
        least-opaque live gaussians (<= 20% of the live map), then compact.
        Returns False when nothing could be freed."""
        headroom = max(need_free, self.bucket_headroom // 4)
        self.variables, n_freed = G.emergency_prune(
            self.params, self.variables, headroom
        )
        n_freed = int(n_freed)
        if n_freed == 0:
            return False
        import warnings

        warnings.warn(
            f"frame {t}: capacity saturated — escalated prune dropped the "
            f"{n_freed} least-opaque gaussians to make room"
        )
        self.stats["emergency_pruned"] += n_freed
        self.logger.log(t, emergency_pruned=n_freed)
        self._compact(f"escalated prune at frame {t}")
        return True

    # ------------------------------------------------------------------
    def _resume(self, ckpt_t: int):
        """Reload params{t}.npz + keyframe indices, replay GT-pose
        bookkeeping and rebuild the keyframe store by re-reading frames
        (scripts/hierslam.py:1716-1752).  Like the reference, optimizer
        moments and the aux variables are re-zeroed (approximate resume)."""
        ckpt = uio.load_params(os.path.join(self.output_dir, f"params{ckpt_t}.npz"))
        capacity = self.params["means3D"].shape[0]
        n = ckpt["means3D"].shape[0]
        if n > capacity:
            raise ValueError(f"checkpoint has {n} gaussians > capacity {capacity}")
        params = G.empty_params(capacity, self.num_frames, self.num_semantic)
        for k in G.GAUSSIAN_KEYS:
            if k in ckpt and k in params:
                params[k] = params[k].at[:n].set(jnp.asarray(ckpt[k]))
        params["cam_unnorm_rots"] = jnp.asarray(ckpt["cam_unnorm_rots"])
        params["cam_trans"] = jnp.asarray(ckpt["cam_trans"])
        self.params = params
        variables = G.empty_variables(capacity)
        variables["active"] = variables["active"].at[:n].set(True)
        variables["n_active"] = jnp.asarray(n, jnp.int32)
        variables["scene_radius"] = self.variables["scene_radius"]
        if "timestep" in ckpt and ckpt["timestep"].shape[0] == n:
            variables["timestep"] = variables["timestep"].at[:n].set(
                jnp.asarray(ckpt["timestep"])
            )
        self.variables = variables

        kf_idx = np.load(
            os.path.join(self.output_dir, f"keyframe_time_indices{ckpt_t}.npy")
        ).tolist()
        dec = os.path.join(self.output_dir, f"semantic_decoder_{ckpt_t}.npz")
        if self.use_mlp and os.path.isfile(dec):
            loaded = uio.load_semantic_decoder(dec)
            self.mlp = {k: jnp.asarray(v) for k, v in loaded.items()}
            self.mlp_state = optim.adam_init(self.mlp)
        for t in range(ckpt_t):
            im_np, depth_np, label_np, gt_w2c = self._load_frame(t)
            self.gt_w2c_all.append(gt_w2c)
            if t in kf_idx:
                self.keyframes.add(
                    Keyframe(id=t, w2c=self._est_w2c(t), color=im_np,
                             depth=depth_np, labels=label_np)
                )

    def _load_frame(self, t: int):
        item = self.dataset[t]
        color, depth, _, pose = item[:4]
        label = item[4] if self.semantic else None
        gt_w2c = np.linalg.inv(np.asarray(pose))
        im = np.ascontiguousarray(color.transpose(2, 0, 1) / 255.0, dtype=np.float32)
        return im, np.asarray(depth, np.float32), label, gt_w2c

    def _window_arrays(self, frames: List[Keyframe], pad_to: int):
        n = len(frames)
        reps = [frames[i if i < n else 0] for i in range(pad_to)]
        window = {
            "im": jnp.asarray(np.stack([f.color for f in reps])),
            "depth": jnp.asarray(np.stack([f.depth for f in reps])),
            "time_idx": jnp.asarray(np.array([f.id for f in reps], np.int32)),
        }
        if self.semantic:
            # int16 halves the window-label HBM (468 MB at 24x6 full-res
            # int32); every consumer casts to int32 at use.  All shipped
            # label spaces fit (<= ~550 raw ids for scannet tree_large).
            window["labels"] = jnp.asarray(
                np.stack([f.labels for f in reps]).astype(np.int16)
            )
        return window

    def _est_w2c(self, t: int) -> np.ndarray:
        return np.asarray(est_w2c(self.params, t))

    # ------------------------------------------------------------------
    def step(self, time_idx: int, frame=None):
        """Process one frame (tracking + optional densify/map/keyframe)."""
        cfg = self.config
        t = time_idx
        im_np, depth_np, label_np, gt_w2c = frame if frame is not None else self._load_frame(t)
        self.gt_w2c_all.append(gt_w2c)
        im = jnp.asarray(im_np)
        depth = jnp.asarray(depth_np)

        if t > 0:
            self.params = propagate_pose(
                self.params, t, forward_prop=cfg["tracking"]["forward_prop"]
            )

        # (A) tracking
        t0 = time.time()
        if t > 0 and not cfg["tracking"]["use_gt_poses"]:
            p_b, v_b = self._sliced_state()
            p_b, bloss, maxrad, trace, carry = self.tracker(
                p_b, v_b["active"], v_b["max_2D_radius"], im, depth, t,
            )
            # depth-loss escape hatch (scripts/hierslam.py:1877-1888): when
            # enabled and the final depth loss is still above the threshold,
            # the iteration budget is doubled once — continuing the SAME
            # Adam run (moments, step count and best-candidate bookkeeping
            # carry over into the extra round).
            if cfg["tracking"]["use_depth_loss_thres"]:
                d_last = float(trace[1][-1])
                if d_last >= cfg["tracking"]["depth_loss_thres"]:
                    p_b, bloss, maxrad, trace, carry = (
                        self.tracker.continue_round(
                            p_b, v_b["active"], im, depth, t, carry,
                        )
                    )
            bloss.block_until_ready()
            self._merge_params(p_b)
            self.variables["max_2D_radius"] = (
                self.variables["max_2D_radius"].at[: self.bucket].set(maxrad)
            )
            self.logger.log(t, tracking_loss=float(bloss))
            self.logger.log_iters(
                t, "tracking",
                {"loss": trace[0], "depth": trace[1], "im": trace[2]},
            )
            n_it = cfg["tracking"]["num_iters"]
            dt = time.time() - t0
            self.stats["tracking_iter_time_sum"] += dt
            self.stats["tracking_iter_time_count"] += n_it
        elif t > 0:
            self.params = apply_gt_pose(self.params, jnp.asarray(gt_w2c, jnp.float32), t)
        self.stats["tracking_frame_time_sum"] += time.time() - t0
        self.stats["tracking_frame_time_count"] += 1

        if t == 0 or (t + 1) % cfg["report_global_progress_every"] == 0:
            self._report_progress(
                t, im, depth, phase="tracking",
                sil_thres=cfg["tracking"]["sil_thres"],
            )

        # (B) densify + mapping
        if t == 0 or (t + 1) % cfg["map_every"] == 0:
            m0 = time.time()
            if cfg["mapping"].get("add_new_gaussians", True) and t > 0:
                self.key, sub = jax.random.split(self.key)
                p_b, v_b = self._sliced_state()
                p_b, v_b, n_added, n_over, n_bin_drop = self.densifier(
                    p_b, v_b, im, depth, jnp.asarray(t), sub
                )
                # Capacity-saturation remediation ladder (REAL_SHAPE_r02
                # saturated at 2.5M with 2.5M overflowed insertions and the
                # run silently degraded).  Each remedy redoes the densify
                # from the untouched full state:
                #   1. grow the compute bucket while below capacity;
                #   2. compact prune holes into reusable append slots;
                #   3. escalate prune pressure (drop the least-opaque
                #      fraction of the live map);
                #   4. still saturated -> loud error (configurable).
                prune_attempts = 0
                while int(n_over) > 0:
                    if self.bucket < self.capacity:
                        self.bucket = min(
                            self.capacity, self.bucket + self.bucket_step
                        )
                    elif self._holes() > 0:
                        self._compact(f"densify overflow at frame {t}")
                    elif prune_attempts < 3 and self._escalated_prune(
                        int(n_over), t
                    ):
                        prune_attempts += 1
                    else:
                        break
                    p_b, v_b = self._sliced_state()
                    p_b, v_b, n_added, n_over, n_bin_drop = self.densifier(
                        p_b, v_b, im, depth, jnp.asarray(t), sub
                    )
                if int(n_over) > 0:
                    msg = (
                        f"frame {t}: map capacity {self.capacity} saturated — "
                        f"{int(n_over)} new gaussians dropped even after "
                        "compaction and escalated pruning; raise map_capacity"
                    )
                    if cfg["mapping"].get("on_capacity_saturated", "error") == "error":
                        raise RuntimeError(msg)
                    import warnings

                    warnings.warn(msg)
                self._merge_params(p_b)
                self._merge_variables(v_b)
                self.stats["densify_added"] += int(n_added)
                self.stats["densify_overflow"] += int(n_over)
                n_bin_drop = int(n_bin_drop)
                self.stats["bin_overflow_last"] = n_bin_drop
                self.stats["bin_overflow_max"] = max(
                    self.stats["bin_overflow_max"], n_bin_drop
                )
                if n_bin_drop > self.overflow_warn_threshold:
                    import warnings

                    warnings.warn(
                        f"frame {t}: {n_bin_drop} (gaussian, tile) pairs dropped "
                        f"by binning caps (max_per_tile={self.rc.max_per_tile}, "
                        f"max_tiles_per_gaussian={self.rc.max_tiles_per_gaussian}) "
                        "— consider raising raster.max_per_tile"
                    )
                self.logger.log(t, bin_overflow=n_bin_drop)

            est_w2c = self._est_w2c(t)
            num_kf = cfg["mapping_window_size"] - 2
            selected = keyframe_selection_overlap(
                depth_np, est_w2c, self.intrinsics,
                self.keyframes.frames[:-1], num_kf, rng=self.rng,
            )
            window_frames = [self.keyframes.frames[i] for i in selected]
            if len(self.keyframes) > 0:
                window_frames.append(self.keyframes.frames[-1])
            window_frames.append(
                Keyframe(
                    id=t, w2c=est_w2c, color=im_np, depth=depth_np,
                    labels=label_np,
                )
            )
            window = self._window_arrays(window_frames, cfg["mapping_window_size"])
            idx_shape = (
                (cfg["mapping"]["num_iters"], self.map_dp)
                if self.map_dp > 1
                else cfg["mapping"]["num_iters"]
            )
            rand_idx = jnp.asarray(
                self.rng.integers(0, len(window_frames), idx_shape), jnp.int32
            )
            p_b, v_b = self._sliced_state()
            pre_state = None
            if cfg.get("nan_autopsy"):
                pre_state = jax.device_get((p_b, v_b, self.mlp, self.mlp_state))
            self.key, map_key = jax.random.split(self.key)
            (p_b, v_b, self.mlp, self.mlp_state, losses) = self.mapper(
                p_b, v_b, window, rand_idx, self.mlp, self.mlp_state, map_key
            )
            jax.block_until_ready(losses)
            self._merge_params(p_b)
            self._merge_variables(v_b)
            # reclaim slots when pruning has opened enough holes; otherwise
            # keep headroom for the next phases' insertions (grow-only:
            # compaction is the only event that shrinks the bucket)
            if self._holes() >= self.hole_compact_threshold:
                self._compact(f"hole threshold after mapping at frame {t}")
            else:
                self.bucket = max(self.bucket, self._choose_bucket())
            self.logger.log_iters(t, "mapping", losses)
            n_mb = int(np.max(np.asarray(losses.get("n_map_bin_dropped", 0.0))))
            if n_mb > self.overflow_warn_threshold:
                import warnings

                warnings.warn(
                    f"frame {t}: mapping binning dropped {n_mb} (gaussian, "
                    "tile) pairs (capacity-class ladder / emission budgets"
                    + (f" / visible_budget={self.rc.visible_budget}"
                       if self.rc.visible_budget else "")
                    + ") — consider widening raster.bucket_spec"
                )
                self.logger.log(t, n_map_bin_dropped=n_mb)
            n_gd = int(np.max(np.asarray(losses.get("n_grad_dropped", 0.0))))
            if n_gd > 0:
                import warnings

                warnings.warn(
                    f"frame {t}: {n_gd} valid (tile, slot) gradient routes "
                    f"truncated by grad_pair_budget="
                    f"{self.rc.grad_pair_budget} — mapping gradients are "
                    "biased; raise raster.grad_pair_budget"
                )
                self.logger.log(t, n_grad_dropped=n_gd)
            final_loss = float(losses["loss"][-1])
            if pre_state is not None and not np.isfinite(final_loss):
                # dump the exact pre-phase state + inputs so the divergence
                # can be replayed offline (tools/nan_autopsy.py)
                path = os.path.join(self.output_dir, f"nan_autopsy_{t}.npz")
                p0, v0, mlp0, ms0 = pre_state
                blob = {f"param.{k}": v for k, v in p0.items()}
                blob.update({f"var.{k}": np.asarray(v) for k, v in v0.items()})
                if mlp0 is not None:
                    blob.update({f"mlp.{k}": v for k, v in mlp0.items()})
                blob.update(
                    {f"window.{k}": np.asarray(v) for k, v in window.items()}
                )
                blob["rand_idx"] = np.asarray(rand_idx)
                blob["losses"] = np.asarray(losses["loss"])
                np.savez_compressed(path, **blob)
                raise RuntimeError(
                    f"mapping loss went non-finite at frame {t}; "
                    f"pre-phase state saved to {path}"
                )
            self.logger.log(
                t,
                mapping_loss=final_loss,
                n_active=int(self.variables["n_active"]),
            )
            dm = time.time() - m0
            self.stats["mapping_iter_time_sum"] += dm
            self.stats["mapping_iter_time_count"] += cfg["mapping"]["num_iters"]
            self.stats["mapping_frame_time_sum"] += dm
            self.stats["mapping_frame_time_count"] += 1

            if t == 0 or (t + 1) % cfg["report_global_progress_every"] == 0:
                self._report_progress(
                    t, im, depth, phase="mapping",
                    sil_thres=cfg["mapping"]["sil_thres"],
                )

        # (C) keyframe admission
        if (
            (t == 0 or (t + 1) % cfg["keyframe_every"] == 0 or t == self.num_frames - 2)
            and np.isfinite(gt_w2c).all()
        ):
            self.keyframes.add(
                Keyframe(
                    id=t, w2c=self._est_w2c(t), color=im_np, depth=depth_np,
                    labels=label_np,
                )
            )

        # (D) checkpoint
        if cfg["save_checkpoints"] and t % cfg["checkpoint_interval"] == 0:
            pn = G.active_params_to_numpy(self.params, self.variables)
            uio.save_params_ckpt(pn, self.output_dir, t)
            np.save(
                os.path.join(self.output_dir, f"keyframe_time_indices{t}.npy"),
                np.array(self.keyframes.time_indices),
            )
            uio.save_semantic_decoder(self.mlp, self.output_dir, suffix=f"_{t}")

    # ------------------------------------------------------------------
    def _report_progress(self, t, im, depth, phase: str, sil_thres: float):
        """Periodic qualitative/quantitative progress report; failure saves
        an emergency checkpoint and continues, matching the reference's
        try/except (scripts/hierslam.py:1911-1925, 2086-2104)."""
        from hierslam_tpu.eval.progress import report_progress

        try:
            report_progress(
                self._progress_render, self.params, im, depth, t,
                self.gt_w2c_all, sil_thres, self.plot_dir, phase=phase,
                save_plot=True, wandb_run=self.logger.wandb, logger=self.logger,
            )
        except Exception:
            self.emergency_checkpoint(t)
            print("Failed to evaluate trajectory.")

    # ------------------------------------------------------------------
    def finalize(self) -> Dict[str, np.ndarray]:
        """Save the final params.npz artifact (scripts/hierslam.py:2163-2176)."""
        pn = G.active_params_to_numpy(self.params, self.variables)
        pn["intrinsics"] = self.intrinsics
        pn["w2c"] = self.first_frame_w2c
        pn["org_width"] = np.asarray(self.W)
        pn["org_height"] = np.asarray(self.H)
        pn["gt_w2c_all_frames"] = np.stack(self.gt_w2c_all)
        pn["keyframe_time_indices"] = np.array(self.keyframes.time_indices)
        uio.save_params(pn, self.output_dir)
        uio.save_semantic_decoder(self.mlp, self.output_dir)
        return pn

    def runtime_summary(self) -> Dict[str, float]:
        s = self.stats
        def avg(a, b):
            return s[a] / max(s[b], 1)
        return {
            "tracking_iter_ms": avg("tracking_iter_time_sum", "tracking_iter_time_count") * 1e3,
            "tracking_frame_s": avg("tracking_frame_time_sum", "tracking_frame_time_count"),
            "mapping_iter_ms": avg("mapping_iter_time_sum", "mapping_iter_time_count") * 1e3,
            "mapping_frame_s": avg("mapping_frame_time_sum", "mapping_frame_time_count"),
            "densify_added": s["densify_added"],
            "densify_overflow": s["densify_overflow"],
            "bin_overflow_last": s["bin_overflow_last"],
            "bin_overflow_max": s["bin_overflow_max"],
            "compactions": s["compactions"],
            "slots_reclaimed": s["slots_reclaimed"],
            "emergency_pruned": s["emergency_pruned"],
            "n_active": int(jnp.sum(self.variables["active"])),
        }

    def emergency_checkpoint(self, t: int):
        """Save a recoverable snapshot on failure (the reference's
        save_params_ckpt fallback, scripts/hierslam.py:1922-1925)."""
        pn = G.active_params_to_numpy(self.params, self.variables)
        uio.save_params_ckpt(pn, self.output_dir, t)
        np.save(
            os.path.join(self.output_dir, f"keyframe_time_indices{t}.npy"),
            np.array(self.keyframes.time_indices),
        )
        uio.save_semantic_decoder(self.mlp, self.output_dir, suffix=f"_{t}")

    def run(self, progress: bool = True):
        from hierslam_tpu.utils.prefetch import Prefetcher

        frames = Prefetcher(self._load_frame, self.start_idx, self.num_frames, depth=2)
        it = iter(frames)
        if progress:
            from tqdm import tqdm

            it = tqdm(it, total=self.num_frames - self.start_idx, desc="hierslam-tpu")
        # first-class device tracing (SURVEY 5.1): config["profile"] =
        # {"trace_dir": str, "frames": [..]} wraps the listed frames in
        # jax.profiler.trace; xplanes land under trace_dir for offline
        # attribution (see tools/profile_map.py for the parser).
        prof = self.config.get("profile") or {}
        prof_frames = set(prof.get("frames", ()))
        for t, frame in it:
            try:
                if t in prof_frames:
                    with jax.profiler.trace(prof["trace_dir"]):
                        self.step(t, frame)
                else:
                    self.step(t, frame)
            except Exception:
                self.emergency_checkpoint(t)
                raise
        pn = self.finalize()
        self.logger.close()
        try:  # metrics.png (utils/eval_helpers.py:1623-1646)
            from hierslam_tpu.utils.logging import plot_metrics

            plot_metrics(
                self.logger.path, os.path.join(self.eval_dir, "metrics.png"),
                keys=("tracking_loss", "mapping_loss", "n_active"),
            )
        except Exception as e:
            print(f"metrics plot failed: {e}")
        summ = self.runtime_summary()
        print(
            "Average Tracking/Iteration Time: {:.2f} ms\n"
            "Average Tracking/Frame Time: {:.3f} s\n"
            "Average Mapping/Iteration Time: {:.2f} ms\n"
            "Average Mapping/Frame Time: {:.3f} s".format(
                summ["tracking_iter_ms"], summ["tracking_frame_s"],
                summ["mapping_iter_ms"], summ["mapping_frame_s"],
            )
        )
        return pn, summ


def run_slam(config: Dict, do_eval: bool = True):
    runner = SLAMRunner(config)
    params_np, summary = runner.run()
    results = None
    if do_eval:
        from hierslam_tpu.eval.runner import run_final_eval

        results = run_final_eval(
            runner.dataset, params_np, runner.config, runner.eval_dir,
            mlp=runner.mlp, num_frames=runner.num_frames,
        )
    return params_np, summary, results
