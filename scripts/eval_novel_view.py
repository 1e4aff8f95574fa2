#!/usr/bin/env python
"""Standalone evaluation of a finished run (scripts/eval_novel_view.py of
the reference): reload params.npz (+ semantic decoder), rebuild the
dataset, and dispatch to the train-split eval or the novel-view eval.

Usage: python scripts/eval_novel_view.py <config.py>
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str)
    args = parser.parse_args()

    from hierslam_tpu.config import apply_defaults, load_config
    from hierslam_tpu.datasets import get_dataset
    from hierslam_tpu.datasets.base import load_dataset_config
    from hierslam_tpu.eval.runner import run_final_eval, run_nvs_eval
    from hierslam_tpu.utils import io as uio

    config = apply_defaults(load_config(args.experiment))
    results_dir = os.path.join(config["workdir"], config["run_name"])
    eval_dir = os.path.join(results_dir, "eval")
    params_np = uio.load_params(os.path.join(results_dir, "params.npz"))

    dec_path = os.path.join(results_dir, "semantic_decoder.npz")
    mlp = uio.load_semantic_decoder(dec_path) if os.path.isfile(dec_path) else None

    dc = config["data"]
    if "gradslam_data_cfg" in dc:
        data_cfg = {**load_dataset_config(dc["gradslam_data_cfg"]), **dc}
    else:
        data_cfg = dict(dc)
    data_cfg["results_dir"] = results_dir
    use_train = dc.get("use_train_split", True)
    dataset = get_dataset(
        config_dict=data_cfg,
        basedir=dc["basedir"],
        sequence=os.path.basename(dc["sequence"]),
        start=dc["start"], end=dc["end"], stride=dc["stride"],
        desired_height=dc["desired_image_height"],
        desired_width=dc["desired_image_width"],
        relative_pose=True,
        **({"use_train_split": use_train} if "replicav2" in data_cfg["dataset_name"] else {}),
    )

    if use_train:
        run_final_eval(dataset, params_np, config, eval_dir, mlp=mlp,
                       save_frames=True)
    else:
        run_nvs_eval(dataset, params_np, config, eval_dir,
                     sil_thres=config["mapping"]["sil_thres"])


if __name__ == "__main__":
    main()
