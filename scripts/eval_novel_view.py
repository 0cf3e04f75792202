"""Evaluate a saved params.npz on the train split or a held-out NVS split.

Usage parity: python scripts/eval_novel_view.py configs/<d>/eval_novel_view.py
(reference scripts/eval_novel_view.py).
"""
import argparse
import os
import shutil
import sys

_BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BASE_DIR)

import numpy as np  # noqa: E402

from splatam_tpu.data import get_dataset, load_dataset_config  # noqa: E402
from splatam_tpu.eval.evaluate import eval_nvs, eval_sequence  # noqa: E402
from splatam_tpu.render.api import RenderConfig  # noqa: E402
from splatam_tpu.slam.config import (  # noqa: E402
    backfill_defaults,
    load_experiment_config,
    seed_everything,
)

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str, help="Path to experiment file")
    args = parser.parse_args()

    config = backfill_defaults(load_experiment_config(args.experiment))
    seed_everything(seed=config["seed"])

    results_dir = os.path.join(config["workdir"], config["run_name"])
    os.makedirs(results_dir, exist_ok=True)
    shutil.copy(args.experiment, os.path.join(results_dir, "config.py"))

    dataset_config = config["data"]
    if "gradslam_data_cfg" not in dataset_config:
        gradslam_data_cfg = {"dataset_name": dataset_config["dataset_name"]}
    else:
        gradslam_data_cfg = load_dataset_config(dataset_config["gradslam_data_cfg"])
    dataset = get_dataset(
        config_dict=gradslam_data_cfg,
        basedir=dataset_config["basedir"],
        sequence=os.path.basename(str(dataset_config["sequence"])),
        start=dataset_config["start"],
        end=dataset_config["end"],
        stride=dataset_config["stride"],
        desired_height=dataset_config["desired_image_height"],
        desired_width=dataset_config["desired_image_width"],
        relative_pose=True,
        ignore_bad=dataset_config["ignore_bad"],
        use_train_split=dataset_config["use_train_split"],
    )
    num_frames = dataset_config["num_frames"]
    if num_frames == -1:
        num_frames = len(dataset)

    scene_path = config.get(
        "scene_path", os.path.join(results_dir, "params.npz")
    )
    params = dict(np.load(scene_path, allow_pickle=True))

    tpu = config["tpu"]
    rcfg = RenderConfig(
        backend=tpu["backend"], pair_cap=tpu["pair_cap"], tile_k_max=tpu["tile_k_max"]
    )
    common = dict(
        sil_thres=config["mapping"]["sil_thres"],
        mapping_iters=config["mapping"]["num_iters"],
        add_new_gaussians=config["mapping"]["add_new_gaussians"],
        eval_every=config["eval_every"],
        rcfg=rcfg,
    )
    if dataset_config["use_train_split"]:
        eval_dir = os.path.join(results_dir, "eval_train")
        eval_sequence(dataset, params, num_frames, eval_dir, **common)
    else:
        eval_dir = os.path.join(results_dir, "eval_nvs")
        eval_nvs(dataset, params, num_frames, eval_dir, **common)
