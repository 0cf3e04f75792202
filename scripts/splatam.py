"""Main SLAM entry point.

Usage parity with the reference (scripts/splatam.py:992-1014):
    python scripts/splatam.py configs/replica/splatam.py
"""
import argparse
import os
import shutil
import sys

_BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BASE_DIR)

from splatam_tpu.slam.config import load_experiment_config, seed_everything  # noqa: E402
from splatam_tpu.slam.pipeline import rgbd_slam  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str, help="Path to experiment file")
    args = parser.parse_args()

    config = load_experiment_config(args.experiment)
    seed_everything(seed=config["seed"])

    results_dir = os.path.join(config["workdir"], config["run_name"])
    if not config.get("load_checkpoint", False):
        os.makedirs(results_dir, exist_ok=True)
        shutil.copy(args.experiment, os.path.join(results_dir, "config.py"))

    rgbd_slam(config)
