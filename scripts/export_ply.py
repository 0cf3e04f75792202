"""Export the final params.npz map to a .ply splat.

Usage parity: python scripts/export_ply.py configs/<dataset>/splatam.py
(reference scripts/export_ply.py:47-71).
"""
import argparse
import os
import sys

_BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BASE_DIR)

import numpy as np  # noqa: E402

from splatam_tpu.io.ply import save_ply  # noqa: E402
from splatam_tpu.slam.config import load_experiment_config  # noqa: E402

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str, help="Path to config file.")
    args = parser.parse_args()

    config = load_experiment_config(args.config)
    run_dir = os.path.join(config["workdir"], config["run_name"])
    params = dict(np.load(os.path.join(run_dir, "params.npz"), allow_pickle=True))

    save_ply(
        os.path.join(run_dir, "splat.ply"),
        params["means3D"],
        params["log_scales"],
        params["unnorm_rotations"],
        params["rgb_colors"],
        params["logit_opacities"],
    )
