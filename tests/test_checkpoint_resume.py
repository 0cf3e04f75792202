"""Checkpoint save / resume parity (scripts/splatam.py:604-638,927-931)."""
import copy
import os

import numpy as np
import pytest

from tests.test_slam_pipeline import small_config
from splatam_tpu.slam.config import seed_everything


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    from splatam_tpu.slam.pipeline import rgbd_slam

    seed_everything(0)
    config = small_config(
        tmp_path,
        tracking={"use_gt_poses": True},
        save_checkpoints=True,
        checkpoint_interval=3,
    )
    metrics_full = rgbd_slam(copy.deepcopy(config))
    run_dir = os.path.join(config["workdir"], config["run_name"])
    assert os.path.exists(os.path.join(run_dir, "params3.npz"))
    assert os.path.exists(os.path.join(run_dir, "keyframe_time_indices3.npy"))

    # Resume from frame 3 and run to the end.
    seed_everything(0)
    resume_cfg = copy.deepcopy(config)
    resume_cfg["load_checkpoint"] = True
    resume_cfg["checkpoint_time_idx"] = 3
    metrics_resumed = rgbd_slam(resume_cfg)
    # Resumed run must complete and produce a comparable-quality map.
    assert metrics_resumed["psnr"] > metrics_full["psnr"] - 3.0
    assert np.isfinite(metrics_resumed["ate_rmse"])
