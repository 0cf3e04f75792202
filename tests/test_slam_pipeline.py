"""End-to-end SLAM integration tests on the synthetic box-room sequence."""
import copy
import os

import numpy as np
import pytest

from splatam_tpu.slam.config import load_experiment_config, seed_everything

CONFIG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "synthetic", "splatam.py")


def small_config(tmp_path, **overrides):
    config = copy.deepcopy(load_experiment_config(CONFIG_PATH))
    config["workdir"] = str(tmp_path)
    config["data"]["desired_image_height"] = 48
    config["data"]["desired_image_width"] = 64
    config["data"]["num_frames"] = 6
    config["tracking"]["num_iters"] = 8
    # 16 mapping iters: the synthetic scene's high-frequency texture octave
    # needs a few more steps than the old smooth-only texture to clear the
    # PSNR floors at 48x64 (tight quality gating lives in scripts/gauntlet.py).
    config["mapping"]["num_iters"] = 16
    config["mapping_window_size"] = 5
    config["keyframe_every"] = 2
    config["tpu"] = dict(capacity=1 << 13, pair_cap=1 << 15, tile_k_max=2048, backend="tiles")
    for k, v in overrides.items():
        if isinstance(v, dict):
            config[k].update(v)
        else:
            config[k] = v
    return config


def test_slam_micro_e2e_default(tmp_path):
    """UNMARKED fast end-to-end: plain `pytest` must exercise the full
    track -> densify -> map -> eval -> save loop, not just components
    (the reference's only self-validation is "the SLAM loop runs",
    scripts/splatam.py:643-986 / SURVEY.md section 4). Kept under a minute
    by tiny shapes + the persistent compile cache; the tight quality gates
    live in scripts/gauntlet.py."""
    from splatam_tpu.slam.pipeline import rgbd_slam

    seed_everything(0)
    config = small_config(tmp_path)
    config["data"]["num_frames"] = 5
    config["tracking"]["num_iters"] = 6
    config["mapping"]["num_iters"] = 10
    config["run_name"] = "micro_e2e"
    metrics = rgbd_slam(config)
    # Finite losses + sane trajectory on the gentle synthetic motion.
    assert np.isfinite(metrics["psnr"]) and metrics["psnr"] > 15.0, metrics
    assert np.isfinite(metrics["depth_l1"]), metrics
    assert metrics["ate_rmse"] < 0.06, metrics
    out = os.path.join(config["workdir"], config["run_name"], "params.npz")
    assert os.path.exists(out)
    params = dict(np.load(out))
    for key in [
        "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
        "log_scales", "cam_unnorm_rots", "cam_trans", "timestep",
        "intrinsics", "w2c", "gt_w2c_all_frames", "keyframe_time_indices",
    ]:
        assert key in params, key
    assert params["means3D"].shape[0] == params["timestep"].shape[0]
    # Eval artifacts (eval_sequence writes psnr txt + plots dir).
    eval_dir = os.path.join(config["workdir"], config["run_name"], "eval")
    assert os.path.isdir(eval_dir) and len(os.listdir(eval_dir)) > 0


@pytest.mark.slow
def test_slam_gt_poses(tmp_path):
    """Mapping-only run with ground-truth poses must reconstruct the scene."""
    from splatam_tpu.slam.pipeline import rgbd_slam

    seed_everything(0)
    config = small_config(tmp_path, tracking={"use_gt_poses": True})
    metrics = rgbd_slam(config)
    assert metrics["psnr"] > 25.0, metrics
    assert metrics["depth_l1"] < 0.08, metrics
    assert metrics["ate_rmse"] < 1e-5, metrics  # gt poses written verbatim
    # params.npz artifact must exist with the reference schema
    out = os.path.join(config["workdir"], config["run_name"], "params.npz")
    assert os.path.exists(out)
    params = dict(np.load(out))
    for key in [
        "means3D", "rgb_colors", "unnorm_rotations", "logit_opacities",
        "log_scales", "cam_unnorm_rots", "cam_trans", "timestep",
        "intrinsics", "w2c", "gt_w2c_all_frames", "keyframe_time_indices",
    ]:
        assert key in params, key
    assert params["means3D"].shape[0] == params["timestep"].shape[0]


@pytest.mark.slow
def test_slam_full_tracking(tmp_path):
    """Full tracking+mapping: trajectory error should stay small on the
    gentle synthetic motion."""
    from splatam_tpu.slam.pipeline import rgbd_slam

    seed_everything(0)
    config = small_config(
        tmp_path,
        # Ride-along coverage: the tracking-loss panel (headless Agg path)
        # and the J-slot direct pair expansion, both through the full loop.
        tracking={"visualize_tracking_loss": True},
        tpu={"direct_j": 2},
    )
    metrics = rgbd_slam(config)
    assert metrics["psnr"] > 18.0, metrics
    assert metrics["ate_rmse"] < 0.05, metrics  # < 5 cm on a ~1 m trajectory
    viz_dir = os.path.join(
        config["workdir"], config["run_name"], "tracking_loss_viz"
    )
    assert len(os.listdir(viz_dir)) >= 5  # one panel per tracked frame


@pytest.mark.slow
def test_slam_with_online_3dgs_densification(tmp_path):
    """Mapping with use_gaussian_splatting_densification=True (chunked
    clone/split inside the per-frame mapping loop)."""
    from splatam_tpu.slam.pipeline import rgbd_slam

    seed_everything(0)
    config = small_config(tmp_path, tracking={"use_gt_poses": True})
    config["mapping"]["use_gaussian_splatting_densification"] = True
    config["mapping"]["densify_dict"] = dict(
        start_after=2,
        remove_big_after=4,
        stop_after=8,
        densify_every=2,
        grad_thresh=0.01,  # scaled for the tiny test image (grad ~ 1/(3H))
        num_to_split_into=2,
        removal_opacity_threshold=0.005,
        final_removal_opacity_threshold=0.005,
        reset_opacities=False,
        reset_opacities_every=500,
    )
    config["data"]["num_frames"] = 4
    metrics = rgbd_slam(config)
    assert metrics["psnr"] > 18.0, metrics
    assert np.isfinite(metrics["depth_l1"])
