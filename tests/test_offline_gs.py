"""Offline 3DGS trainer smoke test (gaussian_splatting.py machinery)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
@pytest.mark.gauntlet
def test_offline_splatting_synthetic(tmp_path):
    from gaussian_splatting import offline_splatting

    from splatam_tpu.slam.config import seed_everything

    seed_everything(0)
    config = dict(
        workdir=str(tmp_path),
        run_name="offline_box",
        seed=0,
        mean_sq_dist_method="projective",
        gaussian_distribution="anisotropic",
        eval_every=1,
        data=dict(
            dataset_name="synthetic",
            basedir="",
            sequence="box",
            desired_image_height_init=48,
            desired_image_width_init=64,
            desired_image_height=48,
            desired_image_width=64,
            start=0,
            end=-1,
            stride=1,
            num_frames=4,
            eval_stride=1,
            eval_num_frames=4,
        ),
        train=dict(
            num_iters_mapping=80,
            sil_thres=0.5,
            use_sil_for_loss=True,
            loss_weights=dict(im=0.5, depth=1.0),
            lrs_mapping=dict(
                means3D=0.00032,
                rgb_colors=0.0025,
                unnorm_rotations=0.001,
                logit_opacities=0.05,
                log_scales=0.005,
                cam_unnorm_rots=0.0,
                cam_trans=0.0,
            ),
            lrs_mapping_means3D_final=0.0000032,
            lr_delay_mult=0.01,
            use_gaussian_splatting_densification=True,
            densify_dict=dict(
                start_after=20,
                remove_big_after=40,
                stop_after=60,
                densify_every=20,
                grad_thresh=0.0002,
                num_to_split_into=2,
                removal_opacity_threshold=0.005,
                final_removal_opacity_threshold=0.005,
                reset_opacities=False,
                reset_opacities_every=3000,
            ),
        ),
        tpu=dict(capacity=1 << 13, pair_cap=1 << 15, tile_k_max=2048, backend="tiles"),
    )
    metrics = offline_splatting(config)
    assert metrics["psnr"] > 20.0, metrics
    out = os.path.join(str(tmp_path), "offline_box", "params.npz")
    assert os.path.exists(out)
    params = dict(np.load(out))
    assert params["log_scales"].shape[1] == 3  # anisotropic
