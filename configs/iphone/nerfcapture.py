"""Offline SLAM on a dataset captured earlier via nerfcapture2dataset.
Values: reference configs/iphone/nerfcapture.py (== online_demo.py with
scene 'offline_demo', overwrite=False, no downscale keys in data)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _template import make_config

scene_name = "offline_demo"
base_dir = "experiments/iPhone_Captures"
num_frames = 10  # desired number of frames to capture
depth_scale = 10.0
overwrite = False
full_res_width, full_res_height = 1920, 1440
downscale_factor = 2.0
densify_downscale_factor = 4.0

keyframe_every = int(num_frames // 5) if num_frames < 25 else 5

config = make_config(
    workdir=f"./{base_dir}/{scene_name}",
    run_name="SplaTAM_iPhone",
    map_every=1,
    keyframe_every=keyframe_every,
    mapping_window_size=32,
    tracking_iters=60,
    mapping_iters=60,
    eval_every=1,
    report_global_progress_every=100,
    data=dict(
        dataset_name="nerfcapture",
        basedir=f"./{base_dir}",
        sequence=scene_name,
        desired_image_height=int(full_res_height // downscale_factor),
        desired_image_width=int(full_res_width // downscale_factor),
        densification_image_height=int(full_res_height // densify_downscale_factor),
        densification_image_width=int(full_res_width // densify_downscale_factor),
        num_frames=num_frames,
    ),
    tracking=dict(
        use_depth_loss_thres=True,
        depth_loss_thres=20000,
        lrs=dict(cam_unnorm_rots=0.001, cam_trans=0.004),
    ),
)
config["overwrite"] = overwrite
config["depth_scale"] = depth_scale
config["num_frames"] = num_frames
config["checkpoint_time_idx"] = 130
