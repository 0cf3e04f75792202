"""Offline SLAM on a saved iPhone NeRFCapture dataset.
Values: reference configs/iphone/splatam.py / nerfcapture.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _template import make_config

scene_name = os.environ.get("SCENE", "capture")
base_dir = "experiments/iPhone_Captures"
full_res_width, full_res_height = 1920, 1440
downscale_factor = 2.0
densify_downscale_factor = 4.0

config = make_config(
    workdir=f"./{base_dir}/{scene_name}",
    run_name="SplaTAM_iPhone",
    map_every=1,
    keyframe_every=5,
    mapping_window_size=32,
    tracking_iters=60,
    mapping_iters=60,
    data=dict(
        dataset_name="nerfcapture",
        basedir=f"./{base_dir}",
        sequence=scene_name,
        desired_image_height=int(full_res_height // downscale_factor),
        desired_image_width=int(full_res_width // downscale_factor),
        densification_image_height=int(full_res_height // densify_downscale_factor),
        densification_image_width=int(full_res_width // densify_downscale_factor),
    ),
    tracking=dict(
        lrs=dict(cam_unnorm_rots=0.001, cam_trans=0.004),
    ),
)
