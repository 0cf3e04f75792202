"""TUM-RGBD online SLAM. Values: reference configs/tum/splatam.py
(200 track iters, window 20, 30 map iters, cam lrs 0.002/0.002,
scene_radius_depth_ratio=2)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _template import make_config

scenes = [
    "freiburg1_desk",
    "freiburg1_desk2",
    "freiburg1_room",
    "freiburg2_xyz",
    "freiburg3_long_office_household",
]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]

config = make_config(
    workdir="./experiments/TUM",
    run_name=f"{scene_name}_seed{seed}",
    seed=seed,
    map_every=1,
    keyframe_every=5,
    mapping_window_size=20,
    tracking_iters=200,
    mapping_iters=30,
    eval_every=500,
    scene_radius_depth_ratio=2,
    data=dict(
        basedir="./data/TUM_RGBD",
        gradslam_data_cfg=f"./configs/data/TUM/{scene_name}.yaml",
        sequence=f"rgbd_dataset_{scene_name}",
        desired_image_height=480,
        desired_image_width=640,
    ),
    tracking=dict(
        lrs=dict(cam_unnorm_rots=0.002, cam_trans=0.002),
    ),
)
