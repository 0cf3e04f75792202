"""ScanNet online SLAM. Values: reference configs/scannet/splatam.py
(100 track iters, window 10, 30 map iters)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _template import make_config

scenes = [
    "scene0000_00", "scene0059_00", "scene0106_00",
    "scene0169_00", "scene0181_00", "scene0207_00",
]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]

config = make_config(
    workdir="./experiments/ScanNet",
    run_name=f"{scene_name}_seed{seed}",
    seed=seed,
    map_every=1,
    keyframe_every=5,
    mapping_window_size=10,
    tracking_iters=100,
    mapping_iters=30,
    eval_every=500,
    data=dict(
        basedir="./data/scannet",
        gradslam_data_cfg="./configs/data/scannet.yaml",
        sequence=scene_name,
        desired_image_height=480,
        desired_image_width=640,
    ),
)
