"""Replica online SLAM. Values: reference configs/replica/splatam.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _template import make_config

scenes = ["room0", "room1", "room2", "office0", "office1", "office2", "office3", "office4"]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]

config = make_config(
    workdir="./experiments/Replica",
    run_name=f"{scene_name}_{seed}",
    seed=seed,
    map_every=1,
    keyframe_every=5,
    mapping_window_size=24,
    tracking_iters=40,
    mapping_iters=60,
    eval_every=5,
    data=dict(
        basedir="./data/Replica",
        gradslam_data_cfg="./configs/data/replica.yaml",
        sequence=scene_name,
        desired_image_height=680,
        desired_image_width=1200,
    ),
)
