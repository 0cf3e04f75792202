"""Replica-V2 novel-view-synthesis evaluation (test split).
Values: reference configs/replica_v2/eval_novel_view.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _template import make_config

scenes = ["room_0", "room_1", "room_2", "office_0", "office_1", "office_2", "office_3", "office_4"]

seed = int(os.environ.get("SEED", 0))
scene_name = scenes[int(os.environ.get("SCENE_NUM", 0))]

config = make_config(
    workdir="./experiments/ReplicaV2",
    run_name=f"{scene_name}_{seed}",
    seed=seed,
    mapping_window_size=24,
    tracking_iters=40,
    mapping_iters=60,
    eval_every=5,
    data=dict(
        basedir="./data/Replica_V2",
        gradslam_data_cfg="./configs/data/replica_v2.yaml",
        sequence=scene_name,
        use_train_split=False,
        desired_image_height=680,
        desired_image_width=1200,
    ),
)
