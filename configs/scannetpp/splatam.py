"""ScanNet++ online SLAM. Values: reference configs/scannetpp/splatam.py
(200 track iters w/ depth-loss-threshold doubling, window 24, 60 map iters,
584x876, eval_every=1)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _template import make_config

scenes = ["8b5caf3398", "b20a261fdf"]

# Train-split eval by default; set USE_TRAIN_SPLIT=0 for NVS.
use_train_split = os.environ.get("USE_TRAIN_SPLIT", "1") == "1"
scene_num = int(os.environ.get("SCENE", 0))
scene_name = scenes[scene_num]
num_frames = ([-1, 360] if use_train_split else [-1, -1])[scene_num]
seed = int(os.environ.get("SEED", 0))

config = make_config(
    workdir="./experiments/ScanNetPP",
    run_name=f"{scene_name}_seed{seed}",
    seed=seed,
    map_every=1,
    keyframe_every=5,
    mapping_window_size=24,
    tracking_iters=200,
    mapping_iters=60,
    eval_every=1,
    report_global_progress_every=5,
    checkpoint_interval=5,
    data=dict(
        dataset_name="scannetpp",
        basedir="./data/ScanNet++/data",
        sequence=scene_name,
        ignore_bad=False,
        use_train_split=use_train_split,
        desired_image_height=584,
        desired_image_width=876,
        num_frames=num_frames,
    ),
    tracking=dict(
        use_depth_loss_thres=True,
        depth_loss_thres=20000,
        lrs=dict(cam_unnorm_rots=0.001, cam_trans=0.004),
    ),
)
