"""NeRFCapture dataset capture (no SLAM).
Values: reference configs/iphone/dataset.py."""
scene_name = "capture"
base_dir = "experiments/iPhone_Captures"

config = dict(
    workdir=f"./{base_dir}",
    run_name=scene_name,
    overwrite=False,
    depth_scale=10.0,
    num_frames=10,
)
