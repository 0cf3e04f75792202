"""Live online SLAM on a NeRFCapture iPhone stream.

Usage parity: python scripts/iphone_demo.py --config
configs/iphone/online_demo.py (reference scripts/iphone_demo.py:96-465):
each DDS frame is saved to disk (NeRFCapture dataset layout) and fed through
the same tracking / densification / keyframing / mapping phases as the
offline pipeline, incrementally.
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

_BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BASE_DIR)

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from splatam_tpu.data.base import relative_transformation_np  # noqa: E402
from splatam_tpu.io.params_io import save_params  # noqa: E402
from splatam_tpu.live.dds import make_reader  # noqa: E402
from splatam_tpu.slam.config import backfill_defaults, load_experiment_config, seed_everything  # noqa: E402
from splatam_tpu.slam.pipeline import SLAMRuntime, _frame_to_device  # noqa: E402

P_FLIP = np.array([[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], np.float64)


class _LiveDataset:
    """In-memory frame list with the dataset __getitem__ contract, appended
    to as DDS frames arrive (frame 0 must exist before SLAMRuntime init)."""

    def __init__(self, height, width):
        self.desired_height = height
        self.desired_width = width
        self.frames = []

    def append(self, color, depth, intrinsics, pose):
        self.frames.append((color, depth, intrinsics, pose))

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, idx):
        return self.frames[idx]


def _decode_frame(sample, desired_w, desired_h, downscale):
    image = np.asarray(sample.image, dtype=np.uint8).reshape(
        (sample.height, sample.width, 3)
    )
    depth = np.asarray(sample.depth_image, dtype=np.uint8).view(
        dtype=np.float32
    ).reshape((sample.depth_height, sample.depth_width))
    color = cv2.resize(image, (desired_w, desired_h), interpolation=cv2.INTER_LINEAR)
    depth = cv2.resize(depth, (desired_w, desired_h), interpolation=cv2.INTER_NEAREST)
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = sample.fl_x / downscale
    k[1, 1] = sample.fl_y / downscale
    k[0, 2] = sample.cx / downscale
    k[1, 2] = sample.cy / downscale
    pose = np.asarray(sample.transform_matrix, np.float32).reshape(4, 4).T
    pose = P_FLIP @ pose.astype(np.float64) @ P_FLIP.T
    return color.astype(np.float32), depth[..., None].astype(np.float32), k, pose


def live_slam(config: dict):
    config = backfill_defaults(config)
    data_cfg = config["data"]
    num_frames = data_cfg["num_frames"]
    desired_w = data_cfg["desired_image_width"]
    desired_h = data_cfg["desired_image_height"]
    downscale = data_cfg.get("downscale_factor", 1.0)

    _domain, reader = make_reader()
    save_path = Path(config["workdir"]) / config["run_name"]
    save_path.mkdir(parents=True, exist_ok=True)
    (save_path / "rgb").mkdir(exist_ok=True)
    (save_path / "depth").mkdir(exist_ok=True)
    manifest = {"frames": []}

    live_ds = _LiveDataset(desired_h, desired_w)
    rt = None
    first_pose = None
    time_idx = 0
    print("Waiting for frames...")
    while time_idx < num_frames:
        sample = reader.read_next()
        if not sample:
            continue
        if not sample.has_depth:
            print("No depth in frame; skipping (enable depth in NeRFCapture).")
            continue
        # Save raw frame to disk (dataset capture parity).
        image = np.asarray(sample.image, dtype=np.uint8).reshape(
            (sample.height, sample.width, 3)
        )
        cv2.imwrite(
            str(save_path / "rgb" / f"{time_idx}.png"),
            cv2.cvtColor(image, cv2.COLOR_RGB2BGR),
        )
        manifest["frames"].append(
            {
                "transform_matrix": np.asarray(sample.transform_matrix, np.float32)
                .reshape(4, 4).T.tolist(),
                "file_path": f"rgb/{time_idx}.png",
            }
        )

        color, depth, k, pose_abs = _decode_frame(sample, desired_w, desired_h, downscale)
        if first_pose is None:
            first_pose = pose_abs
        pose_rel = relative_transformation_np(first_pose, pose_abs).astype(np.float32)
        live_ds.append(color, depth, k, pose_rel)

        if rt is None:
            # SLAMRuntime initializes from live_ds[0].
            cfg = dict(config)
            cfg["data"] = dict(data_cfg)
            rt = SLAMRuntime.__new__(SLAMRuntime)
            _init_runtime_live(rt, cfg, live_ds)

        _step_frame(rt, config, live_ds, time_idx)
        time_idx += 1

    with open(save_path / "transforms.json", "w") as f:
        json.dump(manifest, f, indent=4)
    save_params(rt.export_params(), str(save_path))
    print(f"Live SLAM finished: {time_idx} frames, saved to {save_path}")


def _init_runtime_live(rt: SLAMRuntime, config, live_ds):
    """SLAMRuntime.__init__ minus the file-dataset construction."""
    import jax.numpy as jnp

    from splatam_tpu.core import gaussians as G
    from splatam_tpu.core.camera import setup_camera
    from splatam_tpu.render.api import RenderConfig
    from splatam_tpu.slam import steps
    from splatam_tpu.slam.pipeline import _phase_cfg, _prune_cfg

    rt.config = config
    rt.output_dir = os.path.join(config["workdir"], config["run_name"])
    rt.eval_dir = os.path.join(rt.output_dir, "eval")
    os.makedirs(rt.eval_dir, exist_ok=True)
    rt.dataset = live_ds
    rt.densify_dataset = None
    rt.tracking_dataset = None
    rt.num_frames = config["data"]["num_frames"]

    tpu = config["tpu"]
    rt.rcfg = RenderConfig(
        backend=tpu["backend"], pair_cap=tpu["pair_cap"], tile_k_max=tpu["tile_k_max"]
    )
    rt.pcfg_track = _phase_cfg(config["tracking"])
    rt.pcfg_map = _phase_cfg(config["mapping"])
    rt.prune_cfg = _prune_cfg(config["mapping"])
    rt.isotropic = config["gaussian_distribution"] == "isotropic"

    color_np, depth_np, intrinsics_np, pose_np = live_ds[0]
    rt.intrinsics = intrinsics_np[:3, :3]
    rt.first_frame_w2c = np.linalg.inv(pose_np)
    h, w = color_np.shape[0], color_np.shape[1]
    rt.cam = setup_camera(w, h, rt.intrinsics, None)
    rt.densify_intrinsics = rt.intrinsics
    rt.densify_cam = rt.cam
    rt.tracking_cam = rt.cam

    capacity = int(tpu["capacity"])
    init_c, init_d = _frame_to_device(color_np, depth_np)
    pts, cols, mean_sq, valid = steps.first_frame_pointcloud(init_c, init_d, rt.cam)
    while capacity < pts.shape[0]:
        capacity *= 2
    rt.gm = G.from_pointcloud(pts, cols, mean_sq, valid, capacity, rt.isotropic)
    rt.timestep = jnp.zeros((capacity,), jnp.float32)
    rt.scene_radius = jnp.float32(
        float(depth_np.max()) / config["scene_radius_depth_ratio"]
    )
    rt.cam_rots = np.tile(np.array([1, 0, 0, 0], np.float32), (rt.num_frames, 1))
    rt.cam_trans = np.zeros((rt.num_frames, 3), np.float32)
    kf_cap = rt.num_frames // max(config["keyframe_every"], 1) + 3
    rt.kf_colors = jnp.zeros((kf_cap, h, w, 3), jnp.uint8)
    rt.kf_depths = jnp.zeros((kf_cap, h, w), jnp.float32)
    rt.kf_scratch_slot = kf_cap - 1
    rt.keyframe_list = []
    rt.keyframe_time_indices = []
    rt.gt_w2c_all = []
    rt.stats = {k: 0.0 for k in (
        "tracking_iter_time_sum", "tracking_frame_time_sum",
        "mapping_iter_time_sum", "mapping_frame_time_sum")}
    rt.stats.update({k: 0 for k in (
        "tracking_iter_time_count", "tracking_frame_time_count",
        "mapping_iter_time_count", "mapping_frame_time_count")})


def _step_frame(rt: SLAMRuntime, config, live_ds, time_idx):
    color_np, depth_np, _, pose = live_ds[time_idx]
    rt.gt_w2c_all.append(np.linalg.inv(pose))
    color, depth = _frame_to_device(color_np, depth_np)
    rt.compact()
    if time_idx > 0:
        if time_idx > 1 and config["tracking"]["forward_prop"]:
            p1 = rt.cam_rots[time_idx - 1] / np.linalg.norm(rt.cam_rots[time_idx - 1])
            p2 = rt.cam_rots[time_idx - 2] / np.linalg.norm(rt.cam_rots[time_idx - 2])
            nr = p1 + (p1 - p2)
            rt.cam_rots[time_idx] = nr / np.linalg.norm(nr)
            rt.cam_trans[time_idx] = rt.cam_trans[time_idx - 1] + (
                rt.cam_trans[time_idx - 1] - rt.cam_trans[time_idx - 2]
            )
        else:
            rt.cam_rots[time_idx] = rt.cam_rots[time_idx - 1]
            rt.cam_trans[time_idx] = rt.cam_trans[time_idx - 1]
        t0 = time.time()
        rt.track_frame(time_idx, color, depth)
        print(f"frame {time_idx}: tracking {time.time() - t0:.2f}s")
    if time_idx == 0 or (time_idx + 1) % config["map_every"] == 0:
        if config["mapping"]["add_new_gaussians"] and time_idx > 0:
            rt.densify_frame(time_idx, color, depth)
        selected = rt.select_keyframes(time_idx, depth_np)
        rt._stage_keyframe(rt.kf_scratch_slot, color_np, depth_np)
        t0 = time.time()
        rt.map_frame(time_idx, selected)
        print(f"frame {time_idx}: mapping {time.time() - t0:.2f}s "
              f"(n_gauss={int(rt.gm.num_active())})")
    if (time_idx == 0) or ((time_idx + 1) % config["keyframe_every"] == 0):
        slot = len(rt.keyframe_list)
        if slot < rt.kf_scratch_slot:
            rt._stage_keyframe(slot, color_np, depth_np)
            rt.keyframe_list.append(
                {"id": time_idx, "slot": slot,
                 "q": rt.cam_rots[time_idx].copy(), "t": rt.cam_trans[time_idx].copy()}
            )
            rt.keyframe_time_indices.append(time_idx)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="./configs/iphone/online_demo.py", type=str)
    args = parser.parse_args()
    config = load_experiment_config(args.config)
    seed_everything(seed=config.get("seed", 0))
    live_slam(config)
