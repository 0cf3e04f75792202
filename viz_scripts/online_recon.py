"""Online reconstruction replay: animate the map growing over time.

Usage parity: python viz_scripts/online_recon.py configs/<d>/splatam.py
(reference viz_scripts/online_recon.py): Gaussians are filtered by their
creation timestep (params['timestep'], saved at scripts/splatam.py:974) and
the estimated camera frustum replays the trajectory at viz_fps. Headless
mode writes the replay frames to disk.
"""
import argparse
import os
import sys
import time

_BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BASE_DIR)

import numpy as np  # noqa: E402

from splatam_tpu.core.gaussians import from_params_dict  # noqa: E402
from splatam_tpu.render.api import RenderConfig  # noqa: E402
from splatam_tpu.slam.config import load_experiment_config  # noqa: E402
from splatam_tpu.viz.scene import load_camera, load_scene_data, render_view  # noqa: E402

try:
    import open3d as o3d  # noqa: F401

    HAVE_O3D = True
except ImportError:
    HAVE_O3D = False


def device_map_and_timesteps(params):
    """Upload the FULL final map once and return (gm, timestep_dev).

    Replay then masks by creation time on-device (gm.active) instead of
    re-uploading a per-timestep sub-map: one upload + one compile for the
    whole replay, where per-step host gathers + uploads both recompiled
    every step AND pushed the map through the (slow) host link each frame."""
    import jax.numpy as jnp

    gm = from_params_dict(params)
    ts = np.zeros((gm.capacity,), np.float32)
    n = np.asarray(params["timestep"]).shape[0]
    ts[:n] = np.asarray(params["timestep"], np.float32)
    ts[n:] = np.inf  # pad slots never activate
    return gm, jnp.asarray(ts)


def replay(scene_path, viz_cfg, rcfg, out_dir=None):
    _, all_w2cs, params = load_scene_data(scene_path)
    w2c0, k = load_camera(viz_cfg, scene_path)
    num_t = len(all_w2cs)
    fps = viz_cfg.get("viz_fps", 5)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        import imageio.v2 as imageio

    # Fixed external view: first camera offset back along the view axis.
    view_w2c = w2c0.copy()
    view_w2c[:3, 3] += view_w2c[:3, :3].T @ np.array([0, 0, -0.5])

    gm_full, ts_dev = device_map_and_timesteps(params)
    stride = max(1, num_t // 200) if out_dir else 1
    for t in range(0, num_t, stride):
        gm_t = gm_full._replace(active=gm_full.active & (ts_dev <= t))
        im, depth, sil = render_view(gm_t, all_w2cs[t], k, viz_cfg, rcfg)
        if out_dir:
            imageio.imwrite(
                os.path.join(out_dir, f"replay_{t:04d}.png"),
                (im.transpose(1, 2, 0) * 255).astype(np.uint8),
            )
        else:
            time.sleep(1.0 / fps)
    if out_dir:
        print(f"Headless online replay written to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment", type=str, help="Path to experiment file")
    args = parser.parse_args()
    config = load_experiment_config(args.experiment)
    run_dir = os.path.join(config["workdir"], config["run_name"])
    scene_path = os.path.join(run_dir, "params.npz")
    viz_cfg = config["viz"]
    tpu = config.get("tpu", {})
    rcfg = RenderConfig(
        backend=tpu.get("backend", "auto"),
        pair_cap=tpu.get("pair_cap", 1 << 20),
        tile_k_max=tpu.get("tile_k_max", 2048),
    )
    out_dir = None if HAVE_O3D else os.path.join(run_dir, "online_replay")
    replay(scene_path, viz_cfg, rcfg, out_dir=out_dir)
