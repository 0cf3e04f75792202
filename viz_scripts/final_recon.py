"""Interactive final reconstruction viewer.

Usage parity: python viz_scripts/final_recon.py configs/<dataset>/splatam.py
(reference viz_scripts/final_recon.py). With Open3D installed this is the
interactive point-cloud viewer with camera frustums/trajectory; headless
(no Open3D) it renders an orbit around the final camera to
<run_dir>/viz_frames/.
"""
import argparse
import os
import sys

_BASE_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BASE_DIR)

import numpy as np  # noqa: E402

from splatam_tpu.render.api import RenderConfig  # noqa: E402
from splatam_tpu.slam.config import load_experiment_config  # noqa: E402
from splatam_tpu.viz.scene import (  # noqa: E402
    load_camera,
    load_scene_data,
    render_view,
    rgbd2pcd_np,
)

try:
    import open3d as o3d

    HAVE_O3D = True
except ImportError:
    HAVE_O3D = False


def make_lineset_data(all_w2cs, k, cfg):
    """Camera frustum + trajectory line segments (final_recon.py:194-223)."""
    frustum_pts, traj_pts = [], []
    scale = 0.05
    for w2c in all_w2cs:
        c2w = np.linalg.inv(w2c)
        corners = np.array(
            [
                [0, 0, 0],
                [-scale, -scale, scale * 2],
                [scale, -scale, scale * 2],
                [scale, scale, scale * 2],
                [-scale, scale, scale * 2],
            ]
        )
        frustum_pts.append(corners @ c2w[:3, :3].T + c2w[:3, 3])
        traj_pts.append(c2w[:3, 3])
    return np.stack(frustum_pts), np.stack(traj_pts)


def visualize_headless(scene_path, viz_cfg, rcfg, out_dir, n_views=24):
    gm, all_w2cs, _ = load_scene_data(scene_path)
    w2c0, k = load_camera(viz_cfg, scene_path)
    base = all_w2cs[-1] if len(all_w2cs) else w2c0
    os.makedirs(out_dir, exist_ok=True)
    import imageio.v2 as imageio

    for i in range(n_views):
        ang = 2 * np.pi * i / n_views * 0.1 - 0.05 * np.pi
        rot = np.eye(4)
        c, s = np.cos(ang), np.sin(ang)
        rot[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        view_w2c = rot @ base
        im, depth, _ = render_view(gm, view_w2c, k, viz_cfg, rcfg)
        imageio.imwrite(
            os.path.join(out_dir, f"view_{i:03d}.png"),
            (im.transpose(1, 2, 0) * 255).astype(np.uint8),
        )
    print(f"Headless viz: wrote {n_views} rendered views to {out_dir}")


def visualize_o3d(scene_path, viz_cfg, rcfg):
    gm, all_w2cs, _ = load_scene_data(scene_path)
    w2c, k = load_camera(viz_cfg, scene_path)
    view_scale = viz_cfg["view_scale"]
    w = int(viz_cfg["viz_w"] * view_scale)
    h = int(viz_cfg["viz_h"] * view_scale)

    if viz_cfg.get("offset_first_viz_cam", True):
        view_w2c = w2c.copy()
        view_w2c[:3, 3] += view_w2c[:3, :3].T @ np.array([0, 0, -0.5])
    else:
        view_w2c = w2c.copy()

    vis = o3d.visualization.Visualizer()
    vis.create_window(width=w, height=h, visible=True)

    im, depth, sil = render_view(gm, view_w2c, k, viz_cfg, rcfg)
    pts, cols = rgbd2pcd_np(im, depth, view_w2c, k, viz_cfg)
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(pts)
    pcd.colors = o3d.utility.Vector3dVector(cols)
    vis.add_geometry(pcd)

    if viz_cfg.get("visualize_cams", True) and len(all_w2cs):
        frustums, traj = make_lineset_data(all_w2cs, k, viz_cfg)
        for fr in frustums[:: max(1, len(frustums) // 100)]:
            ls = o3d.geometry.LineSet()
            ls.points = o3d.utility.Vector3dVector(fr)
            ls.lines = o3d.utility.Vector2iVector(
                np.array([[0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [2, 3], [3, 4], [4, 1]])
            )
            ls.colors = o3d.utility.Vector3dVector(np.tile([[0.2, 0.2, 0.8]], (8, 1)))
            vis.add_geometry(ls)

    view_control = vis.get_view_control()
    cparams = o3d.camera.PinholeCameraParameters()
    cparams.extrinsic = view_w2c
    cparams.intrinsic.intrinsic_matrix = k * view_scale
    cparams.intrinsic.height = h
    cparams.intrinsic.width = w
    view_control.convert_from_pinhole_camera_parameters(cparams, allow_arbitrary=True)

    # Interactive loop: re-render from the current viewpoint each tick.
    while True:
        cam_params = view_control.convert_to_pinhole_camera_parameters()
        cur_w2c = np.asarray(cam_params.extrinsic)
        cur_k = np.asarray(cam_params.intrinsic.intrinsic_matrix) / view_scale
        im, depth, sil = render_view(gm, cur_w2c, cur_k, viz_cfg, rcfg)
        if viz_cfg.get("show_sil", False):
            im = np.tile(sil[None], (3, 1, 1))
        pts, cols = rgbd2pcd_np(im, depth, cur_w2c, cur_k, viz_cfg)
        pcd.points = o3d.utility.Vector3dVector(pts)
        pcd.colors = o3d.utility.Vector3dVector(cols)
        vis.update_geometry(pcd)
        if not vis.poll_events():
            break
        vis.update_renderer()
    vis.destroy_window()


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
    if HAVE_O3D:
        visualize_o3d(scene_path, viz_cfg, rcfg)
    else:
        print("Open3D not available; rendering headless views instead.")
        visualize_headless(scene_path, viz_cfg, rcfg, os.path.join(run_dir, "viz_frames"))
