"""Shared visualization helpers: params.npz loading + view rendering.

Parity: viz_scripts/final_recon.py:25-169 (load_camera / load_scene_data /
render / rgbd2pcd). Rendering goes through the fused JAX renderer; Open3D
(when installed) provides the interactive viewer, otherwise the viz scripts
fall back to writing rendered frames to disk.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from splatam_tpu.core.camera import setup_camera
from splatam_tpu.core.gaussians import from_params_dict
from splatam_tpu.core.transforms import build_rotation
from splatam_tpu.eval.evaluate import render_at_w2c
from splatam_tpu.render.api import RenderConfig


def load_camera(cfg: dict, scene_path: str):
    params = dict(np.load(scene_path, allow_pickle=True))
    org_width = params["org_width"]
    org_height = params["org_height"]
    w2c = np.asarray(params["w2c"], np.float64)
    k = np.asarray(params["intrinsics"], np.float64)[:3, :3].copy()
    k[0, :] *= cfg["viz_w"] / org_width
    k[1, :] *= cfg["viz_h"] / org_height
    return w2c, k


def load_scene_data(scene_path: str):
    """Returns (GaussianMap, per-frame est w2c list [F,4,4], params dict)."""
    params = dict(np.load(scene_path, allow_pickle=True))
    gm = from_params_dict(params)
    cam_rots = np.asarray(params["cam_unnorm_rots"])[0]  # [4, F]
    cam_trans = np.asarray(params["cam_trans"])[0]  # [3, F]
    all_w2cs = []
    for t_i in range(cam_rots.shape[-1]):
        q = cam_rots[:, t_i]
        q = q / np.linalg.norm(q)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.asarray(build_rotation(jnp.asarray(q)[None]))[0]
        w2c[:3, 3] = cam_trans[:, t_i]
        all_w2cs.append(w2c)
    return gm, all_w2cs, params


def render_view(gm, w2c, k, cfg, rcfg: RenderConfig = RenderConfig(), white_bg=True):
    """Render (im [3,H,W], depth [H,W], sil [H,W]) at an arbitrary view.

    The reference renders RGB against a white background for viz
    (final_recon.py:110-122); since silhouette == 1 - T_final, the
    background composites post-hoc as im + (1-sil)*bg.
    """
    cam = setup_camera(cfg["viz_w"], cfg["viz_h"], k, None,
                       cfg.get("viz_near", 0.01), cfg.get("viz_far", 100.0))
    out = render_at_w2c(gm, np.asarray(w2c, np.float32), cam, rcfg)
    im = np.asarray(out.im)
    sil = np.asarray(out.silhouette)
    if white_bg:
        im = im + (1.0 - sil)[None]
    return np.clip(im, 0, 1), np.asarray(out.depth), sil


def rgbd2pcd_np(color, depth, w2c, k, cfg):
    """Backproject a rendered RGB-D view to a colored point cloud (numpy).

    Parity: final_recon.py:130-169 (incl. depth-colormap render mode)."""
    height, width = depth.shape
    xx, yy = np.meshgrid(np.arange(width), np.arange(height))
    xx = (xx - k[0][2]) / k[0][0]
    yy = (yy - k[1][2]) / k[1][1]
    z = depth.reshape(-1)
    pts_cam = np.stack([xx.reshape(-1) * z, yy.reshape(-1) * z, z], axis=-1)
    c2w = np.linalg.inv(w2c)
    pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]

    if cfg.get("render_mode") == "depth":
        import matplotlib.pyplot as plt

        cols = z.copy()
        bg_mask = (cols < 15).astype(np.float64)
        cols = cols * bg_mask
        cnorm = plt.Normalize(vmin=0, vmax=cols.max() if cols.max() > 0 else 1)
        cols = plt.cm.ScalarMappable(norm=cnorm, cmap=plt.get_cmap("jet")).to_rgba(cols)[:, :3]
        cols = cols * bg_mask[:, None] + (1 - bg_mask[:, None]) * 1.0
    else:
        cols = color.transpose(1, 2, 0).reshape(-1, 3)
    return pts, cols
