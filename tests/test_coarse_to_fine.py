"""Coarse-to-fine tracking (TPU-native extension, config-gated).

The coarse camera must be geometrically consistent with a stride-f
subsample of the full image: a splat center at full-res pixel u lands at
coarse pixel u/f (half-pixel convention included), so the coarse level's
pose optimum is the full-res optimum and the warm start is unbiased.
"""
import copy
import os

import numpy as np
import jax.numpy as jnp
import pytest

from splatam_tpu.core.camera import Camera
from splatam_tpu.render.projection import project
from splatam_tpu.slam.pipeline import _downscale_camera


def _project_xy(cam, pts):
    n = pts.shape[0]
    proj, _ = project(
        jnp.asarray(pts),
        jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
        jnp.zeros((n,), jnp.float32),
        jnp.full((n, 3), 0.05, jnp.float32),
        jnp.ones((n,), bool),
        jnp.eye(4, dtype=jnp.float32),
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )
    return np.asarray(proj.xy)


@pytest.mark.parametrize("factor", [2, 4])
def test_downscale_camera_center_mapping(factor):
    cam = Camera(height=120, width=160, fx=140.0, fy=140.0, cx=81.3, cy=59.2)
    cam_c = _downscale_camera(cam, factor)
    assert cam_c.height == -(-cam.height // factor)
    assert cam_c.width == -(-cam.width // factor)

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-0.5, 0.5, 32), rng.uniform(-0.4, 0.4, 32),
         rng.uniform(1.0, 4.0, 32)], -1
    ).astype(np.float32)
    xy_full = _project_xy(cam, pts)
    xy_coarse = _project_xy(cam_c, pts)
    # Full pixel u maps to coarse pixel u / f (stride-f subsample).
    np.testing.assert_allclose(xy_coarse, xy_full / factor, atol=1e-4)


@pytest.mark.slow
@pytest.mark.gauntlet
def test_slam_tracking_coarse_to_fine(tmp_path):
    """Full tracking+mapping with C2F enabled: must run end-to-end and keep
    trajectory error within the standard bound (quality gating at scale
    lives in scripts/gauntlet.py)."""
    from splatam_tpu.slam.config import load_experiment_config, seed_everything
    from splatam_tpu.slam.pipeline import rgbd_slam

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "configs", "synthetic", "splatam.py"
    )
    config = copy.deepcopy(load_experiment_config(cfg_path))
    config["workdir"] = str(tmp_path)
    config["data"]["desired_image_height"] = 48
    config["data"]["desired_image_width"] = 64
    config["data"]["num_frames"] = 6
    config["tracking"]["num_iters"] = 12
    config["tracking"]["coarse_to_fine"] = dict(
        enabled=True, levels=[[2, 4]]
    )
    config["mapping"]["num_iters"] = 16
    config["mapping_window_size"] = 5
    config["keyframe_every"] = 2
    config["tpu"] = dict(
        capacity=1 << 13, pair_cap=1 << 15, tile_k_max=2048, backend="tiles"
    )
    seed_everything(0)
    metrics = rgbd_slam(config)
    assert metrics["psnr"] > 18.0, metrics
    assert metrics["ate_rmse"] < 0.05, metrics


@pytest.mark.parametrize("factor", [2, 4])
def test_downscale_camera_pool_center_mapping(factor):
    """Pooled convention: coarse pixel i is the MEAN of full pixels
    [i*f, (i+1)*f), centered at i*f + (f-1)/2, so a splat at full pixel u
    lands at coarse pixel (u - (f-1)/2) / f."""
    cam = Camera(height=120, width=160, fx=140.0, fy=140.0, cx=81.3, cy=59.2)
    cam_c = _downscale_camera(cam, factor, pool=True)
    assert cam_c.height == cam.height // factor
    assert cam_c.width == cam.width // factor

    rng = np.random.default_rng(1)
    pts = np.stack(
        [rng.uniform(-0.5, 0.5, 32), rng.uniform(-0.4, 0.4, 32),
         rng.uniform(1.0, 4.0, 32)], -1
    ).astype(np.float32)
    xy_full = _project_xy(cam, pts)
    xy_coarse = _project_xy(cam_c, pts)
    half = (factor - 1) / 2.0
    np.testing.assert_allclose(xy_coarse, (xy_full - half) / factor, atol=1e-4)


def test_pool_target_mask_aware():
    from splatam_tpu.slam.pipeline import _pool_target

    color = jnp.arange(3 * 8 * 8, dtype=jnp.float32).reshape(3, 8, 8) / 100.0
    depth = jnp.ones((8, 8), jnp.float32) * 2.0
    depth = depth.at[0, 0].set(0.0)  # hole in the top-left 2x2 block
    depth = depth.at[2:4, 2:4].set(0.0)  # fully-invalid block
    c, d = _pool_target(color, depth, 2)
    assert c.shape == (3, 4, 4) and d.shape == (4, 4)
    # plain block mean for color
    np.testing.assert_allclose(
        np.asarray(c[0, 0, 0]),
        np.asarray(color[0, :2, :2]).mean(), rtol=1e-6)
    # hole block: mean over the 3 valid pixels only
    np.testing.assert_allclose(float(d[0, 0]), 2.0, rtol=1e-6)
    # fully-invalid block stays 0 (masked out of the loss)
    assert float(d[1, 1]) == 0.0
    np.testing.assert_allclose(float(d[3, 3]), 2.0, rtol=1e-6)
