"""Eval path smoke tests: NVS eval, online eval, PLY export script path."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from splatam_tpu.core import gaussians as G
from splatam_tpu.core.camera import setup_camera
from splatam_tpu.data.synthetic import SyntheticDataset
from splatam_tpu.render.api import RenderConfig
from splatam_tpu.slam import steps

RCFG = RenderConfig(backend="tiles", pair_cap=1 << 15, tile_k_max=2048)


def _gt_map_params(ds, num_frames):
    """Build a params dict from frame-0 backprojection + gt poses."""
    color_np, depth_np, intr, pose0 = ds[0]
    cam = setup_camera(color_np.shape[1], color_np.shape[0], intr[:3, :3], None)
    color = jnp.asarray(color_np.transpose(2, 0, 1) / 255.0, jnp.float32)
    depth = jnp.asarray(depth_np[..., 0], jnp.float32)
    pts, cols, mean_sq, valid = steps.first_frame_pointcloud(color, depth, cam)
    gm = G.from_pointcloud(pts, cols, mean_sq, valid, 1 << 13, True)
    # near-opaque so silhouette saturates
    gm = gm._replace(
        logit_opacities=jnp.where(gm.active, 6.0, gm.logit_opacities)
    )
    params = G.compact_to_numpy(gm)
    qs, ts = [], []
    from splatam_tpu.slam.pipeline import _quat_from_w2c

    for i in range(num_frames):
        _, _, _, pose = ds[i]
        w2c = np.linalg.inv(pose)
        qs.append(_quat_from_w2c(w2c))
        ts.append(w2c[:3, 3])
    params["cam_unnorm_rots"] = np.stack(qs).T[None]
    params["cam_trans"] = np.stack(ts).T[None]
    params["timestep"] = np.zeros(params["means3D"].shape[0], np.float32)
    return params


def test_eval_nvs_smoke(tmp_path):
    from splatam_tpu.eval.evaluate import eval_nvs

    ds = SyntheticDataset(num_frames=4, height=48, width=64, motion_scale=0.3)
    params = _gt_map_params(ds, 4)
    metrics = eval_nvs(
        ds, params, 4, str(tmp_path / "nvs"), sil_thres=0.5,
        mapping_iters=10, add_new_gaussians=True, eval_every=1, rcfg=RCFG,
        save_plots=False,
    )
    assert np.isfinite(metrics["psnr"])
    assert metrics["psnr"] > 12  # frame-0 map rendered at nearby novel views
    assert os.path.exists(tmp_path / "nvs" / "valid_nvs_frames.npy")


def test_eval_online_smoke(tmp_path):
    from splatam_tpu.eval.evaluate import eval_online

    ds = SyntheticDataset(num_frames=3, height=48, width=64, motion_scale=0.2)
    params = _gt_map_params(ds, 3)
    all_params = [params] * 3
    metrics = eval_online(
        ds, all_params, 3, str(tmp_path / "online"), sil_thres=0.5,
        mapping_iters=10, add_new_gaussians=True, eval_every=1, rcfg=RCFG,
    )
    assert np.isfinite(metrics["psnr"])
    assert os.path.exists(tmp_path / "online" / "online_psnr.txt")


def test_lpips_synthesized_fallback():
    """LPIPS falls back to deterministic synthesized weights: finite, zero
    on identity, monotone in noise amplitude, and reproducible across
    loader calls (VERDICT r1 item 6)."""
    from splatam_tpu.eval.lpips_jax import lpips_fn

    f = lpips_fn()
    assert f is not None and f.synthetic
    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.uniform(0, 1, (3, 48, 64)).astype(np.float32))
    assert float(f(a, a)) == 0.0
    small = jnp.clip(a + jnp.asarray(rng.normal(0, 0.05, a.shape).astype(np.float32)), 0, 1)
    large = jnp.clip(a + jnp.asarray(rng.normal(0, 0.3, a.shape).astype(np.float32)), 0, 1)
    v_small, v_large = float(f(a, small)), float(f(a, large))
    assert np.isfinite(v_small) and np.isfinite(v_large)
    assert 0 < v_small < v_large
    # Deterministic: a second loader instance gives bit-identical values.
    f2 = lpips_fn()
    assert float(f2(a, large)) == v_large


def test_lpips_pretrained_npz_roundtrip(tmp_path):
    """An explicit weights npz (the export-script schema) loads and is
    flagged non-synthetic."""
    from splatam_tpu.eval.lpips_jax import lpips_fn, synthesize_weights

    w = synthesize_weights(seed=5)
    w.pop("_synthetic")
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **w)
    f = lpips_fn(str(path))
    assert f is not None and not f.synthetic
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0, 1, (3, 40, 56)).astype(np.float32))
    b = jnp.clip(a + 0.2, 0, 1)
    assert np.isfinite(float(f(a, b)))


def test_eval_render_overflow_self_heals(tmp_path):
    """An eval rcfg sized below the scene's true pair count must not
    silently truncate tiles into holes (round-5 diagnostic: a healthy
    85k-gaussian map final-evaled at PSNR 14 because the eval pair budget
    sat below the measured pair count and, unlike the online pipeline,
    eval had no overflow-retry). _render_checked doubles pair_cap /
    tile_k_max until the overflow channels clear, so the starved config
    must reproduce the generously-budgeted render exactly."""
    from splatam_tpu.eval.evaluate import _render_checked, render_at_pose

    ds = SyntheticDataset(num_frames=1, height=48, width=64, motion_scale=0.2)
    params = _gt_map_params(ds, 1)
    from splatam_tpu.core.gaussians import from_params_dict

    gm = from_params_dict(params)
    color_np, depth_np, intr, _ = ds[0]
    cam = setup_camera(color_np.shape[1], color_np.shape[0], intr[:3, :3], None)
    q = jnp.asarray(params["cam_unnorm_rots"][..., 0].reshape(4))
    t = jnp.asarray(params["cam_trans"][..., 0].reshape(3))

    big = RenderConfig(backend="tiles", pair_cap=1 << 16, tile_k_max=2048)
    ref = render_at_pose(gm, q, t, cam, big)
    assert int(ref.overflow) == 0, "reference budget itself overflowed"

    starved = RenderConfig(backend="tiles", pair_cap=1 << 10, tile_k_max=2048)
    healed, grown = _render_checked(gm, q, t, cam, starved)
    assert int(healed.overflow) == 0
    assert grown.pair_cap > starved.pair_cap  # it actually had to heal
    np.testing.assert_allclose(
        np.asarray(healed.im), np.asarray(ref.im), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(healed.depth), np.asarray(ref.depth), atol=1e-4)
