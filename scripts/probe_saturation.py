"""Measure the saturation-trim opportunity on the bench-scale scene.

The Pallas forward already early-exits saturated pixels and reports the
deepest contributing pair per pixel (n_contrib); everything OUTSIDE the
kernels — the [P,11] attr gather, the grouped grad gather, the segmented
scan, the sorts — still processes every (gaussian, tile) pair, including
the ones past the termination depth that contribute exactly zero forward
and backward. This probe runs the real SLAM loop to a steady-state map at
bench resolution, builds a pair structure, runs one forward, and reports
how many pairs a per-tile trim at n_contrib*slack would keep.

Usage: python scripts/probe_saturation.py [--frames 6] [--h 680] [--w 1200]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--h", type=int, default=680)
    ap.add_argument("--w", type=int, default=1200)
    args = ap.parse_args()

    os.environ.setdefault("SPLATAM_BENCH", "1")
    import numpy as np

    import jax
    import jax.numpy as jnp

    from splatam_tpu.slam.config import load_experiment_config, seed_everything
    from splatam_tpu.slam.pipeline import SLAMRuntime, _frame_to_device

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "synthetic", "splatam.py",
    )
    config = load_experiment_config(cfg_path)
    config["workdir"] = "/tmp/splatam_satprobe"
    config["data"]["desired_image_height"] = args.h
    config["data"]["desired_image_width"] = args.w
    config["data"]["num_frames"] = args.frames
    config["tracking"]["num_iters"] = 40
    config["mapping"]["num_iters"] = 60
    cap = 1 << 19
    while cap < 2 * args.h * args.w:
        cap <<= 1
    config["tpu"] = dict(capacity=cap, pair_cap=min(cap << 1, 1 << 22),
                         tile_k_max=4096, backend="auto", rebin_every=8)
    seed_everything(0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rt = SLAMRuntime(config)
    for time_idx in range(rt.num_frames):
        color_np, depth_np, _, gt_pose = rt.dataset[time_idx]
        rt.gt_w2c_all.append(np.linalg.inv(gt_pose))
        color, depth = _frame_to_device(color_np, depth_np)
        if time_idx > 0:
            rt.cam_rots[time_idx] = rt.cam_rots[time_idx - 1]
            rt.cam_trans[time_idx] = rt.cam_trans[time_idx - 1]
        rt.compact()
        if time_idx > 0:
            rt.track_frame(time_idx, color, depth)
            rt.densify_frame(time_idx, color, depth)
        selected = rt.select_keyframes(time_idx, depth_np)
        rt._stage_keyframe(rt.kf_scratch_slot, color_np, depth_np)
        rt.map_frame(time_idx, selected)
        if (time_idx == 0) or ((time_idx + 1) % config["keyframe_every"] == 0):
            slot = len(rt.keyframe_list)
            rt._stage_keyframe(slot, color_np, depth_np)
            rt.keyframe_list.append(
                {"id": time_idx, "slot": slot,
                 "q": rt.cam_rots[time_idx].copy(),
                 "t": rt.cam_trans[time_idx].copy()}
            )
            rt.keyframe_time_indices.append(time_idx)
        print(f"frame {time_idx}: n_gauss={int(rt.gm.num_active())}",
              file=sys.stderr)

    # --- steady-state structure + forward probe at the latest pose --------
    from splatam_tpu.core import gaussians as G
    from splatam_tpu.render import binning as binning_mod
    from splatam_tpu.render.pallas.composite_pallas import (
        _pack_attrs_rows, _pad_cols, _split_row_gather,
        composite_forward_pallas,
    )
    from splatam_tpu.render import projection as projection_mod
    from splatam_tpu.slam import steps

    n_active = int(rt.gm.num_active())
    bucket = rt._bucket(n_active)
    gm_view, _ = G.slice_prefix(rt.gm, rt.timestep, bucket)
    rcfg = rt._phase_rcfg(bucket, n_active)
    t_idx = rt.num_frames - 1
    q = jnp.asarray(rt.cam_rots[t_idx])
    t = jnp.asarray(rt.cam_trans[t_idx])
    cam = rt.cam

    ps = steps.loss_pair_structure(gm_view, q, t, cam, rcfg)
    means_cam, rots_cam = steps.transform_to_frame(gm_view, q, t, False, False)
    from splatam_tpu.render.api import _prep_gaussians

    quats, logit_op, scales = _prep_gaussians(
        rots_cam, gm_view.logit_opacities, gm_view.log_scales
    )
    proj, aux = projection_mod.project(
        means_cam, quats, logit_op, scales, gm_view.active, cam.w2c_array(),
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )
    z = proj.depth
    channels = jnp.concatenate(
        [gm_view.rgb_colors, jnp.stack([z, z * z], axis=-1)], axis=1
    )
    attrs_rows = _pack_attrs_rows(proj.xy, proj.conic, proj.opacity, channels)
    padded16 = _pad_cols(_split_row_gather(attrs_rows, ps.pad_gauss)).T
    gx, gy = binning_mod.grid_shape(cam.width, cam.height)
    out = composite_forward_pallas(
        padded16, ps.pad_start, ps.lens, gx, gx * gy, 5
    )
    nc = np.asarray(out[:, 6, :])  # [T, 256] per-pixel deepest contributor
    lens = np.asarray(ps.lens)
    nc_tile = nc.max(axis=1)

    total = int(lens.sum())
    pad128 = int((((lens + 127) // 128) * 128).sum())
    print(f"\nn_active={n_active} bucket={bucket} pair_cap={rcfg.pair_cap}")
    print(f"tiles={len(lens)}  pairs total={total}  padded128={pad128}")
    print(f"lens: mean={lens.mean():.0f} p50={np.median(lens):.0f} "
          f"p90={np.percentile(lens, 90):.0f} max={lens.max()}")
    print(f"nc_tile: mean={nc_tile.mean():.0f} p50={np.median(nc_tile):.0f} "
          f"p90={np.percentile(nc_tile, 90):.0f} max={nc_tile.max():.0f}")
    for slack in (1.0, 1.25, 1.5):
        trim = np.minimum(lens, np.ceil(nc_tile * slack).astype(np.int64))
        tpad128 = int((((trim + 127) // 128) * 128).sum())
        tpad64 = int((((trim + 63) // 64) * 64).sum())
        print(
            f"slack={slack}: trimmed={int(trim.sum())} "
            f"({trim.sum()/max(total,1):.3f}x) padded128={tpad128} "
            f"({tpad128/pad128:.3f}x of padded) padded64={tpad64}"
        )


if __name__ == "__main__":
    main()
