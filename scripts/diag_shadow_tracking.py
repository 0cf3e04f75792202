"""Diagnostic: single-frame tracking error against a drift-free map.

Runs SLAM with ground-truth poses feeding densification/mapping, while
ALSO running the tracker each frame from the constant-velocity init in
SHADOW (its estimate is measured against gt, then discarded). This splits
the gauntlet's trajectory error into:
  - estimator bias/noise: the per-frame shadow error measured here, and
  - feedback accumulation: everything else (the full-SLAM drift minus this).

Usage: python scripts/diag_shadow_tracking.py [--frames 60] [--h 120]
       [--w 160] [--iters 60] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--h", type=int, default=120)
    ap.add_argument("--w", type=int, default=160)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--lr_decay", type=float, default=0.05)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--c2f", default="",
                    help="coarse-to-fine levels 'factor:iters,...', e.g. '4:10,2:10'")
    ap.add_argument("--c2f_stride", action="store_true",
                help="strided c2f downsample instead of average pooling")
    ap.add_argument("--c2f_extra", action="store_true",
                    help="run coarse iters on top of --iters instead of within")
    ap.add_argument("--direct_j", type=int, default=0)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from splatam_tpu.slam.config import load_experiment_config, seed_everything
    from splatam_tpu.slam.pipeline import SLAMRuntime, _frame_to_device, _quat_from_w2c

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "synthetic", "splatam.py",
    )
    config = load_experiment_config(cfg_path)
    config["workdir"] = "/tmp/splatam_shadow"
    config["data"]["desired_image_height"] = args.h
    config["data"]["desired_image_width"] = args.w
    config["data"]["num_frames"] = args.frames
    config["data"]["motion_scale"] = 2.0
    config["tracking"]["num_iters"] = args.iters
    config["tracking"]["lr_decay_frac"] = args.lr_decay
    config["mapping"]["num_iters"] = 60
    config["mapping_window_size"] = 24
    config["keyframe_every"] = 5
    config.setdefault("tpu", {})["rebin_every"] = 8
    if args.direct_j:
        config["tpu"]["direct_j"] = args.direct_j
    if args.c2f:
        levels = [
            [int(f), int(n)]
            for f, n in (lv.split(":") for lv in args.c2f.split(","))
        ]
        config["tracking"]["coarse_to_fine"] = {
            "enabled": True, "levels": levels,
            "downsample": "stride" if args.c2f_stride else "pool",
        }
        config["tracking"]["c2f_extra_iters"] = bool(args.c2f_extra)
    seed_everything(0)

    rt = SLAMRuntime(config)
    ds = rt.dataset
    errs_t, errs_r = [], []
    for time_idx in range(rt.num_frames):
        color_np, depth_np, _, gt_pose = ds[time_idx]
        gt_w2c = np.linalg.inv(gt_pose)
        rt.gt_w2c_all.append(gt_w2c)
        color, depth = _frame_to_device(color_np, depth_np)

        if time_idx > 0:
            # Constant-velocity init FROM GT (the map is drift-free, so the
            # init error is exactly the gt motion model error).
            prev = np.linalg.inv(rt.gt_w2c_all[time_idx - 1])
            if time_idx > 1:
                pprev = np.linalg.inv(rt.gt_w2c_all[time_idx - 2])
                init_c2w = prev @ np.linalg.inv(pprev) @ prev
            else:
                init_c2w = prev
            init_w2c = np.linalg.inv(init_c2w)
            rt.cam_rots[time_idx] = _quat_from_w2c(init_w2c)
            rt.cam_trans[time_idx] = init_w2c[:3, 3].astype(np.float32)

            rt.compact()
            rt.track_frame(time_idx, color, depth)

            # Shadow error vs gt, in cm / degrees.
            from splatam_tpu.slam.pipeline import _w2c_from_qt

            est = _w2c_from_qt(rt.cam_rots[time_idx], rt.cam_trans[time_idx])
            c2w_e, c2w_g = np.linalg.inv(est), np.linalg.inv(gt_w2c)
            et = np.linalg.norm(c2w_e[:3, 3] - c2w_g[:3, 3]) * 100
            dR = c2w_e[:3, :3] @ c2w_g[:3, :3].T
            er = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
            errs_t.append(et)
            errs_r.append(er)

        # Feed GT pose forward (shadow: tracker output discarded).
        rt.cam_rots[time_idx] = _quat_from_w2c(gt_w2c)
        rt.cam_trans[time_idx] = gt_w2c[:3, 3].astype(np.float32)
        rt.densify_frame(time_idx, color, depth) if time_idx > 0 else None
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
        if errs_t:
            print(f"frame {time_idx}: shadow err {errs_t[-1]:.4f} cm / "
                  f"{errs_r[-1]:.4f} deg")

    t, r = np.array(errs_t), np.array(errs_r)
    print(f"\nshadow tracking error over {len(t)} frames "
          f"(map built with GT poses):")
    print(f"  translation cm: mean {t.mean():.4f}  median "
          f"{np.median(t):.4f}  p90 {np.percentile(t, 90):.4f}  "
          f"max {t.max():.4f}")
    print(f"  rotation deg:   mean {r.mean():.4f}  median "
          f"{np.median(r):.4f}  p90 {np.percentile(r, 90):.4f}  "
          f"max {r.max():.4f}")
    print(f"  signed mean (drift direction indicator): see per-frame log")


if __name__ == "__main__":
    main()
