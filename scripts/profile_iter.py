"""Micro-profile: per-component timing of one tracking/mapping iteration.

Times (on the real accelerator, median of K reps, block_until_ready):
  - pair-structure build (projection + binning + padded layout + sorts)
  - forward render (given a structure)
  - forward+backward through get_loss (tracking and mapping flavors)
  - a full tracking_phase / mapping-chunk iteration (amortized)

Usage: python scripts/profile_iter.py [--n 262144] [--h 340] [--w 600]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=10, warmup=2):
    import numpy as np

    for _ in range(warmup):
        r = fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        import jax

        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--h", type=int, default=340)
    ap.add_argument("--w", type=int, default=600)
    ap.add_argument("--pair_cap", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import splatam_tpu  # noqa: F401  (forces f32 matmul precision)
    from splatam_tpu.core.camera import setup_camera
    from splatam_tpu.render.api import (
        RenderConfig, compute_pair_structure, render_rgbd_sil,
    )
    from splatam_tpu.slam import steps
    from splatam_tpu.core.gaussians import GaussianMap

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    # Host->device dispatch round-trip (the axon tunnel adds ~30 ms); every
    # per-call timing below includes one RTT, so report it and correct for it.
    trivial = jax.jit(lambda x: x + 1.0)
    rtt = timeit(lambda: trivial(jnp.zeros((8, 128), jnp.float32)))
    print(f"dispatch RTT: {rtt*1e3:8.2f} ms (subtracted in summary)")

    n, h, w = args.n, args.h, args.w
    rng = np.random.default_rng(0)

    # Synthetic box-room-like map: points in a 6x6x3 box in front of the cam.
    pts = rng.uniform([-3, -2, 0.5], [3, 2, 6.5], (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    scales = np.log(rng.uniform(0.004, 0.02, (n, 1))).astype(np.float32)
    intr = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32)
    cam = setup_camera(w, h, intr, None)

    gm = GaussianMap(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(cols),
        unnorm_rotations=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        logit_opacities=jnp.full((n,), 1.0, jnp.float32),
        log_scales=jnp.asarray(scales),
        active=jnp.ones((n,), bool),
    )
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    color = jnp.zeros((3, h, w), jnp.float32)
    depth_gt = jnp.full((h, w), 3.0, jnp.float32)
    rcfg = RenderConfig(pair_cap=args.pair_cap)

    # ---- pair structure -------------------------------------------------
    build = jax.jit(
        lambda: steps.loss_pair_structure(gm, q, t, cam, rcfg)
    )
    ps = build()
    print(f"n_pairs={int(ps.bins.n_pairs)} overflow={int(ps.bins.overflow)}")
    t_ps = timeit(build)
    print(f"pair_structure build: {t_ps*1e3:8.2f} ms")

    # ---- forward only ---------------------------------------------------
    def fwd(ps):
        means_cam, rots_cam = steps.transform_to_frame(gm, q, t, False, False)
        return render_rgbd_sil(
            cam, means_cam, gm.rgb_colors, rots_cam, gm.logit_opacities,
            gm.log_scales, gm.active, config=rcfg, pair_structure=ps,
        ).im
    fwd_j = jax.jit(fwd)
    t_fwd = timeit(lambda: fwd_j(ps))
    print(f"forward render (reused ps): {t_fwd*1e3:8.2f} ms")

    # ---- tracking fwd+bwd -----------------------------------------------
    pcfg = steps.PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.99, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )

    def track_loss(qt, ps):
        loss, _ = steps.get_loss(
            gm, qt[0], qt[1], color, depth_gt, cam, pcfg, rcfg, True, False,
            pair_structure=ps,
        )
        return loss

    tg = jax.jit(jax.grad(track_loss))
    t_tbwd = timeit(lambda: tg((q, t), ps))
    print(f"tracking fwd+bwd (reused ps): {t_tbwd*1e3:8.2f} ms")

    # ---- mapping fwd+bwd ------------------------------------------------
    mcfg = steps.PhaseConfig(
        use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )

    def map_loss(params, ps):
        g2 = gm._replace(
            means3d=params[0], rgb_colors=params[1], unnorm_rotations=params[2],
            logit_opacities=params[3], log_scales=params[4],
        )
        loss, _ = steps.get_loss(
            g2, q, t, color, depth_gt, cam, mcfg, rcfg, False, True,
            pair_structure=ps,
        )
        return loss

    params = (gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
              gm.logit_opacities, gm.log_scales)
    mg = jax.jit(jax.grad(map_loss))
    t_mbwd = timeit(lambda: mg(params, ps))
    print(f"mapping  fwd+bwd (reused ps): {t_mbwd*1e3:8.2f} ms")

    t_ps, t_fwd, t_tbwd, t_mbwd = (
        max(t - rtt, 0.0) for t in (t_ps, t_fwd, t_tbwd, t_mbwd)
    )
    print(
        f"\nsummary (RTT-corrected) @ n={n}, {w}x{h}: ps={t_ps*1e3:.1f}ms "
        f"fwd={t_fwd*1e3:.1f}ms "
        f"track_bwd={t_tbwd*1e3:.1f}ms map_bwd={t_mbwd*1e3:.1f}ms\n"
        f"implied track iter (rebin 8): {(t_tbwd + t_ps/8)*1e3:.1f}ms; "
        f"map iter (1 ps / 24 kf window / 60 iters): "
        f"{(t_mbwd + t_ps*min(1.0, 24/60))*1e3:.1f}ms"
    )


if __name__ == "__main__":
    main()
