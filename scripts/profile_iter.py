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


def timed_loop(name, body, x0, K=20, reps=3):
    """Hoist-proof in-loop timing: K iterations inside ONE jit, the float
    input perturbed per iteration (data-dependence chain prevents XLA from
    hoisting loop-invariant subgraphs or collapsing iterations). Returns
    amortized seconds/iteration — the number that matches how the real
    phase programs (fori/while loops) execute."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def f(i, carry):
            x, acc = carry
            out = body(x + acc * 1e-30 + jnp.float32(i) * 1e-9)
            leaves = [
                jnp.sum(l[..., :1].astype(jnp.float32)) if l.ndim
                else l.astype(jnp.float32)
                for l in jax.tree.leaves(out)
            ]
            return (x, acc + sum(leaves) * 1e-20)

        _, acc = jax.lax.fori_loop(0, K, f, (x, jnp.float32(0.0)))
        return acc

    jax.block_until_ready(run(x0))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ts.append((time.perf_counter() - t0) / K)
    t = float(np.median(ts))
    print(f"{name:<44s} {t*1e3:8.2f} ms/iter")
    return t


def run_stages(args, gm, cam, rcfg, q, t, color, depth_gt):
    """Stage-by-stage in-loop breakdown of one fwd+bwd iteration."""
    import jax
    import jax.numpy as jnp

    from splatam_tpu.render import binning as B
    from splatam_tpu.render import projection as P
    from splatam_tpu.render.api import _num_tiles, _prep_gaussians
    from splatam_tpu.render.pallas import composite_pallas as CP
    from splatam_tpu.slam import steps

    w, h = cam.width, cam.height
    grid_x, _ = B.grid_shape(w, h)
    num_tiles = _num_tiles(w, h)
    ch = 5  # [r, g, b, z, z^2]; silhouette comes from the tracked T

    quats, logit_op_a, scales = _prep_gaussians(
        gm.unnorm_rotations, gm.logit_opacities, gm.log_scales
    )
    w2c = cam.w2c_array()

    def proj_fn(m):
        return P.project(
            m, quats, logit_op_a, scales, gm.active, w2c,
            cam.fx, cam.fy, cam.cx, cam.cy, w, h,
        )

    proj, aux = jax.jit(proj_fn)(gm.means3d)
    ps = jax.jit(
        lambda: steps.loss_pair_structure(gm, q, t, cam, rcfg)
    )()
    channels = jnp.concatenate(
        [gm.rgb_colors, jnp.stack([proj.depth, proj.depth**2], -1)], -1
    )

    timed_loop("projection fwd", proj_fn, gm.means3d)
    timed_loop(
        "ps build (proj+bins+layout+grouped sort)",
        lambda m: steps.loss_pair_structure(
            gm._replace(means3d=m), q, t, cam, rcfg
        ),
        gm.means3d,
    )

    def bins_fn(m):
        p, ax = proj_fn(m)
        return B.build_bins(p, ax, w, h, rcfg.pair_cap, far=cam.far,
                            direct_j=rcfg.direct_j, tile_cull=rcfg.tile_cull)

    timed_loop("  proj + build_bins (spread+key sort)", bins_fn, gm.means3d)

    from splatam_tpu.render.api import pallas_layout as _pl

    bins0 = jax.jit(bins_fn)(gm.means3d)

    def layout_fn(x):
        b2 = bins0._replace(pair_gauss=bins0.pair_gauss + (x[0, 0] * 0).astype(jnp.int32))
        return _pl(b2, num_tiles, gm.means3d.shape[0])

    timed_loop("  padded layout + grouped sort", layout_fn, gm.means3d)

    def gather_fn(xy):
        rows = CP._pack_attrs_rows(xy, proj.conic, proj.opacity, channels)
        return CP._pad_cols(CP._split_row_gather(rows, ps.pad_gauss)).T

    padded16 = jax.jit(gather_fn)(proj.xy)
    timed_loop("attr gather + transpose", gather_fn, proj.xy)

    fwd_fn = lambda p: CP.composite_forward_pallas(
        p, ps.pad_start, ps.lens, grid_x, num_tiles, ch
    )
    state = jax.jit(fwd_fn)(padded16)
    timed_loop("pallas fwd kernel", fwd_fn, padded16)

    g_acc = jnp.ones((num_tiles, ch + 1, CP.PIX), jnp.float32)
    bwd_fn = lambda g: CP.composite_backward_pallas(
        padded16, ps.pad_start, ps.lens, state, g, grid_x, num_tiles, ch
    )
    dattrs = jax.jit(bwd_fn)(g_acc)
    timed_loop("pallas bwd kernel", bwd_fn, g_acc)

    timed_loop(
        "grouped grad gather",
        lambda d: CP._split_row_gather(d.T, ps.dst_sorted).T,
        dattrs,
    )
    grads_grouped = jax.jit(
        lambda d: CP._split_row_gather(d.T, ps.dst_sorted).T
    )(dattrs)
    timed_loop(
        "pallas segment scan",
        lambda g: CP.segment_reduce_scan_pallas(g, ps.gid_sorted),
        grads_grouped,
    )
    scanned0 = jax.jit(
        lambda g: CP.segment_reduce_scan_pallas(g, ps.gid_sorted)
    )(grads_grouped)
    counts = ps.bins.counts
    pair_cap = ps.dst.shape[0]
    offsets = jnp.cumsum(counts) - counts
    end_slot = jnp.clip(jnp.minimum(offsets + counts, pair_cap) - 1, 0,
                        pair_cap - 1)

    def extract_fn(s):
        return jnp.where(
            ps.bins.in_stream[:, None],
            CP._split_row_gather(s.T, end_slot),
            0.0,
        )

    timed_loop("end-slot totals extract", extract_fn, scanned0)

    def map_fwd_only(m):
        g2 = gm._replace(means3d=m)
        loss, _ = steps.get_loss(
            g2, q, t, color, depth_gt, cam,
            steps.PhaseConfig(
                use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
                ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
            ),
            rcfg, False, True, pair_structure=ps,
        )
        return loss

    timed_loop("mapping get_loss fwd ONLY (reused ps)", map_fwd_only,
               gm.means3d, K=10)

    pcfg = steps.PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.99, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )

    def track_grad(m):
        def f(qt):
            loss, _ = steps.get_loss(
                gm._replace(means3d=m), qt[0], qt[1], color, depth_gt, cam,
                pcfg, rcfg, True, False, pair_structure=ps,
            )
            return loss
        return jax.grad(f)((q, t))

    timed_loop("tracking get_loss fwd+bwd (reused ps)", track_grad,
               gm.means3d, K=10)

    ps_w = jax.jit(
        lambda: steps.loss_pair_structure(gm, q, t, cam, rcfg,
                                          with_world16=True)
    )()

    def track_grad_pairspace(x):
        def f(qt):
            loss, _ = steps.get_loss(
                gm, qt[0], qt[1] + x[0, 0] * 1e-30, color, depth_gt, cam,
                pcfg, rcfg, True, False, pair_structure=ps_w,
            )
            return loss
        return jax.grad(f)((q, t))

    timed_loop("tracking get_loss fwd+bwd (pair-space)", track_grad_pairspace,
               gm.means3d, K=10)

    mcfg = steps.PhaseConfig(
        use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )

    def map_grad(m):
        def f(params):
            g2 = gm._replace(
                means3d=params[0], rgb_colors=params[1],
                unnorm_rotations=params[2], logit_opacities=params[3],
                log_scales=params[4],
            )
            loss, _ = steps.get_loss(
                g2, q, t, color, depth_gt, cam, mcfg, rcfg, False, True,
                pair_structure=ps,
            )
            return loss
        return jax.grad(f)(
            (m, gm.rgb_colors, gm.unnorm_rotations, gm.logit_opacities,
             gm.log_scales)
        )

    timed_loop("mapping get_loss fwd+bwd (reused ps)", map_grad,
               gm.means3d, K=10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--h", type=int, default=340)
    ap.add_argument("--w", type=int, default=600)
    ap.add_argument("--pair_cap", type=int, default=1 << 20)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", action="store_true",
                    help="in-loop per-stage breakdown (slower to compile)")
    ap.add_argument("--direct_j", type=int, default=0)
    ap.add_argument("--tile_cull", action="store_true")
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
    rcfg = RenderConfig(pair_cap=args.pair_cap, direct_j=args.direct_j,
                        tile_cull=args.tile_cull)

    if args.stages:
        run_stages(args, gm, cam, rcfg, q, t, color, depth_gt)
        return

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
