"""Honest mapping-iteration ablation at bench scale.

Every probe is a FULL get_loss fwd+bwd whose scalar loss feeds the timing
loop's carry — nothing can be dead-code-eliminated (the per-stage profiler's
col-0-only consumption measured fictions; see docs/PERFORMANCE.md round 4).
Differences between ablations attribute cost honestly.

Usage: python scripts/profile_map_ablate.py [--n 1179648] [--pair_cap 2097152]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=950272)
    ap.add_argument("--h", type=int, default=680)
    ap.add_argument("--w", type=int, default=1200)
    ap.add_argument("--pair_cap", type=int, default=2097152)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    import splatam_tpu  # noqa: F401
    from splatam_tpu.core.camera import setup_camera
    from splatam_tpu.core.gaussians import GaussianMap
    from splatam_tpu.render.api import RenderConfig
    from splatam_tpu.slam import steps

    def timed_loop(name, body, K=10, reps=3):
        @jax.jit
        def run(x):
            def f(i, carry):
                x, acc = carry
                out = body(x + acc * 1e-30 + jnp.float32(i) * 1e-9)
                leaves = [jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree.leaves(out)]
                return (x, acc + sum(leaves) * 1e-20)

            _, acc = jax.lax.fori_loop(0, K, f, (x, jnp.float32(0.0)))
            return acc

        jax.block_until_ready(run(x0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(x0))
            ts.append((time.perf_counter() - t0) / K)
        print(f"{name:<52s} {float(np.median(ts))*1e3:8.2f} ms/iter",
              flush=True)

    n, h, w = args.n, args.h, args.w
    rng = np.random.default_rng(0)
    pts = rng.uniform([-3, -2, 0.5], [3, 2, 6.5], (n, 3)).astype(np.float32)
    gm = GaussianMap(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        unnorm_rotations=jnp.tile(
            jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        logit_opacities=jnp.full((n,), 1.0, jnp.float32),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.02, (n, 1))).astype(np.float32)),
        active=jnp.ones((n,), bool),
    )
    x0 = gm.means3d
    intr = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]],
                    np.float32)
    cam = setup_camera(w, h, intr, None)
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    color = jnp.zeros((3, h, w), jnp.float32)
    depth_gt = jnp.full((h, w), 3.0, jnp.float32)
    rcfg = RenderConfig(pair_cap=args.pair_cap)
    ps = jax.jit(lambda: steps.loss_pair_structure(gm, q, t, cam, rcfg))()
    print(f"n_pairs={int(ps.bins.n_pairs)} pair_cap={args.pair_cap}")

    def mk(pcfg_kw=None, grad_params=(0, 1, 2, 3, 4)):
        pcfg = steps.PhaseConfig(
            use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
            ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
            **(pcfg_kw or {}),
        )

        def probe(m):
            def f(params):
                full = [m, gm.rgb_colors, gm.unnorm_rotations,
                        gm.logit_opacities, gm.log_scales]
                for slot, p in zip(grad_params, params):
                    full[slot] = p
                g2 = gm._replace(
                    means3d=full[0], rgb_colors=full[1],
                    unnorm_rotations=full[2], logit_opacities=full[3],
                    log_scales=full[4],
                )
                loss, _ = steps.get_loss(
                    g2, q, t, color, depth_gt, cam, pcfg, rcfg, False, True,
                    pair_structure=ps,
                )
                return loss
            full = (m, gm.rgb_colors, gm.unnorm_rotations,
                    gm.logit_opacities, gm.log_scales)
            sel = tuple(full[i] for i in grad_params)
            return jax.grad(f)(sel)
        return probe

    timed_loop("mapping fwd+bwd (baseline)", mk())
    timed_loop("mapping fwd+bwd grads: means only", mk(grad_params=(0,)))

    # forward only
    pcfg = steps.PhaseConfig(
        use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )

    def fwd_only(m):
        loss, _ = steps.get_loss(
            gm._replace(means3d=m), q, t, color, depth_gt, cam, pcfg, rcfg,
            False, True, pair_structure=ps,
        )
        return loss

    timed_loop("mapping fwd only", fwd_only)

    # loss glue without SSIM: pure-L1 image loss via the tracking formula
    def fwd_l1(m):
        loss, _ = steps.get_loss(
            gm._replace(means3d=m), q, t, color, depth_gt, cam,
            steps.PhaseConfig(
                use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
                ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
            ),
            rcfg, True, False, pair_structure=ps,
        )
        return loss

    timed_loop("tracking-formula fwd (no SSIM, pose-only bwd skipped)",
               fwd_l1)

    # structure build at this cap (amortized per distinct keyframe)
    timed_loop(
        "pair-structure build",
        lambda m: steps.loss_pair_structure(
            gm._replace(means3d=m), q, t, cam, rcfg),
    )


if __name__ == "__main__":
    main()
