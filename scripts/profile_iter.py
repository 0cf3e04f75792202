"""Stage-by-stage timing of one render/loss iteration on real hardware.

Times each pipeline stage of the fused 6-channel render (projection, pair
expansion, sort, padded layout, attr gather, Pallas forward/backward, grad
scatter, loss extras) with IN-LOOP timing: every measurement runs K
iterations inside ONE jitted lax.fori_loop with per-iteration input
perturbation, so neither the host-dispatch RTT (~33 ms through the axon
tunnel) nor XLA loop-invariant hoisting can corrupt the numbers.

Usage:  python scripts/profile_iter.py [--n 310000] [--h 340] [--w 600]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RTT_MS = None  # measured at startup


def make_scene(n_active, capacity, seed=0):
    """Random indoor-ish cloud sized to land ~2 tiles/visible gaussian."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-2.2, 2.2, capacity),
            rng.uniform(-1.4, 1.4, capacity),
            rng.uniform(1.2, 6.0, capacity),
        ],
        axis=-1,
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (capacity, 3)).astype(np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (capacity, 1))
    logit_op = rng.normal(1.0, 0.5, capacity).astype(np.float32)
    log_scales = np.log(
        means[:, 2:3] / 600.0 * rng.uniform(0.8, 2.0, (capacity, 1))
    ).astype(np.float32)
    active = np.arange(capacity) < n_active
    return (
        jnp.asarray(means),
        jnp.asarray(colors),
        jnp.asarray(quats),
        jnp.asarray(logit_op.astype(np.float32)),
        jnp.asarray(log_scales),
        jnp.asarray(active),
    )


def measure_rtt():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    _ = float(np.asarray(f(x))[0, 0])
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        _ = float(np.asarray(f(x))[0, 0])
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def timed_loop(name, body, means3d, K=20, reps=3, results=None):
    """body(means3d) -> scalar-reducible pytree; runs K iterations inside
    one jit with means3d perturbed per iteration (data-dependence chain
    prevents hoisting and overlap-collapse)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(m):
        def f(i, carry):
            m, acc = carry
            out = body(m + acc * 1e-30 + jnp.float32(i) * 1e-9)
            leaves = [jnp.sum(l[..., :1].astype(jnp.float32)) if l.ndim else
                      l.astype(jnp.float32) for l in jax.tree.leaves(out)]
            return (m, acc + sum(leaves) * 1e-20)
        _, acc = jax.lax.fori_loop(0, K, f, (m, jnp.float32(0.0)))
        return acc

    r = run(means3d)
    _ = float(np.asarray(r))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(means3d)
        _ = float(np.asarray(r))
        ts.append((time.perf_counter() - t0) * 1000)
    ms = (float(np.median(ts)) - RTT_MS) / K
    print(f"{name:<48s} {ms:8.2f} ms/iter")
    if results is not None:
        results[name] = ms
    return ms


def main():
    global RTT_MS
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=310_000)
    ap.add_argument("--cap", type=int, default=1 << 19)
    ap.add_argument("--h", type=int, default=340)
    ap.add_argument("--w", type=int, default=600)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from splatam_tpu.core.camera import setup_camera
    from splatam_tpu.core.gaussians import GaussianMap
    from splatam_tpu.core.losses import calc_ssim
    from splatam_tpu.render import binning as B
    from splatam_tpu.render import projection as P
    from splatam_tpu.render.api import RenderConfig
    from splatam_tpu.slam import optim, steps

    RTT_MS = measure_rtt()
    print(f"backend: {jax.default_backend()}  n_active={args.n} cap={args.cap} "
          f"{args.w}x{args.h}  host RTT {RTT_MS:.1f} ms", file=sys.stderr)
    h, w = args.h, args.w
    k = [[600.0 * w / 1200, 0, w / 2], [0, 600.0 * h / 680, h / 2], [0, 0, 1]]
    cam = setup_camera(w, h, k, np.eye(4, dtype=np.float32))
    scene = make_scene(args.n, args.cap)
    means3d, colors, quats, logit_op, log_scales, active = scene

    gran = 1 << 17
    budget = ((int(args.n * 2.0) + gran - 1) // gran) * gran
    pair_cap = max(1 << 16, budget)
    backend = "pallas" if jax.default_backend() == "tpu" else "tiles"
    rcfg = RenderConfig(backend=backend, pair_cap=pair_cap, tile_k_max=4096)
    K = args.k
    R = {}

    def proj_fwd(m):
        scales = jnp.exp(jnp.tile(log_scales, (1, 3)))
        return P.project(m, quats, logit_op, scales, active,
                         jnp.eye(4, dtype=jnp.float32), cam.fx, cam.fy, cam.cx,
                         cam.cy, cam.width, cam.height)

    proj, aux = jax.jit(proj_fwd)(means3d)
    n_pairs = int(jnp.sum(jnp.where(aux.visible, aux.rect_wh[:, 0] * aux.rect_wh[:, 1], 0)))
    n_vis = int(jnp.sum(aux.visible))
    print(f"pair_cap={pair_cap} visible={n_vis} pairs={n_pairs} "
          f"pairs/visible={n_pairs / max(n_vis, 1):.2f}", file=sys.stderr)

    timed_loop("projection fwd", proj_fwd, means3d, K, results=R)

    def bins_fn(m):
        p, a = proj_fwd(m)
        return B.build_bins(p, a, w, h, pair_cap, far=cam.far)

    timed_loop("+ build_bins (expand+sort)", bins_fn, means3d, K, results=R)

    grid_x, grid_y = B.grid_shape(w, h)
    num_tiles = grid_x * grid_y
    from splatam_tpu.render.pallas import composite_pallas as CP

    pad_cap = pair_cap + num_tiles * CP.C

    def padded_fn(m):
        bins = bins_fn(m)
        return B.padded_layout(bins, num_tiles, pad_cap, align=CP.C)

    timed_loop("+ padded_layout", padded_fn, means3d, K, results=R)

    def attrs_fn(m):
        p, a = proj_fwd(m)
        bins = B.build_bins(p, a, w, h, pair_cap, far=cam.far)
        pad_gauss, pad_start, lens, dst = B.padded_layout(bins, num_tiles, pad_cap, align=CP.C)
        ones = jnp.ones_like(p.depth)
        channels = jnp.concatenate(
            [colors, jnp.stack([p.depth, ones, p.depth * p.depth], -1)], axis=-1)
        rows = CP._pack_attrs_rows(p.xy, p.conic, p.opacity, channels)
        return rows[pad_gauss].T, pad_start, lens

    timed_loop("+ attr gather + transpose", attrs_fn, means3d, K, results=R)

    def fwd_fn(m):
        padded16, pad_start, lens = attrs_fn(m)
        return CP.composite_forward_pallas(padded16, pad_start, lens, grid_x,
                                           num_tiles, 6)

    timed_loop("+ pallas fwd kernel", fwd_fn, means3d, K, results=R)

    gm = GaussianMap(means3d, colors, quats, logit_op[:, None], log_scales, active)
    color_gt = jnp.zeros((3, h, w), jnp.float32)
    depth_gt = jnp.full((h, w), 2.5, jnp.float32)
    pcfg_t = steps.PhaseConfig(True, 0.99, True, True, 0.5, 1.0)
    pcfg_m = steps.PhaseConfig(False, 0.5, True, False, 0.5, 1.0)
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)

    def render_fwd_only(m):
        gm_i = gm._replace(means3d=m)
        return steps.get_loss(gm_i, q, t, color_gt, depth_gt, cam, pcfg_m,
                              rcfg, False, True)[0]

    timed_loop("mapping loss fwd only", render_fwd_only, means3d, K, results=R)

    def track_grad(m):
        def f(qt):
            gm_i = gm._replace(means3d=m)
            return steps.get_loss(gm_i, qt[0], qt[1], color_gt, depth_gt, cam,
                                  pcfg_t, rcfg, True, False)
        (loss, _), g = jax.value_and_grad(f, has_aux=True)((q, t))
        return loss, g

    timed_loop("tracking fwd+bwd (pose grads)", track_grad, means3d, K, results=R)

    def map_grad(m):
        params = (m, colors, quats, logit_op[:, None], log_scales)

        def f(params):
            gm_i = gm._replace(means3d=params[0], rgb_colors=params[1],
                               unnorm_rotations=params[2],
                               logit_opacities=params[3], log_scales=params[4])
            return steps.get_loss(gm_i, q, t, color_gt, depth_gt, cam,
                                  pcfg_m, rcfg, False, True)
        (loss, _), g = jax.value_and_grad(f, has_aux=True)(params)
        return loss, g

    timed_loop("mapping fwd+bwd (all 5 params)", map_grad, means3d, K, results=R)

    def median_fn(m):
        return steps._median_lower(jnp.abs(depth_gt - m[0, 0]))

    timed_loop("median (sort HxW)", median_fn, means3d, K, results=R)
    timed_loop("ssim fwd+bwd",
               lambda m: jax.grad(
                   lambda y: calc_ssim(y, color_gt))(color_gt + m[0, 0] * 1e-30),
               means3d, K, results=R)

    params5 = (means3d, colors, quats, logit_op[:, None], log_scales)
    st = optim.adam_init(params5)
    lrt = tuple(jnp.float32(1e-3) for _ in range(5))
    timed_loop("adam step (5 params)",
               lambda m: optim.adam_step(st, (m,) + params5[1:],
                                         (m,) + params5[1:], lrt, 1e-15),
               means3d, K, results=R)

    print("\n--- stage deltas ---")
    names = list(R)
    for a, b in zip(names[:5], names[1:5]):
        print(f"{b:<44s} {R[b] - R[a]:8.2f} ms")
    print(f"{'bwd overhead (tracking vs fwd-only)':<44s} "
          f"{R['tracking fwd+bwd (pose grads)'] - R['mapping loss fwd only']:8.2f} ms")
    print(f"{'bwd overhead (mapping vs fwd-only)':<44s} "
          f"{R['mapping fwd+bwd (all 5 params)'] - R['mapping loss fwd only']:8.2f} ms")


if __name__ == "__main__":
    main()
