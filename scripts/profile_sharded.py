"""Sharded-step cost measurement on a virtual CPU mesh.

Multi-chip TPU hardware is unavailable in this environment, so this script
measures what a CPU mesh CAN measure honestly:

  1. the per-shard WORK split — max/mean (gaussian, tile) pairs per shard
     vs the unsharded pair count (row sharding splits binning/composite
     work ~1/n_shards, plus row-boundary duplicates and imbalance), and
  2. the TOTAL executed work — on a single-core host every virtual device's
     work runs serially, so sharded wall time ~= sum over shards. The ratio
     (sharded total / unsharded) is the sharding overhead factor; real
     n-chip latency is ~= total/n plus ICI collective time (a few MB
     all_gather per step).

Run (self-forces CPU + virtual devices; safe under a wedged TPU tunnel):
    python scripts/profile_sharded.py --shards 1 2 4 8

Numbers feed docs/PERFORMANCE.md's sharded-step cost table.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=320)
    ap.add_argument("--pair_cap", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--map_iters", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    max_sh = max(args.shards)
    if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max_sh}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from splatam_tpu.core.camera import Camera
    from splatam_tpu.core.gaussians import GaussianMap
    from splatam_tpu.parallel.spatial import (
        compute_pair_structure_sharded, make_mesh, shard_heights,
    )
    from splatam_tpu.render.api import RenderConfig, compute_pair_structure
    from splatam_tpu.slam import optim, steps

    rng = np.random.default_rng(0)
    n = args.n
    means = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.0, 1.0, n),
         rng.uniform(1.5, 5.0, n)], -1
    ).astype(np.float32)
    gm = GaussianMap(
        jnp.asarray(means),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(1.0, 0.5, (n,)).astype(np.float32)),
        jnp.asarray(np.log(rng.uniform(0.005, 0.02, (n, 1))).astype(np.float32)),
        jnp.asarray(np.ones(n, bool)),
    )
    h, w = args.h, args.w
    cam = Camera(height=h, width=w, fx=0.9 * w, fy=0.9 * w,
                 cx=w / 2.0, cy=h / 2.0)
    color = jnp.asarray(rng.uniform(0, 1, (3, h, w)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1.0, 4.0, (h, w)).astype(np.float32))
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    pcfg = steps.PhaseConfig(True, 0.5, True, True, 0.5, 1.0)

    def timed(fn):
        fn()  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # Unsharded baselines.
    rcfg1 = RenderConfig(backend="tiles", pair_cap=args.pair_cap,
                         tile_k_max=4096)
    base_pairs = int(
        compute_pair_structure(
            cam, gm.means3d, gm.unnorm_rotations, gm.logit_opacities,
            gm.log_scales, gm.active, rcfg1,
        ).bins.n_pairs
    )
    print(f"scene: {n} gaussians, {w}x{h}, {base_pairs} unsharded pairs")

    rows = []
    for n_sh in args.shards:
        if n_sh == 1:
            mesh = None
            rcfg = rcfg1
            shard_pairs = [base_pairs]
        else:
            mesh = make_mesh(n_sh)
            # Per-shard budget mirroring pipeline._phase_rcfg: global
            # budget * 1.3 / n_sh for boundary duplicates.
            cap = max(1 << 13, int(args.pair_cap * 1.3) // n_sh)
            rcfg = RenderConfig(backend="tiles", pair_cap=cap, tile_k_max=4096)
            ps_sh = compute_pair_structure_sharded(
                mesh, cam, gm.means3d, gm.unnorm_rotations,
                gm.logit_opacities, gm.log_scales, gm.active, rcfg,
            )
            shard_pairs = [int(x) for x in np.asarray(ps_sh.bins.n_pairs)]

        def track():
            out = steps.tracking_phase(
                gm, q, t, color, depth, cam, args.iters, False, 1e5,
                2e-3, 1e-3, pcfg, rcfg, mesh=mesh, rebin_every=3,
            )
            jax.block_until_ready(out[0])

        t_track = timed(track)

        # Mapping phase (the 75% of a full-res frame): single-keyframe
        # store, structure reuse on, same shapes the pipeline would run.
        kf_colors = (np.asarray(color).transpose(1, 2, 0) * 255).astype(
            np.uint8
        )[None]
        kf_depths = jnp.asarray(depth)[None]
        mi = args.map_iters
        params5 = (gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
                   gm.logit_opacities, gm.log_scales)
        opt_state = optim.adam_init(params5)
        zeros = jnp.zeros((n,), jnp.float32)
        mcfg = steps.PhaseConfig(False, 0.5, True, False, 0.5, 1.0)
        prune_cfg = steps.PruneConfig()

        def mapping():
            out = steps.mapping_phase(
                gm, jnp.asarray(kf_colors), kf_depths,
                jnp.zeros((mi,), jnp.int32),
                jnp.tile(q[None], (mi, 1)), jnp.tile(t[None], (mi, 1)),
                jnp.float32(3.0), cam, mi, mcfg, rcfg, prune_cfg,
                (2e-4, 2.5e-3, 1e-3, 5e-2, 1e-3), opt_state,
                (zeros, zeros, zeros), mesh=mesh,
                reuse_structures=True, struct_qs=q[None], struct_ts=t[None],
                iter_struct_idx=jnp.zeros((mi,), jnp.int32),
                n_structs=jnp.int32(1),
            )
            jax.block_until_ready(out[0].means3d)

        t_map = timed(mapping)
        tot = sum(shard_pairs)
        rows.append(
            dict(shards=n_sh, pairs_max=max(shard_pairs),
                 pairs_total=tot, dup=tot / base_pairs,
                 track_s=t_track, map_s=t_map)
        )
        print(
            f"shards={n_sh}: per-shard pairs max={max(shard_pairs)}"
            f" ({max(shard_pairs)/base_pairs:.3f}x of unsharded),"
            f" total={tot} (dup factor {tot/base_pairs:.3f}),"
            f" tracking {args.iters} iters: {t_track:.3f}s,"
            f" mapping {mi} iters: {t_map:.3f}s total-work"
        )

    base_t, base_m = rows[0]["track_s"], rows[0]["map_s"]
    print("\nsummary (single-core host: wall ~= total work across shards):")
    for r in rows:
        ot, om = r["track_s"] / base_t, r["map_s"] / base_m
        print(
            f"  shards={r['shards']}: total-work track {ot:.2f}x / map"
            f" {om:.2f}x unsharded -> projected per-chip latency"
            f" track {ot/r['shards']:.2f}x / map {om/r['shards']:.2f}x"
            f" (+ collectives), max-shard pairs {r['pairs_max']}"
        )


if __name__ == "__main__":
    main()
