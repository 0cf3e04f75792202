"""Two-chunk software pipelining probe for the fused forward kernel.

Round-5 finding chain (docs/PERFORMANCE.md): the forward's per-chunk cost
is a serialized dependency chain — alpha/log (VPU) -> triangular MXU
matmul -> exp -> coupled transmittance update — so removing parallel VPU
ops moves nothing. This probe unrolls TWO chunks per loop step: both
chunks' carry-independent prefixes (projection, alpha, log, MXU cumsum,
exp) are issued back-to-back so chunk i+1's VPU work can hide under chunk
i's MXU/transcendental latency; only the cheap coupled tail (t_col/done/
nc/acc) runs serially. Measures the real fused_forward_pallas vs the
unrolled variant on the same bench-scale pair structure.

Usage: python scripts/probe_unroll.py [--n 1272155] [--pair_cap 2621440]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1272155)
    ap.add_argument("--h", type=int, default=680)
    ap.add_argument("--w", type=int, default=1200)
    ap.add_argument("--pair_cap", type=int, default=2621440)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--opacity_logit", type=float, default=-2.0,
                    help="-2.0 (~0.12 alpha) mimics the bench scene's "
                         "no-early-termination regime; 1.0 saturates")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import splatam_tpu  # noqa: F401
    from splatam_tpu.core.camera import setup_camera
    from splatam_tpu.core.gaussians import GaussianMap
    from splatam_tpu.render.api import RenderConfig
    from splatam_tpu.render.binning import grid_shape
    from splatam_tpu.render.naive import T_EPS
    from splatam_tpu.render.pallas import fused_iso as FI
    from splatam_tpu.render.pallas.composite_pallas import (
        C, PIX, _accurate_log, _col_to_row, _lane_idx, _lane_matmul,
        _pix_cols, _post_chunk_t, _tri_lanes,
    )
    from splatam_tpu.render.projection import TILE
    from splatam_tpu.slam import steps

    n, h, w = args.n, args.h, args.w
    rng = np.random.default_rng(0)
    pts = rng.uniform([-3, -2, 0.5], [3, 2, 6.5], (n, 3)).astype(np.float32)
    gm = GaussianMap(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        unnorm_rotations=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        logit_opacities=jnp.full((n,), args.opacity_logit, jnp.float32),
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.004, 0.02, (n, 1))).astype(np.float32)),
        active=jnp.ones((n,), bool),
    )
    intr = np.array([[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32)
    cam = setup_camera(w, h, intr, None)
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    rcfg = RenderConfig(pair_cap=args.pair_cap)
    ps = jax.jit(lambda: steps.loss_pair_structure(
        gm, q, t, cam, rcfg, with_world16=True))()
    assert ps.world8 is not None
    grid_x, grid_y = grid_shape(w, h)
    num_tiles = grid_x * grid_y
    geom = FI._geom_for(cam)
    pose_vec = FI._pose_vec_from(
        jnp.eye(3, dtype=jnp.float32), t, geom, FI._default_intr(geom))
    world8 = ps.world8
    pad_start, lens = ps.pad_start, ps.lens
    print(f"pairs={int(ps.bins.n_pairs)} tiles={num_tiles} "
          f"chunks={int(np.ceil(np.asarray(lens) / C).sum())} "
          f"opacity_logit={args.opacity_logit}")

    def timed(name, fn, w8_, pv_):
        @jax.jit
        def run(w8_, pv_):
            def body(i, carry):
                acc, pv_i = carry
                out = fn(w8_, pv_i + acc * 1e-30)
                return (acc + jnp.sum(out[0].astype(jnp.float32)) * 1e-20
                        + jnp.float32(i) * 1e-12, pv_i)
            acc, _ = jax.lax.fori_loop(0, args.iters, body,
                                       (jnp.float32(0), pv_))
            return acc

        jax.block_until_ready(run(w8_, pv_))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(w8_, pv_))
            ts.append((time.perf_counter() - t0) / args.iters)
        print(f"{name:<10s} {float(np.median(ts)) * 1e3:8.2f} ms/iter",
              flush=True)

    def full(w8_, pv_):
        return FI.fused_forward_pallas(
            w8_, pv_, pad_start, lens, grid_x, num_tiles, w, h)

    # ------------------------------------------------------------------
    # Two-chunk unrolled forward.
    # ------------------------------------------------------------------
    def _fwd2_kernel(width, height, pad_start_ref, lens_ref, pose_ref,
                     attrs_hbm, out_ref, scratch, sem):
        tl = pl.program_id(0)
        s = pad_start_ref[tl]
        num = lens_ref[tl]
        ty = tl // grid_x
        tx = tl - ty * grid_x
        ox = (tx * TILE).astype(jnp.float32)
        oy = (ty * TILE).astype(jnp.float32)
        pxc, pyc = _pix_cols()
        lane_idx = _lane_idx()
        ltri = _tri_lanes(suffix=False)
        n_chunks = pl.cdiv(num, C)
        n_steps = pl.cdiv(n_chunks, 2)

        def chunk_dma(i):
            slot = jax.lax.rem(i, 4)
            return pltpu.make_async_copy(
                attrs_hbm.at[:, pl.ds(pl.multiple_of(s + i * C, C), C)],
                scratch.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            chunk_dma(0).start()

        @pl.when(n_chunks > 1)
        def _():
            chunk_dma(1).start()

        def indep(i):
            """Carry-independent prefix of one chunk."""
            a = scratch[jax.lax.rem(i, 4), :, :]
            p = FI._project_rows(a, pose_ref, width, height)
            qd = FI._alpha_rows(p, i * C, num, ox, oy, pxc, pyc, lane_idx)
            ae = jnp.where(qd["skip"], 0.0, qd["alpha"])
            om = 1.0 - ae
            lg = _accurate_log(om)
            lgcum = _lane_matmul(lg, ltri)
            cpe = jnp.exp(lgcum - lg)
            # Gate chan against the never-DMA'd slot of a tail step: the
            # uninitialized scratch could hold NaN, and 0-weight columns do
            # not mask NaN through the MXU contraction.
            valid = i < n_chunks
            chan = jnp.where(
                valid,
                jnp.concatenate([a[5:8, :], p["tz"], p["tz"] * p["tz"]], 0),
                0.0,
            )
            return qd, om, cpe, chan

        def coupled(i, qd, om, cpe, chan, t_col, done_col, nc_col, acc):
            t_before = t_col * cpe
            u = t_before * om
            live = done_col < 0.5
            applied = (~qd["skip"]) & live & (u >= T_EPS)
            weight = jnp.where(applied, qd["alpha"] * t_before, 0.0)
            acc = acc + jax.lax.dot_general(
                chan, weight, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            kplus = jnp.where(
                applied, (lane_idx + i * C + 1).astype(jnp.float32), 0.0)
            nc_col = jnp.maximum(nc_col, jnp.max(kplus, axis=1, keepdims=True))
            t_col, done_col = _post_chunk_t(
                qd["skip"], live, u, t_before, t_col, done_col,
                cpe[:, C - 1:C] * om[:, C - 1:C])
            return t_col, done_col, nc_col, acc

        def cond(carry):
            cursor, *_ = carry
            return cursor < n_steps

        def body(carry):
            cursor, done_steps, t_col, done_col, nc_col, acc = carry
            i0 = 2 * done_steps
            i1 = i0 + 1

            @pl.when(i0 + 2 < n_chunks)
            def _():
                chunk_dma(i0 + 2).start()

            @pl.when(i0 + 3 < n_chunks)
            def _():
                chunk_dma(i0 + 3).start()

            chunk_dma(i0).wait()

            @pl.when(i1 < n_chunks)
            def _():
                chunk_dma(i1).wait()

            # Both carry-independent prefixes issued back-to-back: chunk
            # i1's VPU work hides under chunk i0's MXU/exp latency.
            qd0, om0, cpe0, chan0 = indep(i0)
            qd1, om1, cpe1, chan1 = indep(i1)
            t_col, done_col, nc_col, acc = coupled(
                i0, qd0, om0, cpe0, chan0, t_col, done_col, nc_col, acc)
            t_col, done_col, nc_col, acc = coupled(
                i1, qd1, om1, cpe1, chan1, t_col, done_col, nc_col, acc)
            all_done = jnp.min(done_col) > 0.5
            cursor = jnp.where(all_done, n_steps, done_steps + 1)
            return (cursor, done_steps + 1, t_col, done_col, nc_col, acc)

        carry0 = (jnp.int32(0), jnp.int32(0), jnp.ones((PIX, 1), jnp.float32),
                  jnp.zeros((PIX, 1), jnp.float32),
                  jnp.zeros((PIX, 1), jnp.float32),
                  jnp.zeros((FI.CH, PIX), jnp.float32))
        (_, done_steps, t_col, _, nc_col, acc) = jax.lax.while_loop(
            cond, body, carry0)

        # Drain in-flight prefetches after an early exit.
        for d in (0, 1):
            @pl.when(2 * done_steps + d < n_chunks)
            def _(d=d):
                chunk_dma(2 * done_steps + d).wait()

        out_ref[0, :FI.CH, :] = acc
        out_ref[0, FI.CH:FI.CH + 1, :] = 1.0 - _col_to_row(t_col)
        out_ref[0, FI.CH + 1:FI.CH + 2, :] = _col_to_row(nc_col)

    def fwd2(w8_, pv_):
        kernel = functools.partial(_fwd2_kernel, float(w), float(h))
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(num_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, FI.CH + 2, PIX),
                                       lambda t_, *_: (t_, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((4, FI.W8, C), jnp.float32),
                                pltpu.SemaphoreType.DMA((4,))],
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles, FI.CH + 2, PIX),
                                           jnp.float32),
        )(pad_start, lens, pv_, w8_)

    # Parity first (same structure, same pose).
    ref = np.asarray(full(world8, pose_vec))
    got = np.asarray(fwd2(world8, pose_vec))
    err = np.max(np.abs(ref - got))
    print(f"parity max|diff| = {err:.3e}")
    assert err < 1e-4, "fwd2 parity failed"

    timed("full", full, world8, pose_vec)
    timed("fwd2", fwd2, world8, pose_vec)


if __name__ == "__main__":
    main()
