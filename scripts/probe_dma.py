"""Measure the per-chunk DMA/issue overhead share of the fused forward.

Round-5 finding: removing ~10% of the forward's full-width elementwise ops
moved nothing (docs/PERFORMANCE.md round-5 entries) — the kernel is bound
by something other than VPU issue. Candidates: (a) the 4 KB per-chunk DMA
issue/semaphore overhead, (b) the serialized per-chunk dependency chain
(log -> triangular MXU matmul -> exp). This probe times three kernels on
the SAME pair layout at bench scale:

  full     — the real fused forward (reference point)
  dma_only — identical grid/DMA walk, one add per chunk (no compositing)
  math_only— identical math on a SINGLE resident chunk (no per-chunk DMA;
             re-reads the same VMEM buffer every iteration)

dma_only ~ full  -> DMA-bound (block-fetch B chunks per copy pays)
math_only ~ full -> dependency-chain-bound (software pipelining pays)

Usage: python scripts/probe_dma.py [--n 1272155] [--pair_cap 2621440]
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
    from splatam_tpu.render.pallas import fused_iso as FI
    from splatam_tpu.render.pallas.composite_pallas import C, PIX
    from splatam_tpu.slam import steps

    n, h, w = args.n, args.h, args.w
    rng = np.random.default_rng(0)
    pts = rng.uniform([-3, -2, 0.5], [3, 2, 6.5], (n, 3)).astype(np.float32)
    gm = GaussianMap(
        means3d=jnp.asarray(pts),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        unnorm_rotations=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)),
        logit_opacities=jnp.full((n,), 1.0, jnp.float32),
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
        FI.jnp.eye(3, dtype=jnp.float32), t, geom, FI._default_intr(geom))
    world8 = ps.world8
    pad_start, lens = ps.pad_start, ps.lens
    print(f"pairs={int(ps.bins.n_pairs)} tiles={num_tiles} "
          f"chunks={int(np.ceil(np.asarray(lens) / C).sum())}")

    def timed(name, fn, *fn_args):
        @jax.jit
        def run(w8_, pv_):
            def body(i, carry):
                acc, pv_i = carry
                # Perturb an input per iteration — XLA hoists loop-invariant
                # subgraphs out of fori_loop, which silently times 1 call
                # as iters calls (docs/PERFORMANCE.md profiling gotcha).
                out = fn(w8_, pv_i + acc * 1e-30)
                return (acc + jnp.sum(out[0].astype(jnp.float32)) * 1e-20
                        + jnp.float32(i) * 1e-12, pv_i)
            acc, _ = jax.lax.fori_loop(0, args.iters, body,
                                       (jnp.float32(0), pv_))
            return acc

        jax.block_until_ready(run(*fn_args))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(*fn_args))
            ts.append((time.perf_counter() - t0) / args.iters)
        print(f"{name:<12s} {float(np.median(ts)) * 1e3:8.2f} ms/iter", flush=True)

    # ---- full forward ----------------------------------------------------
    def full(w8, pv):
        return FI.fused_forward_pallas(
            w8, pv, pad_start, lens, grid_x, num_tiles, w, h)

    timed("full", full, world8, pose_vec)

    # ---- dma_only: same walk, one op per chunk -----------------------------
    def _dma_kernel(pad_start_ref, lens_ref, pose_ref, attrs_hbm, out_ref,
                    scratch, sem):
        tl = pl.program_id(0)
        s = pad_start_ref[tl]
        num = lens_ref[tl]
        n_chunks = pl.cdiv(num, C)

        def chunk_dma(i):
            slot = jax.lax.rem(i, 2)
            return pltpu.make_async_copy(
                attrs_hbm.at[:, pl.ds(pl.multiple_of(s + i * C, C), C)],
                scratch.at[slot], sem.at[slot])

        @pl.when(n_chunks > 0)
        def _():
            chunk_dma(0).start()

        def body(i, acc):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _():
                chunk_dma(i + 1).start()

            chunk_dma(i).wait()
            return acc + scratch[slot, 0:1, :]

        acc = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((1, C), jnp.float32))
        out_ref[0, 0:1, :C] = acc

    def dma_only(w8, pv):
        return pl.pallas_call(
            _dma_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(num_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, 1, PIX), lambda t_, *_: (t_, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((2, FI.W8, C), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))],
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 1, PIX), jnp.float32),
        )(pad_start, lens, pv, w8)

    timed("dma_only", dma_only, world8, pose_vec)

    # ---- dma_bN: same walk, N chunks per async copy ------------------------
    # Lane slices must be 128-multiples, so B*C in {256, 512} is legal.
    # Tail over-read: the padded layout rounds each tile's region up to C;
    # a B-chunk copy can read past the tile's own pairs into the next
    # tile's region (or the buffer tail). For a floor PROBE that is fine —
    # the real kernel masks by `num` anyway; the buffer itself is padded
    # to pair_cap which is a multiple of 2^17, so B*C never crosses the
    # allocation end when s+i*C < num <= pair_cap - B*C slack... to be
    # safe the caller pads attrs by (B-1)*C columns.
    def make_dma_bn(B):
        def _dma_bn_kernel(pad_start_ref, lens_ref, pose_ref, attrs_hbm,
                           out_ref, scratch, sem):
            tl = pl.program_id(0)
            s = pad_start_ref[tl]
            num = lens_ref[tl]
            n_blocks = pl.cdiv(pl.cdiv(num, C), B)

            def blk_dma(i):
                slot = jax.lax.rem(i, 2)
                return pltpu.make_async_copy(
                    attrs_hbm.at[:, pl.ds(pl.multiple_of(s + i * (B * C), C),
                                          B * C)],
                    scratch.at[slot], sem.at[slot])

            @pl.when(n_blocks > 0)
            def _():
                blk_dma(0).start()

            def body(i, acc):
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < n_blocks)
                def _():
                    blk_dma(i + 1).start()

                blk_dma(i).wait()
                return acc + scratch[slot, 0:1, :C]

            acc = jax.lax.fori_loop(0, n_blocks, body,
                                    jnp.zeros((1, C), jnp.float32))
            out_ref[0, 0:1, :C] = acc

        def dma_bn(w8, pv):
            w8pad = jnp.pad(w8, ((0, 0), (0, (B - 1) * C)))
            return pl.pallas_call(
                _dma_bn_kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(num_tiles,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec((1, 1, PIX),
                                           lambda t_, *_: (t_, 0, 0),
                                           memory_space=pltpu.VMEM),
                    scratch_shapes=[pltpu.VMEM((2, FI.W8, B * C), jnp.float32),
                                    pltpu.SemaphoreType.DMA((2,))],
                ),
                out_shape=jax.ShapeDtypeStruct((num_tiles, 1, PIX),
                                               jnp.float32),
            )(pad_start, lens, pv, w8pad)

        return dma_bn

    timed("dma_b2", make_dma_bn(2), world8, pose_vec)
    timed("dma_b4", make_dma_bn(4), world8, pose_vec)

    # ---- math_only: full per-chunk math on ONE resident chunk -------------
    def _math_kernel(width, height, pad_start_ref, lens_ref, pose_ref,
                     attrs_hbm, out_ref, scratch, sem):
        from splatam_tpu.render.pallas.composite_pallas import (
            _lane_idx, _pix_cols, _post_chunk_t, _tri_lanes, _accurate_log,
            _lane_matmul, _col_to_row,
        )
        from splatam_tpu.render.naive import T_EPS
        tl = pl.program_id(0)
        s = pad_start_ref[tl]
        num = lens_ref[tl]
        ty = tl // grid_x
        tx = tl - ty * grid_x
        ox = (tx * 16).astype(jnp.float32)
        oy = (ty * 16).astype(jnp.float32)
        pxc, pyc = _pix_cols()
        lane_idx = _lane_idx()
        ltri = _tri_lanes(suffix=False)
        dma = pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(pl.multiple_of(s, C), C)],
            scratch.at[0], sem.at[0])
        dma.start()
        dma.wait()
        n_chunks = pl.cdiv(num, C)
        acc0 = jnp.zeros((FI.CH, PIX), jnp.float32)
        t0_ = jnp.ones((PIX, 1), jnp.float32)

        def body(i, carry):
            t_col, done_col, nc_col, acc = carry
            a = scratch[0, :, :]
            p = FI._project_rows(a, pose_ref, width, height)
            qd = FI._alpha_rows(p, i * C, num, ox, oy, pxc, pyc, lane_idx)
            ae = jnp.where(qd["skip"], 0.0, qd["alpha"])
            om = 1.0 - ae
            lg = _accurate_log(om)
            lgcum = _lane_matmul(lg, ltri)
            cpe = jnp.exp(lgcum - lg)
            t_before = t_col * cpe
            u = t_before * om
            live = done_col < 0.5
            applied = (~qd["skip"]) & live & (u >= T_EPS)
            weight = jnp.where(applied, qd["alpha"] * t_before, 0.0)
            chan = jnp.concatenate([a[5:8, :], p["tz"], p["tz"] * p["tz"]], 0)
            acc = acc + jax.lax.dot_general(
                chan, weight, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            kplus = jnp.where(applied, (lane_idx + i * C + 1).astype(jnp.float32), 0.0)
            nc_col = jnp.maximum(nc_col, jnp.max(kplus, axis=1, keepdims=True))
            t_col, done_col = _post_chunk_t(
                qd["skip"], live, u, t_before, t_col, done_col,
                cpe[:, C - 1:C] * om[:, C - 1:C])
            return (t_col, done_col, nc_col, acc)

        t_col, _, nc_col, acc = jax.lax.fori_loop(
            0, n_chunks, body,
            (t0_, jnp.zeros((PIX, 1), jnp.float32),
             jnp.zeros((PIX, 1), jnp.float32), acc0))
        out_ref[0, :FI.CH, :] = acc
        out_ref[0, FI.CH:FI.CH + 1, :] = 1.0 - _col_to_row(t_col)
        out_ref[0, FI.CH + 1:FI.CH + 2, :] = _col_to_row(nc_col)

    def math_only(w8, pv):
        kernel = functools.partial(_math_kernel, float(w), float(h))
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(num_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, FI.CH + 2, PIX),
                                       lambda t_, *_: (t_, 0, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((2, FI.W8, C), jnp.float32),
                                pltpu.SemaphoreType.DMA((2,))],
            ),
            out_shape=jax.ShapeDtypeStruct((num_tiles, FI.CH + 2, PIX), jnp.float32),
        )(pad_start, lens, pv, w8)

    timed("math_only", math_only, world8, pose_vec)


if __name__ == "__main__":
    main()
