"""Pallas TPU tile compositor (forward + analytic backward).

Replaces the XLA chunked compositor on TPU with kernels whose work is
proportional to the ACTUAL number of (gaussian, tile) pairs: the grid walks
tiles sequentially on the core, each tile streams its own 128-aligned slice
of the attribute-major pair array from HBM (contiguous DMA), and composites
its 16x16 pixels entirely on-chip.

Data orientation: PIXELS on sublanes (256), GAUSSIANS on lanes (chunks of
C=128). The sequential-compositing recurrences (transmittance cumprod,
backward affine suffix scan) run in log space as single triangular MXU
matmuls (_tri_lanes) instead of log2(C)-deep roll chains; channel
contractions are MXU dot_generals, and the only sublane<->lane transposes
are three (256,1)->(1,256) vectors per tile, done with an identity-matmul.

Per-chunk math mirrors the verified XLA compositor
(render/composite_jax.py): cumprod transmittance, prefix-or termination,
affine suffix scan in the backward. Semantics parity with renderCUDA of
diff-gaussian-rasterization-w-depth (power>0 skip, alpha<1/255 skip,
0.99 clamp, T*(1-alpha)<1e-4 termination).

Attr rows ([16, P_pad] f32):
  0 mx  1 my  2 conic_a  3 conic_b  4 conic_c  5 opacity
  6..6+CH channels, rest padding.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatam_tpu.render.naive import ALPHA_MAX, ALPHA_MIN, T_EPS
from splatam_tpu.render.projection import TILE

PIX = TILE * TILE  # 256
# Gaussians per chunk == DMA alignment. 128 = native lane width; the
# SPLATAM_CHUNK_C env override exists only for ledger experiments
# (docs/PERFORMANCE.md records the C=256 and C=64 measurements).
C = int(__import__("os").environ.get("SPLATAM_CHUNK_C", "128"))
# 16 attr rows: xy(2) conic(3) opacity(1) + up to 5 channels + pad (DMA
# slices must be sublane-multiples of 8, so 12 is not legal). The constant
# silhouette channel is NOT stored: sil == 1 - T_final exactly (telescoping
# sum of weights, early termination included), so the kernel emits it from
# the transmittance it tracks anyway — one less row in every channel
# contraction and one more free row for future channels.
ATTR_W = 16


def _pix_cols():
    """(PIX, 1) float32 local pixel coords within a tile."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    py = idx // TILE
    px = idx - py * TILE
    return px.astype(jnp.float32), py.astype(jnp.float32)


def _lane_idx():
    return jax.lax.broadcasted_iota(jnp.int32, (PIX, C), 1)


_LN2 = 0.6931471805599453
_SQRT2 = 1.4142135623730951


def _accurate_log(x):
    """f32 log to ~2 ulp. Mosaic's native log approximation has ~3.7e-4
    relative error — summed across a 128-lane log-space cumprod that would
    blow the renderer's 1e-4 parity budget (native exp is ~5e-6, fine).
    Exponent/mantissa split by bitcast, then 2*atanh((m-1)/(m+1)) series
    on m in [sqrt2/2, sqrt2]."""
    bits = pltpu.bitcast(x, jnp.int32)
    e = ((bits >> 23) & 0xFF) - 127
    m = pltpu.bitcast((bits & 0x7FFFFF) | 0x3F800000, jnp.float32)  # [1, 2)
    big = m > _SQRT2
    m = jnp.where(big, m * 0.5, m)
    e = jnp.where(big, e + 1, e)
    s = (m - 1.0) / (m + 1.0)
    s2 = s * s
    p = 2.0 / 9.0
    p = p * s2 + 2.0 / 7.0
    p = p * s2 + 2.0 / 5.0
    p = p * s2 + 2.0 / 3.0
    p = p * s2 + 2.0
    return e.astype(jnp.float32) * _LN2 + s * p


def _tri_lanes(suffix: bool):
    """(C, C) f32 triangular ones: L[j, c] = j <= c (prefix-inclusive) or
    j >= c (suffix-inclusive). One dot_general against it turns a lane-axis
    cumsum into a single MXU op — the doubling-roll scans this replaces are
    a log2(C)=7-deep dependency chain of VPU rolls, which dominated the
    per-chunk critical path."""
    jc = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    kc = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    return ((jc >= kc) if suffix else (jc <= kc)).astype(jnp.float32)


def _lane_matmul(x, tri):
    """x (PIX, C) · tri (C, C) -> (PIX, C) lane-axis running sum.

    HIGHEST precision is required: the log-space sums feed exp, so a bf16
    pass's 4e-3 relative error would exceed the renderer's parity budget."""
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _col_to_row(x):
    """(PIX, 1) -> (1, PIX) via identity matmul (sublane->lane transpose)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 1)
    eye = (r == c).astype(jnp.float32)
    return jax.lax.dot_general(
        x, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _row_to_col(x):
    """(1, PIX) -> (PIX, 1)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (PIX, PIX), 1)
    eye = (r == c).astype(jnp.float32)
    return jax.lax.dot_general(
        eye, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _post_chunk_t(skip, live, u, t_before, t_col, done_col, cp_last):
    """Post-chunk transmittance update for the forward kernels.

    A terminating pixel keeps its T at the FIRST crossing lane (u drops
    below T_EPS exactly where the previous non-skipped u — which equals
    t_before there — was still above), max-selectable since zero
    elsewhere; a live non-terminating pixel multiplies by the chunk
    product (cp_last, reconstructed by the caller from the exclusive
    cumprod); a previously-done pixel keeps t_col.

    Measured dead end (round 5, do not retry): gating the freeze block
    under an in-kernel lax.cond on "any live pixel crossed T_EPS this
    chunk" — termination almost never fires at steady state, but the
    Mosaic scf.if's vector operand/result handling cost MORE than the
    ~12 saved ops (mapping fwd 34.7 -> 36.9 ms/iter at 1.27M gaussians /
    2.6M pairs); branchless is faster."""
    term_first = (
        (~skip) & live & (u < T_EPS) & (t_before >= T_EPS)
    ).astype(jnp.float32)
    t_term = jnp.max(t_before * term_first, axis=1, keepdims=True)
    any_term = (
        live & (u[:, C - 1 : C] < T_EPS) & (t_col >= T_EPS)
    ).astype(jnp.float32)
    t_live = t_col * cp_last
    t_new = jnp.where(
        done_col > 0.5, t_col, jnp.where(any_term > 0.5, t_term, t_live)
    )
    return t_new, jnp.maximum(done_col, any_term)


def _alpha_block(a, k_base, num, ox, oy, pxc, pyc, lane_idx):
    """Per-chunk alpha quantities in (PIX, C) orientation.

    a: (16, C) attr chunk. Returns dict of (PIX, C) arrays."""
    dx = (a[0:1, :] - ox) - pxc  # (PIX, C)
    dy = (a[1:2, :] - oy) - pyc
    ca, cb, cc = a[2:3, :], a[3:4, :], a[4:5, :]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gval = jnp.exp(power)
    alpha_un = a[5:6, :] * gval
    alpha = jnp.minimum(ALPHA_MAX, alpha_un)
    in_range = (lane_idx + k_base) < num
    skip = (power > 0.0) | (alpha < ALPHA_MIN) | ~in_range
    return dict(
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, gval=gval, alpha_un=alpha_un,
        alpha=alpha, skip=skip,
    )


def _fwd_kernel(grid_x: int, ch: int, pad_start_ref, lens_ref, attrs_hbm,
                out_ref, scratch, sem):
    t = pl.program_id(0)
    s = pad_start_ref[t]
    num = lens_ref[t]

    ty = t // grid_x
    tx = t - ty * grid_x
    ox = (tx * TILE).astype(jnp.float32)
    oy = (ty * TILE).astype(jnp.float32)
    pxc, pyc = _pix_cols()
    lane_idx = _lane_idx()
    ltri = _tri_lanes(suffix=False)

    acc0 = jnp.zeros((ch, PIX), jnp.float32)
    t0 = jnp.ones((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    nc0 = jnp.zeros((PIX, 1), jnp.float32)
    n_chunks = pl.cdiv(num, C)

    def chunk_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(pl.multiple_of(s + i * C, C), C)],
            scratch.at[slot],
            sem.at[slot],
        )

    # Double buffering: chunk i+1 streams in while chunk i composites.
    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(0).start()

    def cond(carry):
        cursor, *_ = carry
        return cursor < n_chunks

    def body(carry):
        cursor, processed, t_col, done_col, nc_col, acc = carry
        i = processed
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            chunk_dma(i + 1).start()

        chunk_dma(i).wait()
        a = scratch[slot, :, :]
        q = _alpha_block(a, i * C, num, ox, oy, pxc, pyc, lane_idx)

        ae = jnp.where(q["skip"], 0.0, q["alpha"])
        om = 1.0 - ae
        # Inclusive lane cumprod in log space: om in [0.01, 1] (0.99 alpha
        # clamp; skip lanes hold exactly 1.0 -> log 0), so the log-sum is
        # well-conditioned and one MXU matmul replaces the 7-roll scan.
        # Only the EXCLUSIVE cumprod is materialized full-width; the
        # inclusive cp is consumed at a single column (t_live in
        # _post_chunk_t), reconstructed there as cpe*om.
        lg = _accurate_log(om)
        lgcum = _lane_matmul(lg, ltri)
        cpe = jnp.exp(lgcum - lg)  # exclusive cumprod
        t_before = t_col * cpe
        # Transmittance u = t_col*cp is monotone non-increasing along lanes
        # (skip lanes hold om=1), so termination — the reference's
        # "T*(1-alpha) < 1e-4 -> done, this gaussian does not contribute" —
        # is simply u < T_EPS, prefix-closed with NO cummax scan: a lane
        # applies iff it is non-skipped, the pixel is live, and u >= T_EPS.
        u = t_before * om  # == t_col * cp
        live = done_col < 0.5
        applied = (~q["skip"]) & live & (u >= T_EPS)

        weight = jnp.where(applied, q["alpha"] * t_before, 0.0)  # (PIX, C)
        chan = a[6:6 + ch, :]  # (ch, C)
        acc = acc + jax.lax.dot_general(
            chan, weight, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kplus = jnp.where(applied, (lane_idx + i * C + 1).astype(jnp.float32), 0.0)
        nc_col = jnp.maximum(nc_col, jnp.max(kplus, axis=1, keepdims=True))
        t_col, done_col = _post_chunk_t(
            q["skip"], live, u, t_before, t_col, done_col,
            cpe[:, C - 1 : C] * om[:, C - 1 : C],
        )
        all_done = jnp.min(done_col) > 0.5
        cursor = jnp.where(all_done, n_chunks, i + 1)
        return (cursor, i + 1, t_col, done_col, nc_col, acc)

    _, processed, t_col, _, nc_col, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), t0, done0, nc0, acc0)
    )

    # Early exit may leave one prefetched chunk in flight; drain it.
    @pl.when(processed < n_chunks)
    def _():
        chunk_dma(processed).wait()

    out_ref[0, :ch, :] = acc
    # Row ch: silhouette == 1 - T_final (exact; see ATTR_W note). The
    # backward reconstructs T_final as 1 - sil.
    out_ref[0, ch:ch + 1, :] = 1.0 - _col_to_row(t_col)
    out_ref[0, ch + 1:ch + 2, :] = _col_to_row(nc_col)


@functools.partial(jax.jit, static_argnames=("grid_x", "num_tiles", "ch"))
def composite_forward_pallas(attrs16, pad_start, lens, grid_x, num_tiles, ch):
    """attrs16 [ATTR_W, P_pad] f32, pad_start [T+1], lens [T].

    Returns out [T, ch+2, 256]: channels, then silhouette (1 - T_final),
    then n_contrib."""
    kernel = functools.partial(_fwd_kernel, grid_x, ch)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, ch + 2, PIX), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, ATTR_W, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, ch + 2, PIX), jnp.float32),
    )(pad_start, lens, attrs16)
    return out


def _bwd_kernel(grid_x: int, ch: int, pad_start_ref, lens_ref, attrs_hbm,
                packed_hbm, dattr_out, scratch, gscratch, dscratch,
                sem, gsem, dsem):
    t = pl.program_id(0)
    s = pad_start_ref[t]
    num = lens_ref[t]

    ty = t // grid_x
    tx = t - ty * grid_x
    ox = (tx * TILE).astype(jnp.float32)
    oy = (ty * TILE).astype(jnp.float32)
    pxc, pyc = _pix_cols()
    lane_idx = _lane_idx()

    st_dma = pltpu.make_async_copy(packed_hbm.at[t], gscratch, gsem)
    st_dma.start()
    st_dma.wait()
    gacc = gscratch[0:ch, :]  # (ch, PIX) channel cotangents
    # Row ch: silhouette cotangent. The stored sil output is sum_i w_i (as
    # 1 - T_final), identical to compositing a constant-1 channel, so its
    # cotangent enters u as a lane-constant addend and needs no attr row.
    gsil_col = _row_to_col(gscratch[ch:ch + 1, :])  # (PIX, 1)
    t_final = 1.0 - _row_to_col(gscratch[ch + 1:ch + 2, :])  # (PIX, 1)
    nc_col = _row_to_col(gscratch[ch + 2:ch + 3, :])

    # No gradient flows past the deepest contributor in this tile — only
    # walk the chunks that can contain applied gaussians. (The XLA side
    # masks the un-walked, unwritten grad rows.)
    nc_max = jnp.max(gscratch[ch + 2:ch + 3, :]).astype(jnp.int32)
    n_chunks = pl.cdiv(nc_max, C)

    def chunk_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(pl.multiple_of(s + i * C, C), C)],
            scratch.at[slot],
            sem.at[slot],
        )

    def out_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            dscratch.at[slot],
            dattr_out.at[:, pl.ds(pl.multiple_of(s + i * C, C), C)],
            dsem.at[slot],
        )

    # Pixel-moment basis (1, px, py, px^2, px*py, py^2) — loop-invariant,
    # hoisted out of the chunk walk. TILE is a power of two so the integer
    # div lowers to a shift.
    jpix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    pyr = (jpix // TILE).astype(jnp.float32)
    pxr = (jpix - (jpix // TILE) * TILE).astype(jnp.float32)
    ones_row = jnp.ones((1, PIX), jnp.float32)
    bmat = jnp.concatenate(
        [ones_row, pxr, pyr, pxr * pxr, pxr * pyr, pyr * pyr], axis=0
    )  # (6, PIX)
    utri = _tri_lanes(suffix=True)

    # Double buffering (reverse walk): prefetch chunk i-1 while computing i;
    # grad writes stream out asynchronously on alternating buffers.
    @pl.when(n_chunks > 0)
    def _():
        chunk_dma(n_chunks - 1).start()

    def cond(carry):
        i, *_ = carry
        return i >= 0

    def body(carry):
        i, t_end, v_end = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            chunk_dma(i - 1).start()

        chunk_dma(i).wait()
        a = scratch[slot, :, :]
        q = _alpha_block(a, i * C, num, ox, oy, pxc, pyc, lane_idx)
        applied = ~q["skip"] & ((lane_idx + i * C + 1).astype(jnp.float32) <= nc_col)

        om = jnp.where(applied, 1.0 - q["alpha"], 1.0)
        chan = a[6:6 + ch, :]  # (ch, C)
        # u[p,c] = sum_ch chan[ch,c] gacc[ch,p] + gsil[p] (constant-1 chan)
        u = jax.lax.dot_general(
            gacc, chan, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + gsil_col  # (PIX, C)

        # The reversed affine scan v_c = om_c v_{c+1} + alpha_c u_c unrolls
        # to v_c = s_rev_c * (v_end + sum_{j>=c} b_j / s_rev_j) with
        # s_rev_c = prod_{j>=c} om_j — two suffix sums, each one MXU matmul
        # (log-space cumprod + a scaled suffix sum), replacing the 7-step
        # doubling recurrence. Conditioning: every applied lane keeps
        # transmittance >= T_EPS, so within-chunk s_rev in [1e-4, 1] and
        # b/s_rev amplifies by at most 1e4 before the s_rev_c prefactor
        # scales the summation error back down.
        bvec = jnp.where(applied, q["alpha"] * u, 0.0)
        lg = _accurate_log(om)  # om in [0.01, 1]; non-applied lanes exactly 1.0
        lgsuf = _lane_matmul(lg, utri)
        s_rev = jnp.exp(lgsuf)  # prod_{j>=c} om_j
        inv_s_rev = jnp.exp(-lgsuf)
        r = bvec * inv_s_rev
        v_inc = s_rev * (v_end + _lane_matmul(r, utri))  # (PIX, C)
        v_next = jnp.where(lane_idx < C - 1, pltpu.roll(v_inc, C - 1, 1), v_end)

        # t_end * exp(-lgsuf) == t_end / s_rev (exact for applied entries);
        # the multiply reuses the exp the r-scaling already needs, saving a
        # full-width divide per chunk.
        t_before = t_end * inv_s_rev
        weight = jnp.where(applied, q["alpha"] * t_before, 0.0)  # (PIX, C)
        # dL/dchan[ch,c] = sum_p weight[p,c] gacc[ch,p]
        dchan = jax.lax.dot_general(
            gacc, weight, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (ch, C)

        dalpha = jnp.where(applied, (u - v_next) * t_before, 0.0)
        not_clamped = q["alpha_un"] <= ALPHA_MAX
        dG = jnp.where(not_clamped, a[5:6, :] * dalpha, 0.0)
        dpower = dG * q["gval"]
        # All five xy/conic gradients and dopa are linear combinations of
        # the six pixel moments M_ij = sum_p dpower * px^i py^j (i+j <= 2):
        # dx = A - px with lane-constant A = mx - ox, so e.g.
        # sum_p dpower*dx^2 = A^2 M00 - 2A M10 + M20, and dpower already
        # carries op*gval so dopa = M00 / op. ONE MXU matmul (the moment
        # contraction) replaces five (PIX, C) products + six sublane
        # reductions.
        m6 = jax.lax.dot_general(
            bmat, dpower, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (6, C): moments against rows 1, px, py, px^2, px*py, py^2
        m0, mx, my = m6[0:1, :], m6[1:2, :], m6[2:3, :]
        mxx, mxy, myy = m6[3:4, :], m6[4:5, :], m6[5:6, :]
        av = a[0:1, :] - ox
        bv = a[1:2, :] - oy
        ca, cb, cc = q["ca"], q["cb"], q["cc"]
        s_x = av * m0 - mx
        s_y = bv * m0 - my
        s_xx = av * av * m0 - 2.0 * av * mx + mxx
        s_xy = av * bv * m0 - av * my - bv * mx + mxy
        s_yy = bv * bv * m0 - 2.0 * bv * my + myy
        dxy_x = -(ca * s_x + cb * s_y)
        dxy_y = -(cc * s_y + cb * s_x)
        dcon_a = -0.5 * s_xx
        dcon_b = -s_xy
        dcon_c = -0.5 * s_yy
        op = a[5:6, :]
        dopa = jnp.where(op > 0.0, m0 / op, 0.0)

        # Wait for the write that used this buffer two chunks ago, refill,
        # and stream it out without blocking the next chunk's compute.
        @pl.when(i + 2 <= n_chunks - 1)
        def _():
            out_dma(i + 2).wait()

        dscratch[slot, :, :] = jnp.concatenate(
            [
                dxy_x, dxy_y, dcon_a, dcon_b, dcon_c, dopa, dchan,
                jnp.zeros((ATTR_W - 6 - ch, C), jnp.float32),
            ],
            axis=0,
        )
        out_dma(i).start()

        t_end = t_end * inv_s_rev[:, 0:1]
        v_end = v_inc[:, 0:1]
        return (i - 1, t_end, v_end)

    v0 = jnp.zeros((PIX, 1), jnp.float32)
    jax.lax.while_loop(cond, body, (n_chunks - 1, t_final, v0))

    # Drain the last two in-flight grad writes.
    @pl.when(n_chunks >= 1)
    def _():
        out_dma(0).wait()

    @pl.when(n_chunks >= 2)
    def _():
        out_dma(1).wait()

    # Chunks past the deepest contributor hold REAL pairs with zero
    # gradient; the segment reducer consumes every real slot, so write the
    # zeros here (far cheaper than masking the whole pair array in XLA).
    total_chunks = pl.cdiv(num, C)

    @pl.when(n_chunks < total_chunks)
    def _():
        dscratch[0] = jnp.zeros((ATTR_W, C), jnp.float32)

        def zbody(i, carry):
            zd = pltpu.make_async_copy(
                dscratch.at[0],
                dattr_out.at[:, pl.ds(pl.multiple_of(s + i * C, C), C)],
                dsem.at[0],
            )
            zd.start()
            zd.wait()
            return carry

        jax.lax.fori_loop(n_chunks, total_chunks, zbody, 0)


@functools.partial(jax.jit, static_argnames=("grid_x", "num_tiles", "ch"))
def composite_backward_pallas(attrs16, pad_start, lens, state, g_acc, grid_x,
                              num_tiles, ch):
    """Per-pair gradients [ATTR_W, P_pad] matching the attr layout.

    g_acc carries ch+1 cotangent rows (channels + silhouette); state rows
    ch..ch+1 are (silhouette, n_contrib) from the forward. Real pair slots
    past a tile's deepest contributor are zero-filled (the segment reducer
    consumes every real slot); pad slots stay undefined (never gathered)."""
    kernel = functools.partial(_bwd_kernel, grid_x, ch)
    packed = jnp.concatenate([g_acc, state[:, ch:, :]], axis=1)  # [T, ch+3, PIX]
    dattrs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, ATTR_W, C), jnp.float32),
                pltpu.VMEM((ch + 3, PIX), jnp.float32),
                pltpu.VMEM((2, ATTR_W, C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(attrs16.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pad_start, lens, attrs16, packed)
    return dattrs


# ---------------------------------------------------------------------------
# Per-gaussian gradient reduction (segmented scan over gaussian-grouped pairs)
# ---------------------------------------------------------------------------


def _reduce_kernel(width: int, nrows: int, g_last_ref, grads_ref, gid_ref,
                   out_ref, carry):
    """Segmented inclusive prefix-sum along the pair stream.

    grads block (ATTR_W, width), gid block (1, width) non-decreasing
    segment ids; width is a multiple of C. After the scan, the LAST slot
    of every segment holds that segment's total; the caller gathers totals
    at end_slot[g] = offset[g]+count[g]-1. Other slots hold partial
    prefixes (never read). A VMEM carry threads segments across the
    sequential grid; g_last_ref[c] is the id at the previous block's last
    lane.

    The block is WIDE (default 8 chunks = 1024 lanes): the per-grid-step
    fixed cost (~1 us of carry/DMA bookkeeping) dominated the original
    one-chunk-per-step version — 3.7k steps cost ~4 ms for what is ~60 MB
    of streaming traffic. The doubling scans of all sub-chunks run as ONE
    (ATTR_W, width) vector op chain with rolls masked at 128-lane group
    boundaries, then the U-1 inter-chunk boundary folds are cheap
    lane-broadcast adds."""
    c = pl.program_id(0)
    prev_g = g_last_ref[c]

    @pl.when(c == 0)
    def _():
        carry[...] = jnp.zeros((nrows, 1), jnp.float32)

    x = grads_ref[...]  # (nrows, width)
    gl = gid_ref[...]  # (1, width)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    lane_mod = jax.lax.rem(lane, C)

    # Independent doubling scans per 128-lane sub-chunk, vectorized across
    # the whole block (cross-boundary roll contamination is masked out).
    shift = 1
    while shift < C:
        same = (gl == pltpu.roll(gl, shift, 1)) & (lane_mod >= shift)
        x = x + jnp.where(same, pltpu.roll(x, shift, 1), 0.0)
        shift *= 2

    # Sequential boundary folds: sub-chunk u inherits the open segment's
    # running total from lane u*C-1 (already folded for u-1). Masked
    # full-width adds (Mosaic has no dynamic_update_slice); the boundary
    # lane read at step u was updated by step u-1, preserving the chain.
    for u in range(1, width // C):
        b = u * C
        xb = x[:, b - 1 : b]  # (nrows, 1) running total at the boundary
        gb = gl[:, b - 1 : b]  # (1, 1) boundary segment id
        mask = ((gl == gb) & (lane >= b) & (lane < b + C)).astype(jnp.float32)
        x = x + xb * mask

    # Fold in the carry of the segment left open by the previous block
    # (its lanes are exactly the prefix with gid == prev_g).
    x = x + carry[...] * (gl == prev_g).astype(jnp.float32)
    carry[...] = x[:, width - 1 : width]
    out_ref[...] = x


def segment_reduce_scan_pallas(grads_grouped, gid_grouped):
    """Run the segmented scan; returns [nrows, P] where each segment's
    last slot holds the segment total.

    grads_grouped [nrows, P] f32 (P a multiple of 128, nrows a multiple of
    8 — the generic path scans ATTR_W=16 rows, the fused isotropic path 8),
    gid_grouped [P] int32 non-decreasing segment ids."""
    nrows, p = grads_grouped.shape
    assert p % C == 0 and nrows % 8 == 0
    width = C
    for u in (8, 4, 2):
        if p % (u * C) == 0:
            width = u * C
            break
    n_blocks = p // width
    g_last = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32),
         gid_grouped[width - 1 :: width][: n_blocks - 1]]
    )
    return pl.pallas_call(
        functools.partial(_reduce_kernel, width, nrows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((nrows, width), lambda c, *_: (0, c)),
                pl.BlockSpec((1, width), lambda c, *_: (0, c)),
            ],
            out_specs=pl.BlockSpec((nrows, width), lambda c, *_: (0, c)),
            scratch_shapes=[pltpu.VMEM((nrows, 1), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, p), jnp.float32),
    )(g_last, grads_grouped, gid_grouped.reshape(1, p))


# ---------------------------------------------------------------------------
# custom_vjp wrapper operating on per-gaussian attrs (gather/scatter in XLA)
# ---------------------------------------------------------------------------


# XLA's TPU gather runs ~4x slower per index once the table operand holds
# more than ~2^25 elements (measured on v5e: [2.77M,16]f32 gathers at
# 23.6 ns/idx vs 5.9 ns/idx for the same rows split into [2.77M,8] halves;
# the cliff follows ELEMENT COUNT — f16 at the same element count is just
# as slow, and the column-split halves overlap so 2x8 costs ~1x8). Split
# any wide row gather whose table crosses the threshold. Round-4
# recalibration with a DCE-proof harness (sum-everything consumption —
# col-0-only consumption lets XLA narrow a split gather to one column and
# fabricates 4x "speedups"): full 16-col gather at 1.8M indices costs
# 39 ms unsplit, 34.5 ms split=2, 68 ms split=4, independent of source
# layout and index locality (~1.2 ns per gathered element, throughput-
# bound). Split once below this threshold is optimal; deeper splits
# REGRESS.
_GATHER_SPLIT_ELEMS = 1 << 24


def _split_row_gather(table_rows, idx):
    """table_rows [R, W] gathered at idx -> [len(idx), W], column-split
    RECURSIVELY while the table operand sits above the slow-gather cliff
    (measured round 4 at 1.98M x 16: unsplit 39 ms, halves 10.5 ms,
    quarters 9.3 ms — the cliff follows element count, not index
    locality, so each half just under the threshold still pays ~12%)."""
    r, w = table_rows.shape
    if r * w <= _GATHER_SPLIT_ELEMS or w < 2:
        return table_rows.at[idx].get(mode="fill", fill_value=0.0)
    h = w // 2
    return jnp.concatenate(
        [
            _split_row_gather(table_rows[:, :h], idx),
            _split_row_gather(table_rows[:, h:], idx),
        ],
        axis=1,
    )


def _pack_attrs_rows(xy, conic, opacity, channels):
    """[N, 6+ch] row-major REAL attrs (row gathers are far cheaper than
    axis-1 gathers on TPU; the [ATTR_W, P_pad] kernel layout comes from one
    transpose). The ATTR_W zero-pad columns are appended AFTER the pair
    gather (_pad_cols): XLA does NOT fold gathers of in-graph zero columns
    (measured 34.6 -> 20.4 ms at 1.8M pairs by gathering 11 instead of 16),
    and the pad values are never read by the kernels anyway."""
    return jnp.concatenate([xy, conic, opacity[:, None], channels], axis=1)


def _pad_cols(rows, width=ATTR_W):
    """Append zero columns up to `width` (post-gather — see above)."""
    pad = width - rows.shape[1]
    if pad <= 0:
        return rows
    return jnp.concatenate(
        [rows, jnp.zeros((rows.shape[0], pad), jnp.float32)], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _composite_core(xy, conic, opacity, channels, pad_data, grid_x, num_tiles, ch):
    out, _ = _composite_core_fwd(
        xy, conic, opacity, channels, pad_data, grid_x, num_tiles, ch
    )
    return out


def _composite_core_fwd(xy, conic, opacity, channels, pad_data, grid_x, num_tiles, ch):
    (pad_gauss, pad_start, lens, dst, counts, in_stream, gid_sorted,
     dst_sorted) = pad_data
    attrs_rows = _pack_attrs_rows(xy, conic, opacity, channels)  # [N, 6+ch]
    padded16 = _pad_cols(_split_row_gather(attrs_rows, pad_gauss)).T
    out = composite_forward_pallas(padded16, pad_start, lens, grid_x, num_tiles, ch)
    res = (padded16, pad_start, lens, dst, counts, in_stream, gid_sorted,
           dst_sorted, out, xy.shape[0])
    # Primal includes the silhouette row (ch+1 rows total).
    return out[:, :ch + 1, :], res


def _composite_core_bwd(grid_x, num_tiles, ch, res, g_acc):
    """Per-gaussian grads without a random scatter-add.

    The [16,P_pad] -> [N,16] scatter-add used in round 1 costs ~42 ms/iter
    on the current runtime (random row scatters are ~10x slower per byte
    than streams). Instead: the precomputed gaussian-grouped permutation
    (api.pallas_layout — the grouped order equals the expansion order, so
    segment g starts at offset[g]) gathers pair grads by gaussian, a Pallas
    segmented scan leaves each segment's total at its last slot, and one
    row gather at end_slot[g] = offset[g]+count[g]-1 extracts the
    per-gaussian sums.
    """
    (padded16, pad_start, lens, dst, counts, in_stream, gid_sorted,
     dst_sorted, state, n_gauss) = res
    dattrs = composite_backward_pallas(
        padded16, pad_start, lens, state, g_acc, grid_x, num_tiles, ch
    )  # [16, P_pad]; real-but-unreached slots are zero-filled by the kernel
    pair_cap = dst.shape[0]
    real = 6 + ch  # grad rows past this are identically zero — never gather
    # them: a 16-col gather costs 1.45x an 11-col one (see _pack_attrs_rows)

    grads_grouped = _pad_cols(
        _split_row_gather(dattrs[:real].T, dst_sorted)
    ).T  # [16, pair_cap]; XLA fuses the transposes into the gathers

    scanned = segment_reduce_scan_pallas(grads_grouped, gid_sorted)

    offsets = jnp.cumsum(counts) - counts  # exclusive; exact (int32)
    end_slot = jnp.minimum(offsets + counts, pair_cap) - 1
    d_all = jnp.where(
        in_stream[:, None],
        _split_row_gather(scanned[:real].T, jnp.clip(end_slot, 0, pair_cap - 1)),
        0.0,
    )  # [n_gauss, 6+ch]
    d_xy = d_all[:, 0:2]
    d_con = d_all[:, 2:5]
    d_opa = d_all[:, 5]
    d_chan = d_all[:, 6:6 + ch]
    pd_cot = (
        np.zeros((dattrs.shape[1],), jax.dtypes.float0),  # pad_gauss
        np.zeros(pad_start.shape, jax.dtypes.float0),
        np.zeros(lens.shape, jax.dtypes.float0),
        np.zeros(dst.shape, jax.dtypes.float0),
        np.zeros(counts.shape, jax.dtypes.float0),
        np.zeros(in_stream.shape, jax.dtypes.float0),
        np.zeros(gid_sorted.shape, jax.dtypes.float0),
        np.zeros(dst_sorted.shape, jax.dtypes.float0),
    )
    return d_xy, d_con, d_opa, d_chan, pd_cot


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite_pairs_core(padded16, pad_start, lens, grid_x, num_tiles, ch):
    out, _ = _composite_pairs_fwd(padded16, pad_start, lens, grid_x, num_tiles, ch)
    return out


def _composite_pairs_fwd(padded16, pad_start, lens, grid_x, num_tiles, ch):
    out = composite_forward_pallas(padded16, pad_start, lens, grid_x, num_tiles, ch)
    res = (padded16, pad_start, lens, out)
    return out[:, :ch + 1, :], res


def _composite_pairs_bwd(grid_x, num_tiles, ch, res, g_acc):
    """Stops at PER-PAIR gradients [16, P_pad]: the pair-space tracking path
    (render.pairspace) contracts them into the pose through jax.vjp of
    project_pairs — no pairs->gaussian reduction. Slots past the last
    tile's padded segment are never walked by any grid step and hold
    uninitialized memory; mask them so the projection VJP's pose
    contraction (a sum over ALL slots) sees exact zeros."""
    padded16, pad_start, lens, state = res
    dattrs = composite_backward_pallas(
        padded16, pad_start, lens, state, g_acc, grid_x, num_tiles, ch
    )
    slot = jax.lax.broadcasted_iota(jnp.int32, dattrs.shape, 1)
    dattrs = jnp.where(slot < pad_start[num_tiles], dattrs, 0.0)
    return (
        dattrs,
        np.zeros(pad_start.shape, jax.dtypes.float0),
        np.zeros(lens.shape, jax.dtypes.float0),
    )


_composite_pairs_core.defvjp(_composite_pairs_fwd, _composite_pairs_bwd)


def composite_pairs(padded16, ps, width, height):
    """Composite directly from per-pair kernel attrs [ATTR_W, P_pad]
    (render.pairspace.project_pairs output). Returns [ch+1, H, W] with the
    silhouette as the last row; gradients flow to padded16 per pair."""
    from splatam_tpu.render.binning import grid_shape
    from splatam_tpu.render.composite_jax import assemble_image

    grid_x, grid_y = grid_shape(width, height)
    num_tiles = grid_x * grid_y
    ch = 5  # r, g, b, z, z^2 (fixed pair-space channel layout)
    acc = _composite_pairs_core(
        padded16, ps.pad_start, ps.lens, grid_x, num_tiles, ch
    )
    return assemble_image(acc, width, height)


def composite(xy, conic, opacity, channels, ps, width, height):
    """Pallas compositor: returns ([C+1,H,W] image, overflow=0) — the LAST
    image row is the silhouette (sum of composited weights, emitted as
    1 - T_final rather than compositing a stored constant-1 channel; its
    cotangent is exact, see _bwd_kernel). Callers not wanting it slice it
    off (the dropped row's cotangent is then zero).

    `ps` is a render.api.PairStructure whose pallas layout fields are
    populated (api.pallas_layout)."""
    from splatam_tpu.render.binning import grid_shape
    from splatam_tpu.render.composite_jax import assemble_image

    grid_x, grid_y = grid_shape(width, height)
    num_tiles = grid_x * grid_y
    ch = channels.shape[1]
    bins = ps.bins
    acc = _composite_core(
        xy, conic, opacity, channels,
        (ps.pad_gauss, ps.pad_start, ps.lens, ps.dst, bins.counts,
         bins.in_stream, ps.gid_sorted, ps.dst_sorted),
        grid_x, num_tiles, ch,
    )
    img = assemble_image(acc, width, height)
    return img, jnp.int32(0)
