"""Fused isotropic-EWA Pallas compositor: projection INSIDE the kernels.

The SLAM path runs isotropic gaussians (reference default
`gaussian_distribution: "isotropic"`, scripts/splatam.py:108-111), where the
3D covariance is s^2*I and the quaternion cancels out of the EWA math
(J W (s^2 I) W^T J^T = s^2 J J^T). That collapses the per-gaussian state a
render needs to EIGHT numbers — world mean (3), s^2, activated opacity,
rgb (3) — exactly one minimal 8-sublane DMA block, half the 16-row layout
of the generic kernels (render/pallas/composite_pallas.py).

Both kernels project per PAIR on (1, C) lane rows (a few dozen elementwise
ops per chunk — noise next to the (PIX, C) compositing math) and the
backward emits per-pair gradients IN WORLD SPACE [8, P_pad]:

  * mapping reduces them per gaussian through the same grouped
    gather/segmented-scan machinery at HALF the row width, then chains
    d(s^2) -> d(log_scales) and d(op) -> d(logit_opacities) in XLA;
  * tracking contracts pose gradients from the SAME output with two tiny
    matmuls: d_mean_cam = R d_mean_w (R orthogonal), so
    dt = R sum_p(dmw) and dR = R (dmw dot mw^T) — no per-gaussian
    reduction, no separate projection VJP pass.

Vs the generic path this deletes, per loss iteration: the O(N) XLA
projection and its VJP, the [16, P_pad] attr materialization (the fwd
gather shrinks 11 -> 8 columns and the kernels stream 8 rows instead of
16), and the pairs->pose contraction pass.

Projection math mirrors render/projection.py `project` (reference
renderCUDA preprocess: NDC pipeline of utils/recon_helpers.py:9-13,
1.3*tanfov frustum clamp, +0.3 dilation) expression by expression,
specialized to Sigma = s^2 I; compositing rules are the same
power>0 / 1-255 / 0.99 / 1e-4 set as composite_pallas.

World-8 attr rows ([8, P_pad] f32):
  0-2 mean_w xyz   3 s^2   4 opacity (sigmoid-activated, active-masked)
  5-7 rgb

Pose/camera scalars ride a [24] f32 scalar-prefetch vector:
  0-8 rowmajor R(w2c)  9-11 t  12 fx  13 fy  14 cx  15 cy  16 limx  17 limy
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splatam_tpu.render.naive import ALPHA_MAX, ALPHA_MIN, T_EPS
from splatam_tpu.render.projection import NEAR_CLIP, TILE
from splatam_tpu.render.pallas.composite_pallas import (
    C,
    PIX,
    _accurate_log,
    _col_to_row,
    _lane_idx,
    _lane_matmul,
    _pix_cols,
    _post_chunk_t,
    _row_to_col,
    _tri_lanes,
)

W8 = 8  # world attr rows == the minimum legal sublane DMA multiple
POSE_LEN = 24  # 18 used lanes, padded for alignment headroom
CH = 5  # r, g, b, z, z^2 (fixed channel layout; sil comes from T)


def pack_world8(means3d, logit_opacities, log_scales, rgb_colors, active):
    """[N, 8] isotropic world rows (differentiable in every input).

    log_scales must be [N, 1] (isotropic)."""
    n = means3d.shape[0]
    s = jnp.exp(log_scales[:, 0])
    op = jnp.where(active, jax.nn.sigmoid(logit_opacities.reshape(n)), 0.0)
    return jnp.stack(
        [
            means3d[:, 0], means3d[:, 1], means3d[:, 2],
            s * s, op,
            rgb_colors[:, 0], rgb_colors[:, 1], rgb_colors[:, 2],
        ],
        axis=1,
    )


def make_pose_vec(rmat, t, fx, fy, cx, cy, limx, limy):
    """[POSE_LEN] f32 scalar-prefetch vector for the kernels."""
    return jnp.concatenate(
        [
            rmat.reshape(9).astype(jnp.float32),
            t.reshape(3).astype(jnp.float32),
            jnp.asarray([fx, fy, cx, cy, limx, limy], jnp.float32),
            jnp.zeros((POSE_LEN - 18,), jnp.float32),
        ]
    )


def _project_rows(a, pose, width: float, height: float):
    """Isotropic EWA projection of one (8, C) chunk -> dict of (1, C) rows.

    Mirrors render/projection.py `project` with Sigma = s^2 I (so
    W Sigma W^T = s^2 I and cov2d = s^2 J J^T + 0.3 I). Keeps every
    intermediate the backward chain needs."""
    r00, r01, r02 = pose[0], pose[1], pose[2]
    r10, r11, r12 = pose[3], pose[4], pose[5]
    r20, r21, r22 = pose[6], pose[7], pose[8]
    t0, t1, t2 = pose[9], pose[10], pose[11]
    fx, fy = pose[12], pose[13]
    cx, cy = pose[14], pose[15]
    limx, limy = pose[16], pose[17]

    mwx, mwy, mwz = a[0:1, :], a[1:2, :], a[2:3, :]
    px = r00 * mwx + r01 * mwy + r02 * mwz + t0
    py = r10 * mwx + r11 * mwy + r12 * mwz + t1
    tz = r20 * mwx + r21 * mwy + r22 * mwz + t2
    in_front = tz > NEAR_CLIP
    safe_tz = jnp.where(in_front, tz, 1.0)

    p_w = 1.0 / (safe_tz + 1e-7)
    ax = 2.0 * fx / width
    bx = (width - 2.0 * cx) / width
    ay = 2.0 * fy / height
    by = (height - 2.0 * cy) / height
    x_ndc = (ax * px - bx * safe_tz) * p_w
    y_ndc = (ay * py - by * safe_tz) * p_w
    pix_x = ((x_ndc + 1.0) * width - 1.0) * 0.5
    pix_y = ((y_ndc + 1.0) * height - 1.0) * 0.5

    inv_z = 1.0 / safe_tz
    vx = px * inv_z
    vy = py * inv_z
    txtz = jnp.clip(vx, -limx, limx)
    tytz = jnp.clip(vy, -limy, limy)
    tx = txtz * safe_tz
    ty = tytz * safe_tz
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    s2 = a[3:4, :]
    c00 = s2 * (j00 * j00 + j02 * j02) + 0.3
    c01 = s2 * (j02 * j12)
    c11 = s2 * (j11 * j11 + j12 * j12) + 0.3
    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det

    return dict(
        rmat=(r00, r01, r02, r10, r11, r12, r20, r21, r22),
        fx=fx, fy=fy, ax=ax, bx=bx, ay=ay, by=by,
        limx=limx, limy=limy,
        px=px, py=py, tz=tz, in_front=in_front, safe_tz=safe_tz, p_w=p_w,
        inv_z=inv_z, inv_z2=inv_z2, vx=vx, vy=vy, txtz=txtz, tytz=tytz,
        tx=tx, ty=ty, j00=j00, j02=j02, j11=j11, j12=j12,
        s2=s2, c00=c00, c01=c01, c11=c11, det_ok=det_ok, inv_det=inv_det,
        pix_x=pix_x, pix_y=pix_y,
        conic_a=c11 * inv_det, conic_b=-c01 * inv_det, conic_c=c00 * inv_det,
        opacity=a[4:5, :],
    )


def _alpha_rows(p, k_base, num, ox, oy, pxc, pyc, lane_idx):
    """Per-chunk alpha quantities from projected rows (same rules as
    composite_pallas._alpha_block).

    The skip mask deliberately omits in_front/det_ok: binning already
    excluded behind-camera / degenerate gaussians when the pair structure
    was built, and a gaussian pushed behind the near plane by pose drift
    WITHIN a structure-reuse window composites at safe_tz=1 coordinates —
    intentionally matching render.pairspace.project_pairs' safe_tz
    semantics under stale structures (the generic reuse path behaves
    identically; rebin_every bounds the staleness)."""
    dx = (p["pix_x"] - ox) - pxc  # (PIX, C)
    dy = (p["pix_y"] - oy) - pyc
    power = (
        -0.5 * (p["conic_a"] * dx * dx + p["conic_c"] * dy * dy)
        - p["conic_b"] * dx * dy
    )
    gval = jnp.exp(power)
    alpha_un = p["opacity"] * gval
    alpha = jnp.minimum(ALPHA_MAX, alpha_un)
    in_range = (lane_idx + k_base) < num
    skip = (power > 0.0) | (alpha < ALPHA_MIN) | ~in_range
    return dict(
        dx=dx, dy=dy, gval=gval, alpha_un=alpha_un, alpha=alpha, skip=skip
    )


def _fused_fwd_kernel(grid_x: int, width: float, height: float,
                      pad_start_ref, lens_ref, pose_ref, attrs_hbm,
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

    acc0 = jnp.zeros((CH, PIX), jnp.float32)
    t0 = jnp.ones((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    nc0 = jnp.zeros((PIX, 1), jnp.float32)
    n_chunks = pl.cdiv(num, C)
    # Block fetch: TWO C-chunks per async copy. The per-chunk DMA ISSUE
    # overhead — not bandwidth — dominated the single-chunk walk
    # (scripts/probe_dma.py at 2.62M pairs: walk alone 6.8 ms/iter at B=1
    # vs 2.9 at B=2; B=4 adds nothing), so halving the copy count buys
    # ~30% of the whole forward. A tile with an odd chunk count
    # over-reads <= C lanes past its segment into the next segment or the
    # layout's tail slack (api.pallas_layout pads pad_cap by an extra C
    # for exactly this); the foreign lanes are masked by in_range below.
    n_blocks = pl.cdiv(n_chunks, 2)

    def blk_dma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(pl.multiple_of(s + i * (2 * C), C), 2 * C)],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(n_blocks > 0)
    def _():
        blk_dma(0).start()

    def chunk_step(k, a, t_col, done_col, nc_col, acc):
        """Composite one (W8, C) chunk with global chunk index k."""
        p = _project_rows(a, pose_ref, width, height)
        q = _alpha_rows(p, k * C, num, ox, oy, pxc, pyc, lane_idx)

        ae = jnp.where(q["skip"], 0.0, q["alpha"])
        om = 1.0 - ae
        lg = _accurate_log(om)
        lgcum = _lane_matmul(lg, ltri)
        # Exclusive cumprod only; the inclusive cp is consumed at a single
        # column (t_live), reconstructed there as cpe*om — one fewer
        # full-width exp per chunk.
        cpe = jnp.exp(lgcum - lg)
        t_before = t_col * cpe
        u = t_before * om
        live = done_col < 0.5
        applied = (~q["skip"]) & live & (u >= T_EPS)

        weight = jnp.where(applied, q["alpha"] * t_before, 0.0)  # (PIX, C)
        chan = jnp.concatenate(
            [a[5:8, :], p["tz"], p["tz"] * p["tz"]], axis=0
        )  # (CH, C)
        acc = acc + jax.lax.dot_general(
            chan, weight, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kplus = jnp.where(applied, (lane_idx + k * C + 1).astype(jnp.float32), 0.0)
        nc_col = jnp.maximum(nc_col, jnp.max(kplus, axis=1, keepdims=True))
        t_col, done_col = _post_chunk_t(
            q["skip"], live, u, t_before, t_col, done_col,
            cpe[:, C - 1 : C] * om[:, C - 1 : C],
        )
        return t_col, done_col, nc_col, acc

    def cond(carry):
        cursor, *_ = carry
        return cursor < n_blocks

    def body(carry):
        cursor, processed, t_col, done_col, nc_col, acc = carry
        i = processed
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_blocks)
        def _():
            blk_dma(i + 1).start()

        blk_dma(i).wait()
        t_col, done_col, nc_col, acc = chunk_step(
            2 * i, scratch[slot, :, 0:C], t_col, done_col, nc_col, acc
        )
        t_col, done_col, nc_col, acc = chunk_step(
            2 * i + 1, scratch[slot, :, C:2 * C], t_col, done_col, nc_col, acc
        )
        all_done = jnp.min(done_col) > 0.5
        cursor = jnp.where(all_done, n_blocks, i + 1)
        return (cursor, i + 1, t_col, done_col, nc_col, acc)

    _, processed, t_col, _, nc_col, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), t0, done0, nc0, acc0)
    )

    @pl.when(processed < n_blocks)
    def _():
        blk_dma(processed).wait()

    out_ref[0, :CH, :] = acc
    out_ref[0, CH:CH + 1, :] = 1.0 - _col_to_row(t_col)
    out_ref[0, CH + 1:CH + 2, :] = _col_to_row(nc_col)


@functools.partial(
    jax.jit, static_argnames=("grid_x", "num_tiles", "width", "height")
)
def fused_forward_pallas(world8, pose_vec, pad_start, lens, grid_x, num_tiles,
                         width, height):
    """world8 [W8, P_pad] f32, pose_vec [POSE_LEN] f32.

    Returns out [T, CH+2, 256]: r,g,b,z,z^2, silhouette (1 - T_final),
    n_contrib."""
    kernel = functools.partial(
        _fused_fwd_kernel, grid_x, float(width), float(height)
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, CH + 2, PIX), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, W8, 2 * C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, CH + 2, PIX), jnp.float32),
    )(pad_start, lens, pose_vec, world8)


def _fused_bwd_kernel(grid_x: int, width: float, height: float,
                      pad_start_ref, lens_ref, pose_ref, attrs_hbm,
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
    gacc = gscratch[0:CH, :]  # (CH, PIX) channel cotangents
    gsil_col = _row_to_col(gscratch[CH:CH + 1, :])  # (PIX, 1)
    t_final = 1.0 - _row_to_col(gscratch[CH + 1:CH + 2, :])
    nc_col = _row_to_col(gscratch[CH + 2:CH + 3, :])

    nc_max = jnp.max(gscratch[CH + 2:CH + 3, :]).astype(jnp.int32)
    n_chunks = pl.cdiv(nc_max, C)
    # Block fetch (see the forward): two C-chunks per input copy, reverse
    # walk by block, chunk 2j+1 composited before 2j inside block j. A
    # last block whose second chunk sits past n_chunks still computes it —
    # in_range masks every effect to zero — but its OUTPUT copy narrows to
    # C lanes (out_tail below): a 2C write there would race the NEXT
    # tile's segment writes through unordered async DMAs.
    n_blocks = pl.cdiv(n_chunks, 2)

    def blk_dma(j):
        slot = jax.lax.rem(j, 2)
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(pl.multiple_of(s + j * (2 * C), C), 2 * C)],
            scratch.at[slot],
            sem.at[slot],
        )

    def out_full(j):
        slot = jax.lax.rem(j, 2)
        return pltpu.make_async_copy(
            dscratch.at[slot],
            dattr_out.at[:, pl.ds(pl.multiple_of(s + j * (2 * C), C), 2 * C)],
            dsem.at[slot],
        )

    def out_tail(j):
        slot = jax.lax.rem(j, 2)
        return pltpu.make_async_copy(
            dscratch.at[slot, :, 0:C],
            dattr_out.at[:, pl.ds(pl.multiple_of(s + j * (2 * C), C), C)],
            dsem.at[slot],
        )

    def out_start(j):
        @pl.when(2 * j + 1 < n_chunks)
        def _():
            out_full(j).start()

        @pl.when(2 * j + 1 >= n_chunks)
        def _():
            out_tail(j).start()

    def out_wait(j):
        @pl.when(2 * j + 1 < n_chunks)
        def _():
            out_full(j).wait()

        @pl.when(2 * j + 1 >= n_chunks)
        def _():
            out_tail(j).wait()

    jpix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    pyr = (jpix // TILE).astype(jnp.float32)
    pxr = (jpix - (jpix // TILE) * TILE).astype(jnp.float32)
    ones_row = jnp.ones((1, PIX), jnp.float32)
    bmat = jnp.concatenate(
        [ones_row, pxr, pyr, pxr * pxr, pxr * pyr, pyr * pyr], axis=0
    )  # (6, PIX)
    utri = _tri_lanes(suffix=True)

    @pl.when(n_blocks > 0)
    def _():
        blk_dma(n_blocks - 1).start()

    def bwd_chunk(k, a, t_end, v_end):
        """Reverse-composite one (W8, C) chunk with global chunk index k.
        Returns (d_rows [W8, C], t_end', v_end')."""
        p = _project_rows(a, pose_ref, width, height)
        q = _alpha_rows(p, k * C, num, ox, oy, pxc, pyc, lane_idx)
        applied = ~q["skip"] & (
            (lane_idx + k * C + 1).astype(jnp.float32) <= nc_col
        )

        om = jnp.where(applied, 1.0 - q["alpha"], 1.0)
        chan = jnp.concatenate(
            [a[5:8, :], p["tz"], p["tz"] * p["tz"]], axis=0
        )  # (CH, C)
        u = jax.lax.dot_general(
            gacc, chan, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + gsil_col  # (PIX, C)

        bvec = jnp.where(applied, q["alpha"] * u, 0.0)
        lg = _accurate_log(om)
        lgsuf = _lane_matmul(lg, utri)
        s_rev = jnp.exp(lgsuf)
        inv_s_rev = jnp.exp(-lgsuf)
        r = bvec * inv_s_rev
        v_inc = s_rev * (v_end + _lane_matmul(r, utri))
        v_next = jnp.where(lane_idx < C - 1, pltpu.roll(v_inc, C - 1, 1), v_end)

        # t_end * exp(-lgsuf) == t_end / s_rev; reuses the exp r needs.
        t_before = t_end * inv_s_rev
        weight = jnp.where(applied, q["alpha"] * t_before, 0.0)
        dchan = jax.lax.dot_general(
            gacc, weight, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (CH, C)

        dalpha = jnp.where(applied, (u - v_next) * t_before, 0.0)
        not_clamped = q["alpha_un"] <= ALPHA_MAX
        dG = jnp.where(not_clamped, p["opacity"] * dalpha, 0.0)
        dpower = dG * q["gval"]
        m6 = jax.lax.dot_general(
            bmat, dpower, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (6, C)
        m0, mx, my = m6[0:1, :], m6[1:2, :], m6[2:3, :]
        mxx, mxy, myy = m6[3:4, :], m6[4:5, :], m6[5:6, :]
        av = p["pix_x"] - ox
        bv = p["pix_y"] - oy
        ca, cb, cc = p["conic_a"], p["conic_b"], p["conic_c"]
        s_x = av * m0 - mx
        s_y = bv * m0 - my
        s_xx = av * av * m0 - 2.0 * av * mx + mxx
        s_xy = av * bv * m0 - av * my - bv * mx + mxy
        s_yy = bv * bv * m0 - 2.0 * bv * my + myy
        dpix_x = -(ca * s_x + cb * s_y)
        dpix_y = -(cc * s_y + cb * s_x)
        g_a = -0.5 * s_xx  # conic cotangents
        g_b = -s_xy
        g_c = -0.5 * s_yy
        op = p["opacity"]
        dopa = jnp.where(op > 0.0, m0 / op, 0.0)

        # ---- chain: (dpix, dconic, dchan_z/z2) -> world rows ------------
        inv_det, c00, c01, c11 = p["inv_det"], p["c00"], p["c01"], p["c11"]
        d_c00 = g_c * inv_det
        d_c01 = -g_b * inv_det
        d_c11 = g_a * inv_det
        d_invdet = g_a * c11 - g_b * c01 + g_c * c00
        d_det = jnp.where(
            p["det_ok"], -d_invdet * inv_det * inv_det, 0.0
        )
        d_c00 = d_c00 + d_det * c11
        d_c11 = d_c11 + d_det * c00
        d_c01 = d_c01 - 2.0 * c01 * d_det

        j00, j02, j11, j12 = p["j00"], p["j02"], p["j11"], p["j12"]
        s2 = p["s2"]
        d_s2 = (
            d_c00 * (j00 * j00 + j02 * j02)
            + d_c01 * (j02 * j12)
            + d_c11 * (j11 * j11 + j12 * j12)
        )
        d_j00 = 2.0 * s2 * j00 * d_c00
        d_j02 = 2.0 * s2 * j02 * d_c00 + s2 * j12 * d_c01
        d_j11 = 2.0 * s2 * j11 * d_c11
        d_j12 = 2.0 * s2 * j12 * d_c11 + s2 * j02 * d_c01

        fx, fy = p["fx"], p["fy"]
        inv_z, inv_z2 = p["inv_z"], p["inv_z2"]
        tx_c, ty_c = p["tx"], p["ty"]
        d_invz = fx * d_j00 + fy * d_j11
        d_tx = -fx * inv_z2 * d_j02
        d_ty = -fy * inv_z2 * d_j12
        d_invz2 = -fx * tx_c * d_j02 - fy * ty_c * d_j12
        d_invz = d_invz + 2.0 * inv_z * d_invz2
        d_stz = -inv_z * inv_z * d_invz

        # tx = clip(px/stz) * stz (same for y); clip passes grad inside.
        txtz, tytz = p["txtz"], p["tytz"]
        vx_c, vy_c = p["vx"], p["vy"]
        d_stz = d_stz + txtz * d_tx + tytz * d_ty
        inside_x = (vx_c >= -p["limx"]) & (vx_c <= p["limx"])
        inside_y = (vy_c >= -p["limy"]) & (vy_c <= p["limy"])
        d_vx = jnp.where(inside_x, p["safe_tz"] * d_tx, 0.0)
        d_vy = jnp.where(inside_y, p["safe_tz"] * d_ty, 0.0)
        d_px = d_vx * inv_z
        d_py = d_vy * inv_z
        d_stz = d_stz - d_vx * vx_c * inv_z - d_vy * vy_c * inv_z

        # pix_x = ((x_ndc+1)*W - 1)/2, x_ndc = (ax*px - bx*stz)*p_w
        p_w = p["p_w"]
        d_xndc = dpix_x * (0.5 * width)
        d_yndc = dpix_y * (0.5 * height)
        ax, bx, ay, by = p["ax"], p["bx"], p["ay"], p["by"]
        d_px = d_px + d_xndc * ax * p_w
        d_py = d_py + d_yndc * ay * p_w
        d_stz = d_stz - (d_xndc * bx + d_yndc * by) * p_w
        d_pw = (
            d_xndc * (ax * p["px"] - bx * p["safe_tz"])
            + d_yndc * (ay * p["py"] - by * p["safe_tz"])
        )
        d_stz = d_stz - d_pw * p_w * p_w

        # z channels read raw tz; safe_tz = where(in_front, tz, 1)
        tz = p["tz"]
        d_tz = dchan[3:4, :] + 2.0 * tz * dchan[4:5, :]
        d_tz = d_tz + jnp.where(p["in_front"], d_stz, 0.0)

        # mean chain: (px,py,tz) = R mw + t  =>  d_mw = R^T (d_px,d_py,d_tz)
        r00, r01, r02, r10, r11, r12, r20, r21, r22 = p["rmat"]
        d_mwx = r00 * d_px + r10 * d_py + r20 * d_tz
        d_mwy = r01 * d_px + r11 * d_py + r21 * d_tz
        d_mwz = r02 * d_px + r12 * d_py + r22 * d_tz

        d_rows = jnp.concatenate(
            [d_mwx, d_mwy, d_mwz, d_s2, dopa, dchan[0:3, :]], axis=0
        )
        return d_rows, t_end * inv_s_rev[:, 0:1], v_inc[:, 0:1]

    def cond(carry):
        j, *_ = carry
        return j >= 0

    def body(carry):
        j, t_end, v_end = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j - 1 >= 0)
        def _():
            blk_dma(j - 1).start()

        blk_dma(j).wait()
        # Chunk 2j+1 first: the reverse recurrence (t_end/v_end) runs
        # back-to-front. When 2j+1 >= n_chunks (odd tail) every lane of
        # that chunk is masked: d1 is all-zero and t_end/v_end pass
        # through unchanged.
        d1, t_end, v_end = bwd_chunk(
            2 * j + 1, scratch[slot, :, C:2 * C], t_end, v_end
        )
        d0, t_end, v_end = bwd_chunk(
            2 * j, scratch[slot, :, 0:C], t_end, v_end
        )

        @pl.when(j + 2 <= n_blocks - 1)
        def _():
            out_wait(j + 2)

        dscratch[slot, :, C:2 * C] = d1
        dscratch[slot, :, 0:C] = d0
        out_start(j)

        return (j - 1, t_end, v_end)

    v0 = jnp.zeros((PIX, 1), jnp.float32)
    jax.lax.while_loop(cond, body, (n_blocks - 1, t_final, v0))

    @pl.when(n_blocks >= 1)
    def _():
        out_wait(0)

    @pl.when(n_blocks >= 2)
    def _():
        out_wait(1)

    total_chunks = pl.cdiv(num, C)

    @pl.when(n_chunks < total_chunks)
    def _():
        dscratch[0, :, 0:C] = jnp.zeros((W8, C), jnp.float32)

        def zbody(i, carry):
            zd = pltpu.make_async_copy(
                dscratch.at[0, :, 0:C],
                dattr_out.at[:, pl.ds(pl.multiple_of(s + i * C, C), C)],
                dsem.at[0],
            )
            zd.start()
            zd.wait()
            return carry

        jax.lax.fori_loop(n_chunks, total_chunks, zbody, 0)


@functools.partial(
    jax.jit, static_argnames=("grid_x", "num_tiles", "width", "height")
)
def fused_backward_pallas(world8, pose_vec, pad_start, lens, state, g_acc,
                          grid_x, num_tiles, width, height):
    """Per-pair WORLD-space gradients [W8, P_pad] matching the world-8
    layout. g_acc carries CH+1 cotangent rows (channels + silhouette);
    state rows CH..CH+1 are (silhouette, n_contrib) from the forward."""
    kernel = functools.partial(
        _fused_bwd_kernel, grid_x, float(width), float(height)
    )
    packed = jnp.concatenate([g_acc, state[:, CH:, :]], axis=1)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, W8, 2 * C), jnp.float32),
                pltpu.VMEM((CH + 3, PIX), jnp.float32),
                pltpu.VMEM((2, W8, 2 * C), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(world8.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(pad_start, lens, pose_vec, world8, packed)


# ---------------------------------------------------------------------------
# custom_vjp cores
# ---------------------------------------------------------------------------
# `geom` is a hashable static tuple: (grid_x, num_tiles, width, height,
# fx, fy, cx, cy, limx, limy). The pairs core (tracking) computes pose
# grads; the gauss core (mapping) statically returns zero pose cotangents —
# its pose sits behind stop_gradient, but the (3, P) contraction producing
# d_rmat/d_t would NOT be dead-code-eliminable (the cotangent is consumed
# by build_rotation's VJP before the stop_gradient zeroes it), so it is
# omitted in _fused_gauss_bwd rather than gated at runtime.


def _pose_vec_from(rmat, t, geom, intr_vec):
    """intr_vec ([6] f32: fx, fy, cx, cy, limx, limy) carries the
    intrinsics DYNAMICALLY — the row-sharded path shifts cy per shard (a
    traced value inside shard_map) and takes limy from the FULL image
    height, so they ride the pose vector, not the static geom (which keeps
    only grid/width/height). Single-chip callers build it from geom via
    _default_intr."""
    return jnp.concatenate(
        [
            rmat.reshape(9).astype(jnp.float32),
            t.reshape(3).astype(jnp.float32),
            intr_vec.astype(jnp.float32),
            jnp.zeros((POSE_LEN - 18,), jnp.float32),
        ]
    )


def _default_intr(geom):
    return jnp.asarray(geom[4:10], jnp.float32)


def _pose_grads(rmat, dattrs, mw_rows):
    """Contract per-pair world-mean grads into (dR, dt).

    d_mean_cam = R d_mean_w (R orthogonal), so dt = R sum_p(dmw) and
    dR[i, j] = sum_p dmc_i mw_j = (R dmw) mw^T — two tiny matmuls instead
    of a pairs->pose VJP pass."""
    dmw = dattrs[0:3, :]  # (3, P_pad)
    # HIGHEST precision to match the d_rmat contraction below: the default
    # can round through bf16 on TPU, and d_t sums this product over millions
    # of pair slots.
    dmc = jax.lax.dot_general(
        rmat, dmw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d_t = jnp.sum(dmc, axis=1)
    d_rmat = jax.lax.dot_general(
        dmc, mw_rows, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return d_rmat, d_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_pairs_core(world8pad, rmat, t, pad_start, lens, intr_vec, geom):
    out, _ = _fused_pairs_fwd(
        world8pad, rmat, t, pad_start, lens, intr_vec, geom
    )
    return out


def _fused_pairs_fwd(world8pad, rmat, t, pad_start, lens, intr_vec, geom):
    grid_x, num_tiles, width, height = geom[:4]
    pose_vec = _pose_vec_from(rmat, t, geom, intr_vec)
    out = fused_forward_pallas(
        world8pad, pose_vec, pad_start, lens, grid_x, num_tiles, width, height
    )
    res = (world8pad, rmat, pose_vec, pad_start, lens, out)
    return out[:, :CH + 1, :], res


def _fused_pairs_bwd(geom, res, g_acc):
    grid_x, num_tiles, width, height = geom[:4]
    world8pad, rmat, pose_vec, pad_start, lens, state = res
    dattrs = fused_backward_pallas(
        world8pad, pose_vec, pad_start, lens, state, g_acc,
        grid_x, num_tiles, width, height,
    )
    # Slots past the last tile's padded segment are never walked by any
    # grid step and hold uninitialized memory; mask them so the pose
    # contraction (a sum over ALL slots) sees exact zeros.
    slot = jax.lax.broadcasted_iota(jnp.int32, dattrs.shape, 1)
    dattrs = jnp.where(slot < pad_start[num_tiles], dattrs, 0.0)
    d_rmat, d_t = _pose_grads(rmat, dattrs, world8pad[0:3, :])
    return (
        dattrs,
        d_rmat,
        d_t,
        np.zeros(pad_start.shape, jax.dtypes.float0),
        np.zeros(lens.shape, jax.dtypes.float0),
        np.zeros((6,), jax.dtypes.float0),
    )


_fused_pairs_core.defvjp(_fused_pairs_fwd, _fused_pairs_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_gauss_core(world8_rows, rmat, t, pad_data, intr_vec, geom):
    out, _ = _fused_gauss_fwd(world8_rows, rmat, t, pad_data, intr_vec, geom)
    return out


def _fused_gauss_fwd(world8_rows, rmat, t, pad_data, intr_vec, geom):
    from splatam_tpu.render.pallas.composite_pallas import _split_row_gather

    grid_x, num_tiles, width, height = geom[:4]
    (pad_gauss, pad_start, lens, counts, in_stream, gid_sorted,
     dst_sorted) = pad_data
    pose_vec = _pose_vec_from(rmat, t, geom, intr_vec)
    world8pad = _split_row_gather(world8_rows, pad_gauss).T  # [W8, P_pad]
    out = fused_forward_pallas(
        world8pad, pose_vec, pad_start, lens, grid_x, num_tiles, width, height
    )
    res = (world8pad, rmat, pose_vec, pad_data, out, world8_rows.shape[0])
    return out[:, :CH + 1, :], res


def _fused_gauss_bwd(geom, res, g_acc):
    """Per-gaussian world grads through the grouped segmented reduction —
    the same machinery as the generic path (_composite_core_bwd) at HALF
    the row width."""
    from splatam_tpu.render.pallas.composite_pallas import (
        _split_row_gather,
        segment_reduce_scan_pallas,
    )

    grid_x, num_tiles, width, height = geom[:4]
    world8pad, rmat, pose_vec, pad_data, state, n_gauss = res
    (pad_gauss, pad_start, lens, counts, in_stream, gid_sorted,
     dst_sorted) = pad_data
    dattrs = fused_backward_pallas(
        world8pad, pose_vec, pad_start, lens, state, g_acc,
        grid_x, num_tiles, width, height,
    )  # [W8, P_pad]; real-but-unreached slots zero-filled by the kernel
    pair_cap = dst_sorted.shape[0]

    # Measured (v5e, 2.1M idx / 2.51M x 8 table): letting XLA fuse the
    # transpose into a column-split gather costs 54 ms — the column slices
    # of a transposed operand lower to strided access. Materializing the
    # transpose behind an optimization_barrier and gathering UNSPLIT runs
    # at 11.9 ms (this 8-col table is index-bound, not element-bound; the
    # 2^24 element cliff of _split_row_gather applies to wider rows).
    table = jax.lax.optimization_barrier(dattrs.T)
    grads_grouped = table.at[dst_sorted].get(
        mode="fill", fill_value=0.0
    ).T  # [W8, pair_cap]
    scanned = segment_reduce_scan_pallas(grads_grouped, gid_sorted)
    offsets = jnp.cumsum(counts) - counts
    end_slot = jnp.minimum(offsets + counts, pair_cap) - 1
    d_world8 = jnp.where(
        in_stream[:, None],
        _split_row_gather(scanned.T, jnp.clip(end_slot, 0, pair_cap - 1)),
        0.0,
    )  # [n_gauss, W8]

    # The gauss core is mapping-only: its pose always sits behind
    # stop_gradient (composite_fused_gauss appends False to geom), so pose
    # cotangents are statically zero. A bundle-adjustment mode optimizing
    # both sides would need _pose_grads on tail-masked dattrs here AND a
    # need_pose_grads plumbed through composite_fused_gauss — the pairs
    # core (_fused_pairs_bwd) shows the contraction.
    d_rmat = jnp.zeros((3, 3), jnp.float32)
    d_t = jnp.zeros((3,), jnp.float32)
    pd_cot = tuple(
        np.zeros(x.shape, jax.dtypes.float0)
        for x in (pad_gauss, pad_start, lens, counts, in_stream, gid_sorted,
                  dst_sorted)
    )
    return (d_world8, d_rmat, d_t, pd_cot, np.zeros((6,), jax.dtypes.float0))


_fused_gauss_core.defvjp(_fused_gauss_fwd, _fused_gauss_bwd)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def _geom_for(cam):
    from splatam_tpu.render.binning import grid_shape

    grid_x, grid_y = grid_shape(cam.width, cam.height)
    limx = 1.3 * (cam.width / (2.0 * cam.fx))
    limy = 1.3 * (cam.height / (2.0 * cam.fy))
    return (grid_x, grid_x * grid_y, cam.width, cam.height,
            cam.fx, cam.fy, cam.cx, cam.cy, limx, limy)


def composite_fused_pairs(world8pad, ps, cam, q, t, intr_vec=None):
    """Tracking fused render: world8pad [W8, P_pad] rebin-time constants,
    differentiable in (q, t). Returns [CH+1, H, W] (sil last).

    intr_vec ([6] f32 fx, fy, cx, cy, limx, limy) overrides cam's
    intrinsics dynamically — the row-sharded path passes its cy-shifted
    center and full-image frustum limits while cam carries the LOCAL row
    block's height."""
    from splatam_tpu.core.transforms import build_rotation, normalize
    from splatam_tpu.render.composite_jax import assemble_image

    geom = _geom_for(cam)
    if intr_vec is None:
        intr_vec = _default_intr(geom)
    rmat = build_rotation(normalize(q)[None])[0]
    acc = _fused_pairs_core(
        world8pad, rmat, t, ps.pad_start, ps.lens, intr_vec, geom
    )
    return assemble_image(acc, cam.width, cam.height)


def composite_fused_gauss(means3d, logit_opacities, log_scales, rgb_colors,
                          active, ps, cam, q, t, intr_vec=None):
    """Mapping fused render: differentiable in the gaussian params (pose
    enters via stop_gradient upstream). Returns [CH+1, H, W] (sil last).
    intr_vec as in composite_fused_pairs (row-sharded dynamic override)."""
    from splatam_tpu.core.transforms import build_rotation, normalize
    from splatam_tpu.render.composite_jax import assemble_image

    world8_rows = pack_world8(
        means3d, logit_opacities, log_scales, rgb_colors, active
    )
    rmat = build_rotation(normalize(q)[None])[0]
    bins = ps.bins
    pad_data = (ps.pad_gauss, ps.pad_start, ps.lens, bins.counts,
                bins.in_stream, ps.gid_sorted, ps.dst_sorted)
    geom = _geom_for(cam)  # mapping: pose frozen, gauss core emits zero pose grads
    if intr_vec is None:
        intr_vec = _default_intr(geom)
    acc = _fused_gauss_core(world8_rows, rmat, t, pad_data, intr_vec, geom)
    return assemble_image(acc, cam.width, cam.height)
