"""Tile compositor: chunk-vectorized forward + analytic backward (XLA).

Alpha compositing is sequential per pixel, but within a chunk of C
depth-ordered Gaussians the recurrences are associative and vectorize:

  * transmittance: T_c = T_in * cumprod(1 - alpha_eff) (exclusive), so a
    whole chunk's per-Gaussian transmittances come from one cumprod;
  * early termination: the reference's "stop when T*(1-a) < 1e-4" latch is
    a prefix-OR (cumsum of the terminate flags);
  * the backward suffix accumulator S_c = a_c*chan_c + (1-a_c)*S_{c+1} is
    an affine recurrence, contracted against the output cotangent first so
    it becomes a SCALAR affine recurrence per pixel, solved with
    jax.lax.associative_scan.

The outer lax.scan therefore runs K/C steps of dense [tiles, C, 256] math
(gathers batched per chunk, channel contractions on the MXU) instead of K
steps of thin row ops — this is what makes the XLA backend usable on TPU;
the Pallas backend shares the same per-pixel semantics.

Per-pixel rules match the reference CUDA rasterizer exactly: power>0 skip,
alpha<1/255 skip, 0.99 alpha clamp, T*(1-alpha) < 1e-4 early termination
(renderCUDA in diff-gaussian-rasterization-w-depth, SURVEY.md section 2.1).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from splatam_tpu.render.naive import ALPHA_MAX, ALPHA_MIN, T_EPS
from splatam_tpu.render.projection import TILE

PIX = TILE * TILE  # 256 pixels per tile
CHUNK = 32  # gaussians per vectorized chunk
_HI = jax.lax.Precision.HIGHEST


def tile_pixel_coords(width: int, height: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-tile pixel coordinates [T, 256] (x, y) as float32 numpy."""
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    ty, tx = np.mgrid[0:grid_y, 0:grid_x]
    ly, lx = np.mgrid[0:TILE, 0:TILE]
    px = tx[:, :, None, None] * TILE + lx[None, None]
    py = ty[:, :, None, None] * TILE + ly[None, None]
    t = grid_x * grid_y
    return (
        px.reshape(t, PIX).astype(np.float32),
        py.reshape(t, PIX).astype(np.float32),
    )


def _pad_k(lists: jax.Array) -> jax.Array:
    k = lists.shape[1]
    pad = (-k) % CHUNK
    if pad:
        lists = jnp.pad(lists, ((0, 0), (0, pad)))
    return lists


def _chunk_alpha(xy, conic, opacity, g, m_k, ox, oy, px_loc, py_loc):
    """Common per-chunk quantities. g: [T, C] gaussian ids.

    Returns (alpha [T,C,P], skip [T,C,P], gval, opa, dx, dy, conic columns).
    """
    g_xy = xy[g]  # [T, C, 2]
    g_con = conic[g]  # [T, C, 3]
    g_opa = opacity[g][..., None]  # [T, C, 1]

    # Tile-local coordinates keep the quadratic well-conditioned in f32.
    dx = (g_xy[..., 0:1] - ox[:, None]) - px_loc[:, None, :]  # [T, C, P]
    dy = (g_xy[..., 1:2] - oy[:, None]) - py_loc[:, None, :]
    a = g_con[..., 0:1]
    b = g_con[..., 1:2]
    c = g_con[..., 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    gval = jnp.exp(power)
    alpha_un = g_opa * gval
    alpha = jnp.minimum(ALPHA_MAX, alpha_un)
    skip = (power > 0.0) | (alpha < ALPHA_MIN) | ~m_k[..., None]
    return alpha, alpha_un, skip, gval, g_opa, dx, dy, a, b, c


def _forward_scan(xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y):
    lists = _pad_k(lists)
    t_tiles, k_max = lists.shape
    ch = channels.shape[1]
    n_chunks = k_max // CHUNK
    ox = pixf_x[:, 0:1]
    oy = pixf_y[:, 0:1]
    px_loc = pixf_x - ox
    py_loc = pixf_y - oy
    col_ids = jnp.arange(CHUNK, dtype=jnp.int32)

    def step(carry, chunk_idx):
        t_cur, done, n_contrib, acc = carry
        k0 = chunk_idx * CHUNK
        g = jax.lax.dynamic_slice(lists, (0, k0), (t_tiles, CHUNK))  # [T, C]
        m_k = (k0 + col_ids)[None, :] < lens[:, None]

        alpha, _, skip, _, _, _, _, _, _, _ = _chunk_alpha(
            xy, conic, opacity, g, m_k, ox, oy, px_loc, py_loc
        )
        ae = jnp.where(skip, 0.0, alpha)
        om = 1.0 - ae
        cp = jnp.cumprod(om, axis=1)
        cpe = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        t_before = t_cur[:, None] * cpe  # [T, C, P]
        test = t_before * om
        live = ~done[:, None]  # not terminated before this chunk
        term = ~skip & (test < T_EPS) & live
        term_before = (jnp.cumsum(term.astype(jnp.int32), axis=1) - term) > 0
        applied = ~skip & live & ~term_before & ~term

        weight = jnp.where(applied, alpha * t_before, 0.0)  # [T, C, P]
        g_chan = channels[g]  # [T, C, Ch]
        acc = acc + jnp.einsum("tcp,tch->thp", weight, g_chan, precision=_HI)
        t_cur = t_cur * jnp.prod(jnp.where(applied, om, 1.0), axis=1)
        done = done | jnp.any(term, axis=1)
        kplus = jnp.where(applied, (k0 + col_ids + 1)[None, :, None], 0)
        n_contrib = jnp.maximum(n_contrib, jnp.max(kplus, axis=1))
        return (t_cur, done, n_contrib, acc), None

    t0 = jnp.ones((t_tiles, PIX), jnp.float32)
    done0 = jnp.zeros((t_tiles, PIX), bool)
    nc0 = jnp.zeros((t_tiles, PIX), jnp.int32)
    acc0 = jnp.zeros((t_tiles, ch, PIX), jnp.float32)
    # Only walk chunks that can contain work (dynamic bound: the padded
    # tail of the K lists costs nothing).
    n_eff = jnp.minimum((jnp.max(lens) + CHUNK - 1) // CHUNK, n_chunks)
    t_final, _, n_contrib, acc = jax.lax.fori_loop(
        0,
        n_eff,
        lambda i, c: step(c, i)[0],
        (t0, done0, nc0, acc0),
    )
    return acc, t_final, n_contrib


def _backward_scan(
    xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y, t_final, n_contrib, g_acc
):
    """Reverse chunked sweep producing cotangents for xy/conic/opacity/channels."""
    lists = _pad_k(lists)
    t_tiles, k_max = lists.shape
    n = xy.shape[0]
    ch = channels.shape[1]
    n_chunks = k_max // CHUNK
    ox = pixf_x[:, 0:1]
    oy = pixf_y[:, 0:1]
    px_loc = pixf_x - ox
    py_loc = pixf_y - oy
    col_ids = jnp.arange(CHUNK, dtype=jnp.int32)

    d_all0 = jnp.zeros((n, 6 + ch), jnp.float32)

    def step(carry, chunk_idx):
        t_end, v_end, d_all = carry
        k0 = chunk_idx * CHUNK
        g = jax.lax.dynamic_slice(lists, (0, k0), (t_tiles, CHUNK))
        m_k = (k0 + col_ids)[None, :] < lens[:, None]

        alpha, alpha_un, skip, gval, g_opa, dx, dy, a, b, c = _chunk_alpha(
            xy, conic, opacity, g, m_k, ox, oy, px_loc, py_loc
        )
        applied = ~skip & ((k0 + col_ids + 1)[None, :, None] <= n_contrib[:, None])

        om = jnp.where(applied, 1.0 - alpha, 1.0)
        # Transmittance before each gaussian: t_end / prod of later factors.
        s = jnp.cumprod(om[:, ::-1], axis=1)[:, ::-1]  # s_c = prod_{j>=c} om_j
        t_before = t_end[:, None] / s  # [T, C, P]; exact for applied entries
        weight = jnp.where(applied, alpha * t_before, 0.0)

        g_chan = channels[g]  # [T, C, Ch]
        # d L / d chan = sum_p alpha*T*g  -> [T, C, Ch]
        dchan_tc = jnp.einsum("tcp,thp->tch", weight, g_acc, precision=_HI)

        # Scalar suffix v_c = sum_ch S_c,ch * g_ch via affine recurrence
        # v_c = om_c * v_{c+1} + alpha_c * u_c (applied), else passthrough.
        u = jnp.einsum("tch,thp->tcp", g_chan, g_acc, precision=_HI)
        bvec = jnp.where(applied, alpha * u, 0.0)
        # reverse inclusive affine scan: (m, b) composition toward smaller c
        def combine(right, left):
            # scanning reversed arrays: accumulate maps going to smaller c
            m1, b1 = right
            m2, b2 = left
            return m1 * m2, m2 * b1 + b2

        mm, bb = jax.lax.associative_scan(
            combine, (om[:, ::-1], bvec[:, ::-1]), axis=1
        )
        v_inc = (mm * v_end[:, None] + bb)[:, ::-1]  # v_c inclusive
        v_next = jnp.concatenate(
            [v_inc[:, 1:], v_end[:, None]], axis=1
        )  # v_{c+1}

        dalpha = jnp.where(applied, (u - v_next) * t_before, 0.0)
        not_clamped = alpha_un <= ALPHA_MAX
        dG = jnp.where(not_clamped, g_opa * dalpha, 0.0)
        dopa_tc = jnp.sum(jnp.where(not_clamped, gval * dalpha, 0.0), axis=2)

        dpower = dG * gval
        dxy_x = jnp.sum(dpower * -(a * dx + b * dy), axis=2)
        dxy_y = jnp.sum(dpower * -(c * dy + b * dx), axis=2)
        dcon_a = jnp.sum(dpower * (-0.5 * dx * dx), axis=2)
        dcon_b = jnp.sum(dpower * (-dx * dy), axis=2)
        dcon_c = jnp.sum(dpower * (-0.5 * dy * dy), axis=2)

        gf = g.reshape(-1)
        # One fused scatter-add per chunk: [xy(2) | conic(3) | opa(1) | chan].
        rows = jnp.concatenate(
            [
                jnp.stack([dxy_x, dxy_y, dcon_a, dcon_b, dcon_c, dopa_tc], axis=-1),
                dchan_tc,
            ],
            axis=-1,
        ).reshape(-1, 6 + ch)
        d_all = d_all.at[gf].add(rows)

        t_start = t_end / s[:, 0]
        v_start = v_inc[:, 0]
        return (t_start, v_start, d_all), None

    v_end0 = jnp.zeros((t_tiles, PIX), jnp.float32)
    carry0 = (t_final, v_end0, d_all0)
    n_eff = jnp.minimum((jnp.max(lens) + CHUNK - 1) // CHUNK, n_chunks)
    # Reverse walk over only the occupied chunks.
    _, _, d_all = jax.lax.fori_loop(
        0,
        n_eff,
        lambda j, c: step(c, n_eff - 1 - j)[0],
        carry0,
    )
    d_xy = d_all[:, 0:2]
    d_con = d_all[:, 2:5]
    d_opa = d_all[:, 5]
    d_chan = d_all[:, 6:]
    return d_xy, d_con, d_opa, d_chan


@jax.custom_vjp
def composite_tiles(xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y):
    """Composite per-tile lists -> [T, C, 256] accumulator (black bg)."""
    acc, _, _ = _forward_scan(xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y)
    return acc


def _composite_fwd(xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y):
    acc, t_final, n_contrib = _forward_scan(
        xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y
    )
    res = (xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y, t_final, n_contrib)
    return acc, res


def _composite_bwd(res, g_acc):
    (xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y, t_final, n_contrib) = res
    d_xy, d_con, d_opa, d_chan = _backward_scan(
        xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y, t_final, n_contrib, g_acc
    )

    def _f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    return (
        d_xy,
        d_con,
        d_opa,
        d_chan,
        _f0(lists),
        _f0(lens),
        jnp.zeros_like(pixf_x),
        jnp.zeros_like(pixf_y),
    )


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def assemble_image(acc_tiles: jax.Array, width: int, height: int) -> jax.Array:
    """[T, C, 256] tile accumulators -> [C, H, W] image (cropped)."""
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    c = acc_tiles.shape[1]
    img = acc_tiles.reshape(grid_y, grid_x, c, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(c, grid_y * TILE, grid_x * TILE)
    return img[:, :height, :width]
