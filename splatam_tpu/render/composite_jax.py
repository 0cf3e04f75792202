"""Tile compositor with hand-written analytic backward (pure JAX/XLA).

Forward: one lax.scan over per-tile Gaussian list columns, vectorized over
all tiles x 256 pixels. Backward: custom_vjp reverse sweep re-walking the
lists back-to-front (Inria-style suffix recomputation) so no per-step
residuals are stored — only the final transmittance and per-pixel
contributor counts survive the forward pass.

Per-pixel semantics match the reference CUDA rasterizer exactly:
power>0 skip, alpha<1/255 skip, alpha clamp at 0.99,
T*(1-alpha) < 1e-4 early termination (renderCUDA in
diff-gaussian-rasterization-w-depth, see SURVEY.md section 2.1).

This backend is the semantic twin of the Pallas kernels in
splatam_tpu/render/pallas/ and the oracle-checked fallback for CPU meshes.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from splatam_tpu.render.naive import ALPHA_MAX, ALPHA_MIN, T_EPS
from splatam_tpu.render.projection import TILE

PIX = TILE * TILE  # 256 pixels per tile


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


def _gather_cols(arr, g):
    """arr [N, ...] indexed by g [T] -> [T, ...]."""
    return arr[g]


def _forward_scan(xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y):
    t_tiles, k_max = lists.shape
    c = channels.shape[1]

    def step(carry, inputs):
        t_cur, done, n_contrib, acc = carry
        k, g = inputs
        m_k = (k < lens)[:, None]  # [T, 1]
        g_xy = _gather_cols(xy, g)  # [T, 2]
        g_con = _gather_cols(conic, g)  # [T, 3]
        g_opa = _gather_cols(opacity, g)[:, None]  # [T, 1]
        g_chan = _gather_cols(channels, g)  # [T, C]

        dx = g_xy[:, 0:1] - pixf_x  # [T, PIX]
        dy = g_xy[:, 1:2] - pixf_y
        power = (
            -0.5 * (g_con[:, 0:1] * dx * dx + g_con[:, 2:3] * dy * dy)
            - g_con[:, 1:2] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, g_opa * jnp.exp(power))
        consider = m_k & (power <= 0.0) & (alpha >= ALPHA_MIN) & ~done
        test_t = t_cur * (1.0 - alpha)
        terminate = consider & (test_t < T_EPS)
        apply = consider & ~terminate

        w = jnp.where(apply, alpha * t_cur, 0.0)  # [T, PIX]
        acc = acc + g_chan[:, :, None] * w[:, None, :]
        t_cur = jnp.where(apply, test_t, t_cur)
        done = done | terminate
        n_contrib = jnp.where(apply, k + 1, n_contrib)
        return (t_cur, done, n_contrib, acc), None

    t0 = jnp.ones((t_tiles, PIX), jnp.float32)
    done0 = jnp.zeros((t_tiles, PIX), bool)
    nc0 = jnp.zeros((t_tiles, PIX), jnp.int32)
    acc0 = jnp.zeros((t_tiles, c, PIX), jnp.float32)
    ks = jnp.arange(k_max, dtype=jnp.int32)
    (t_final, _, n_contrib, acc), _ = jax.lax.scan(
        step, (t0, done0, nc0, acc0), (ks, lists.T)
    )
    return acc, t_final, n_contrib


def _backward_scan(
    xy, conic, opacity, channels, lists, lens, pixf_x, pixf_y, t_final, n_contrib, g_acc
):
    """Reverse sweep producing cotangents for xy/conic/opacity/channels.

    g_acc: [T, C, PIX] cotangent of the composited tile accumulator.
    """
    n = xy.shape[0]
    c = channels.shape[1]
    k_max = lists.shape[1]

    d_xy = jnp.zeros((n, 2), jnp.float32)
    d_con = jnp.zeros((n, 3), jnp.float32)
    d_opa = jnp.zeros((n,), jnp.float32)
    d_chan = jnp.zeros((n, c), jnp.float32)

    def step(carry, inputs):
        t_cur, suffix, d_xy, d_con, d_opa, d_chan = carry
        k, g = inputs
        m_k = (k < lens)[:, None]
        g_xy = _gather_cols(xy, g)
        g_con = _gather_cols(conic, g)
        g_opa = _gather_cols(opacity, g)[:, None]
        g_chan = _gather_cols(channels, g)

        dx = g_xy[:, 0:1] - pixf_x
        dy = g_xy[:, 1:2] - pixf_y
        power = (
            -0.5 * (g_con[:, 0:1] * dx * dx + g_con[:, 2:3] * dy * dy)
            - g_con[:, 1:2] * dx * dy
        )
        gval = jnp.exp(power)
        alpha_un = g_opa * gval
        alpha = jnp.minimum(ALPHA_MAX, alpha_un)
        applied = m_k & (power <= 0.0) & (alpha >= ALPHA_MIN) & (k < n_contrib)

        # Transmittance *before* this gaussian (undo its application).
        t_i = jnp.where(applied, t_cur / (1.0 - alpha), t_cur)

        w = jnp.where(applied, alpha * t_i, 0.0)  # [T, PIX]
        # d L / d channel_c = sum_pix alpha*T*g_c
        dchan_tk = jnp.einsum("tp,tcp->tc", w, g_acc)

        # d L / d alpha = sum_c (chan_c - suffix_c) * T * g_c
        diff = g_chan[:, :, None] - suffix  # [T, C, PIX]
        dalpha = jnp.einsum("tcp,tcp->tp", diff, g_acc) * t_i
        dalpha = jnp.where(applied, dalpha, 0.0)

        not_clamped = alpha_un <= ALPHA_MAX
        dG = jnp.where(not_clamped, g_opa * dalpha, 0.0)
        dopa_tk = jnp.sum(jnp.where(not_clamped, gval * dalpha, 0.0), axis=1)

        dpower = dG * gval
        dxy_x = jnp.sum(dpower * -(g_con[:, 0:1] * dx + g_con[:, 1:2] * dy), axis=1)
        dxy_y = jnp.sum(dpower * -(g_con[:, 2:3] * dy + g_con[:, 1:2] * dx), axis=1)
        dcon_a = jnp.sum(dpower * (-0.5 * dx * dx), axis=1)
        dcon_b = jnp.sum(dpower * (-dx * dy), axis=1)
        dcon_c = jnp.sum(dpower * (-0.5 * dy * dy), axis=1)

        # Update suffix composite and transmittance for the next (nearer) one.
        suffix = jnp.where(
            applied[:, None, :],
            alpha[:, None, :] * g_chan[:, :, None] + (1.0 - alpha[:, None, :]) * suffix,
            suffix,
        )
        t_cur = t_i

        d_xy = d_xy.at[g].add(jnp.stack([dxy_x, dxy_y], axis=-1))
        d_con = d_con.at[g].add(jnp.stack([dcon_a, dcon_b, dcon_c], axis=-1))
        d_opa = d_opa.at[g].add(dopa_tk)
        d_chan = d_chan.at[g].add(dchan_tk)
        return (t_cur, suffix, d_xy, d_con, d_opa, d_chan), None

    t_tiles = lists.shape[0]
    suffix0 = jnp.zeros((t_tiles, c, PIX), jnp.float32)
    ks = jnp.arange(k_max, dtype=jnp.int32)
    (_, _, d_xy, d_con, d_opa, d_chan), _ = jax.lax.scan(
        step,
        (t_final, suffix0, d_xy, d_con, d_opa, d_chan),
        (ks, lists.T),
        reverse=True,
    )
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
