"""Naive ground-truth compositor: O(N_gaussians x H x W), fully jax.grad-able.

Evaluates every Gaussian against every pixel in exact depth order with the
reference rasterizer's per-pixel rules (power>0 skip, alpha<1/255 skip,
0.99 alpha clamp, T*(1-alpha)<1e-4 early termination, tile-rectangle
membership). This is the semantic oracle the tiled/Pallas backends are tested
against — both forward values and jax.grad gradients.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatam_tpu.render.projection import TILE, Projected, ProjectedAux

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def composite_naive(
    proj: Projected,
    aux: ProjectedAux,
    channels: jax.Array,  # [N, C]
    width: int,
    height: int,
) -> jax.Array:
    """Returns the composited image [C, H, W] (black background)."""
    n, c = channels.shape

    order_key = jnp.where(aux.visible, proj.depth, jnp.inf)
    order = jnp.argsort(order_key, stable=True)

    xy = proj.xy[order]
    conic = proj.conic[order]
    opacity = proj.opacity[order]
    chan = channels[order]
    rect_min = aux.rect_min[order]
    rect_wh = aux.rect_wh[order]
    visible = aux.visible[order]

    ys, xs = jnp.mgrid[0:height, 0:width]
    pixf_x = xs.astype(channels.dtype)
    pixf_y = ys.astype(channels.dtype)
    tile_x = xs // TILE
    tile_y = ys // TILE

    def step(carry, g):
        t_cur, done, acc = carry
        g_xy, g_conic, g_opa, g_chan, g_rmin, g_rwh, g_vis = g

        in_rect = (
            (tile_x >= g_rmin[0])
            & (tile_x < g_rmin[0] + g_rwh[0])
            & (tile_y >= g_rmin[1])
            & (tile_y < g_rmin[1] + g_rwh[1])
        )
        dx = g_xy[0] - pixf_x
        dy = g_xy[1] - pixf_y
        power = -0.5 * (g_conic[0] * dx * dx + g_conic[2] * dy * dy) - g_conic[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, g_opa * jnp.exp(power))
        consider = g_vis & in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN) & ~done
        test_t = t_cur * (1.0 - alpha)
        terminate = consider & (test_t < T_EPS)
        apply = consider & ~terminate

        w = jnp.where(apply, alpha * t_cur, 0.0)
        acc = acc + g_chan[:, None, None] * w[None]
        t_cur = jnp.where(apply, test_t, t_cur)
        done = done | terminate
        return (t_cur, done, acc), None

    dtype = channels.dtype
    t0 = jnp.ones((height, width), dtype)
    done0 = jnp.zeros((height, width), bool)
    acc0 = jnp.zeros((c, height, width), dtype)
    (t_final, _, acc), _ = jax.lax.scan(
        step, (t0, done0, acc0), (xy, conic, opacity, chan, rect_min, rect_wh, visible)
    )
    del t_final  # black background: out = acc + T * 0
    return acc
