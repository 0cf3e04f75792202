"""Exact (gaussian, tile) alpha-cutoff culling (binning tile_cull).

The cull may only drop pairs whose minimum alpha over the tile's 16x16 pixel
box is below the 1/255 in-kernel skip (reference per-pixel rule:
/root/reference/diff-gaussian-rasterization-w-depth semantics, alpha < 1/255
contributes nothing forward or backward). The binning-level test proves the
dropped set contributes exactly zero; the render-level test allows ulp-scale
drift only, because removing zero pairs shifts survivors across the
compositor's chunk boundaries and reassociates its einsum/prod reductions
(a + 0-regrouping effect, not a contribution change).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.render import binning
from splatam_tpu.render.api import RenderConfig, render_rgbd_sil
from tests.test_render import make_cam, make_scene
from tests.test_binning_direct import _project, _tile_segments


def _aniso_scene():
    # Large anisotropic splats: tile rects span several tiles, so corner
    # tiles outside the alpha-cutoff ellipse exist to cull.
    return make_scene(n=256, seed=21, scale=0.25, anisotropic=True,
                      z_range=(1.2, 3.0))


@pytest.mark.parametrize("direct_j", [0, 2])
def test_tile_cull_drops_only_zero_pairs(direct_j):
    cam = make_cam()
    scene = _aniso_scene()
    proj, aux = _project(scene, cam)
    gx, gy = binning.grid_shape(cam.width, cam.height)
    cap = 1 << 15
    base = jax.jit(lambda p, a: binning.build_bins(
        p, a, cam.width, cam.height, cap, direct_j=direct_j))(proj, aux)
    cull = jax.jit(lambda p, a: binning.build_bins(
        p, a, cam.width, cam.height, cap, direct_j=direct_j,
        tile_cull=True))(proj, aux)
    assert int(base.overflow) == 0 and int(cull.overflow) == 0
    assert int(cull.n_pairs) < int(base.n_pairs), "cull removed nothing"
    np.testing.assert_array_equal(np.asarray(base.counts), np.asarray(cull.counts))
    np.testing.assert_array_equal(
        np.asarray(base.in_stream), np.asarray(cull.in_stream)
    )
    # Every surviving segment is a subsequence of the uncalled segment, and
    # every dropped pair's minimum alpha over its tile is below 1/255.
    segs_b = _tile_segments(base, gx * gy)
    segs_c = _tile_segments(cull, gx * gy)
    xy = np.asarray(proj.xy)
    con = np.asarray(proj.conic)
    cut = np.asarray(binning._cull_cut(proj.opacity))
    n_dropped = 0
    for t, (sb, sc) in enumerate(zip(segs_b, segs_c)):
        it = iter(sb)
        assert all(g in it for g in sc), f"tile {t}: cull reordered pairs"
        tx, ty = t % gx, t // gx
        for g in set(sb) - set(sc):
            n_dropped += 1
            px = np.arange(16) + tx * 16.0
            py = np.arange(16) + ty * 16.0
            dx = px[None, :] - xy[g, 0]
            dy = py[:, None] - xy[g, 1]
            q = con[g, 0] * dx**2 + 2 * con[g, 1] * dx * dy + con[g, 2] * dy**2
            assert q.min() > cut[g], f"tile {t} gaussian {g}: live pair culled"
    assert n_dropped == int(base.n_pairs) - int(cull.n_pairs)


@pytest.mark.parametrize("direct_j", [0, 2])
def test_tile_cull_render_bit_identical(direct_j):
    cam = make_cam()
    scene = _aniso_scene()
    base = RenderConfig(backend="tiles", pair_cap=1 << 15, tile_k_max=512,
                        direct_j=direct_j)
    ccfg = RenderConfig(backend="tiles", pair_cap=1 << 15, tile_k_max=512,
                        direct_j=direct_j, tile_cull=True)

    def loss(cfg, means, log_scales):
        out = render_rgbd_sil(
            cam, means, scene[1], scene[2], scene[3], log_scales, scene[5],
            config=cfg,
        )
        return jnp.sum(out.im) + jnp.sum(out.depth) + jnp.sum(out.silhouette), out

    f = lambda cfg: jax.value_and_grad(
        lambda m, s: loss(cfg, m, s), argnums=(0, 1), has_aux=True
    )(scene[0], scene[4])
    (l0, out0), g0 = f(base)
    (l1, out1), g1 = f(ccfg)
    np.testing.assert_allclose(
        np.asarray(out0.im), np.asarray(out1.im), atol=1e-6, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out0.depth), np.asarray(out1.depth), atol=1e-5, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out0.silhouette), np.asarray(out1.silhouette), atol=1e-6, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(g0[0]), np.asarray(g1[0]), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g0[1]), np.asarray(g1[1]), atol=1e-5, rtol=1e-5
    )
