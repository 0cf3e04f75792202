"""J-slot direct pair expansion (binning.build_bins direct_j) parity.

The direct path must produce the same sorted (tile, depth) pair stream as
the classic spread path — identical per-tile segments, identical images and
gradients through the full render — while only the j >= J tail can overflow.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.render import binning
from splatam_tpu.render import projection as projection_mod
from splatam_tpu.render.api import RenderConfig, render_rgbd_sil
from tests.test_render import make_cam, make_scene


def _project(scene, cam):
    means, colors, quats, logit_op, log_scales, active = scene
    if log_scales.shape[1] == 1:
        log_scales = jnp.tile(log_scales, (1, 3))
    scales = jnp.exp(log_scales)
    q = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    return projection_mod.project(
        means, q, logit_op, scales, active, cam.w2c_array(),
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )


def _tile_segments(bins, num_tiles):
    """Per-tile pair lists as python lists of gaussian ids."""
    pg = np.asarray(bins.pair_gauss)
    ts = np.asarray(bins.tile_start)
    return [list(pg[ts[t]:ts[t + 1]]) for t in range(num_tiles)]


@pytest.mark.parametrize("J", [1, 2, 4])
@pytest.mark.parametrize("aniso", [False, True])
def test_direct_matches_classic_segments(J, aniso):
    cam = make_cam()
    scene = make_scene(n=300, seed=3, anisotropic=aniso)
    proj, aux = _project(scene, cam)
    gx, gy = binning.grid_shape(cam.width, cam.height)
    cap = 1 << 14
    classic = jax.jit(
        lambda p, a: binning.build_bins(p, a, cam.width, cam.height, cap)
    )(proj, aux)
    direct = jax.jit(
        lambda p, a: binning.build_bins(
            p, a, cam.width, cam.height, cap, direct_j=J
        )
    )(proj, aux)
    assert int(classic.overflow) == 0 and int(direct.overflow) == 0
    assert int(classic.n_pairs) == int(direct.n_pairs)
    np.testing.assert_array_equal(
        np.asarray(classic.counts), np.asarray(direct.counts)
    )
    np.testing.assert_array_equal(
        np.asarray(classic.in_stream), np.asarray(direct.in_stream)
    )
    segs_c = _tile_segments(classic, gx * gy)
    segs_d = _tile_segments(direct, gx * gy)
    for t, (sc, sd) in enumerate(zip(segs_c, segs_d)):
        # Same pairs per tile; depth order may tie-break differently only
        # for equal quantized depths (none in this random scene).
        assert sc == sd, f"tile {t}: {sc} != {sd}"


def test_direct_render_image_parity():
    cam = make_cam()
    scene = make_scene(n=300, seed=5)
    base = RenderConfig(backend="tiles", pair_cap=1 << 14, tile_k_max=256)
    dcfg = RenderConfig(backend="tiles", pair_cap=1 << 14, tile_k_max=256, direct_j=2)

    def loss(cfg, means):
        out = render_rgbd_sil(cam, means, *scene[1:], config=cfg)
        return jnp.sum(out.im) + jnp.sum(out.depth), out

    (l0, out0), g0 = jax.value_and_grad(lambda m: loss(base, m), has_aux=True)(scene[0])
    (l1, out1), g1 = jax.value_and_grad(lambda m: loss(dcfg, m), has_aux=True)(scene[0])
    np.testing.assert_allclose(np.asarray(out0.im), np.asarray(out1.im), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out0.depth), np.asarray(out1.depth), atol=1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), atol=1e-6)


def test_direct_fallback_when_cap_too_small():
    """pair_cap < J*N + 4096 silently uses the classic path."""
    cam = make_cam()
    scene = make_scene(n=300, seed=7)
    proj, aux = _project(scene, cam)
    cap = 1 << 12  # 4096 < 2*300 + 4096
    classic = binning.build_bins(proj, aux, cam.width, cam.height, cap)
    direct = binning.build_bins(
        proj, aux, cam.width, cam.height, cap, direct_j=8192
    )
    np.testing.assert_array_equal(
        np.asarray(classic.pair_gauss), np.asarray(direct.pair_gauss)
    )


def test_direct_tail_overflow_only():
    """With a pair_cap that the classic path overflows, the direct path only
    drops j >= J tail pairs: overflow is strictly smaller and every visible
    gaussian stays in-stream."""
    cam = make_cam(w=64, h=48)
    # Big opaque splats -> large rects -> many pairs per gaussian.
    scene = make_scene(n=512, seed=11, scale=0.8, opacity=4.0, z_range=(1.0, 2.0))
    proj, aux = _project(scene, cam)
    counts = np.asarray(jnp.where(aux.visible, aux.rect_wh[:, 0] * aux.rect_wh[:, 1], 0))
    total = int(counts.sum())
    cap = 512 * 2 + 4096  # fits J*N + minimum tail
    assert total > cap, "scene must overflow for this test"
    classic = binning.build_bins(proj, aux, cam.width, cam.height, cap)
    direct = binning.build_bins(proj, aux, cam.width, cam.height, cap, direct_j=2)
    # Classic truncation un-streams whole gaussians; direct keeps every
    # visible gaussian's first J pairs in stream no matter the overflow.
    assert not bool(np.asarray(classic.in_stream).all())
    np.testing.assert_array_equal(
        np.asarray(direct.in_stream), counts > 0
    )
    # Dropped pairs never exceed the j >= 2 tail.
    tail = int(np.maximum(counts - 2, 0).sum())
    assert int(direct.overflow) <= tail
