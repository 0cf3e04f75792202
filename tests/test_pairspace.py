"""Pair-space tracking path: project_pairs parity vs the per-gaussian
projection + row-gather path (CPU; the Pallas compositor end of the path is
covered on hardware by tests/test_pallas_tpu.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from splatam_tpu.core.camera import Camera
from splatam_tpu.render import pairspace
from splatam_tpu.render import projection as projection_mod
from splatam_tpu.render.api import RenderConfig, _prep_gaussians
from splatam_tpu.render.pallas.composite_pallas import (
    _pack_attrs_rows, _pad_cols,
)
from splatam_tpu.slam.steps import loss_pair_structure, transform_to_frame


def _scene(n=300, seed=3):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform([-2, -2, 1.0], [2, 2, 6.0], (n, 3)),
                        jnp.float32)
    quats = jnp.asarray(rng.standard_normal((n, 4)), jnp.float32)
    logit_op = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    log_scales = jnp.asarray(rng.uniform(-3.5, -1.5, (n, 1)), jnp.float32)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    active = jnp.asarray(rng.uniform(size=n) > 0.1)
    return means, quats, logit_op, log_scales, rgb, active


class _GM:
    def __init__(self, means, quats, logit_op, log_scales, rgb, active):
        self.means3d = means
        self.unnorm_rotations = quats
        self.logit_opacities = logit_op
        self.log_scales = log_scales
        self.rgb_colors = rgb
        self.active = active
        self.isotropic = log_scales.shape[1] == 1


def _pose(seed=7):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal(4) * 0.1 + np.array([1, 0, 0, 0]),
                    jnp.float32)
    t = jnp.asarray(rng.standard_normal(3) * 0.1, jnp.float32)
    return q, t


def _cam(w=64, h=48):
    return Camera(width=w, height=h, fx=60.0, fy=60.0, cx=w / 2 - 0.5,
                  cy=h / 2 - 0.5)


def _padded_ref(gm, q, t, cam, ps):
    """Per-gaussian projection + row gather (the standard reuse path)."""
    means_cam, rots_cam = transform_to_frame(gm, q, t, False, True)
    quats, logit_op, scales = _prep_gaussians(
        rots_cam, gm.logit_opacities, gm.log_scales
    )
    proj, _ = projection_mod.project(
        means_cam, quats, logit_op, scales, gm.active, cam.w2c_array(),
        cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
    )
    opacity = jnp.where(gm.active, proj.opacity, 0.0)
    channels = jnp.concatenate(
        [gm.rgb_colors, jnp.stack([proj.depth, proj.depth**2], -1)], -1
    )
    rows = _pack_attrs_rows(proj.xy, proj.conic, opacity, channels)
    return _pad_cols(rows[ps.pad_gauss]).T


@pytest.mark.parametrize("aniso", [False, True])
def test_project_pairs_matches_gather_path(aniso):
    means, quats, logit_op, log_scales, rgb, active = _scene()
    if aniso:
        log_scales = jnp.tile(log_scales, (1, 3)) + jnp.asarray(
            np.random.default_rng(0).uniform(-0.3, 0.3, (means.shape[0], 3)),
            jnp.float32,
        )
    gm = _GM(means, quats, logit_op, log_scales, rgb, active)
    cam = _cam()
    q, t = _pose()
    rcfg = RenderConfig(backend="pallas", pair_cap=1 << 14)
    # prefer_w8=False: this test locks the GENERIC world16 pair-space path
    # (isotropic maps otherwise route to render.pallas.fused_iso, which
    # tests/test_fused_iso.py covers).
    ps = loss_pair_structure(
        gm, q, t, cam, rcfg, with_world16=True, prefer_w8=False
    )
    assert ps.world16 is not None

    ref = _padded_ref(gm, q, t, cam, ps)
    fast = pairspace.project_pairs(
        ps.world16, q, t, cam.fx, cam.fy, cam.cx, cam.cy, cam.width,
        cam.height,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)

    # Pose gradients through the pair attrs match the standard path.
    w = jnp.asarray(
        np.random.default_rng(1).standard_normal(ref.shape), jnp.float32
    )

    def loss_ref(qt):
        return jnp.sum(_padded_ref(gm, qt[0], qt[1], cam, ps) * w)

    def loss_fast(qt):
        return jnp.sum(
            pairspace.project_pairs(
                ps.world16, qt[0], qt[1], cam.fx, cam.fy, cam.cx, cam.cy,
                cam.width, cam.height,
            ) * w
        )

    gref = jax.grad(loss_ref)((q, t))
    gfast = jax.grad(loss_fast)((q, t))
    for a, b in zip(jax.tree.leaves(gref), jax.tree.leaves(gfast)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=2e-3)
