"""Pallas kernel parity on CPU via the TPU interpreter.

tests/test_pallas_tpu.py closes the tiles == pallas chain only on real
hardware, so a kernel regression used to surface as a driver-bench failure
rather than a test failure. pltpu.force_tpu_interpret_mode() runs the same
Mosaic kernels (DMA, semaphores, bitcasts and all) under the interpreter on
CPU — slow, hence tiny shapes + the slow mark, but it runs everywhere.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from splatam_tpu.core.camera import Camera
from splatam_tpu.render.api import RenderConfig, render_gaussians

if jax.default_backend() == "tpu":
    pytest.skip("interpret-mode coverage is for CPU runs", allow_module_level=True)

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
CFG_T = RenderConfig(backend="tiles", pair_cap=1 << 12, tile_k_max=512)
CFG_P = RenderConfig(backend="pallas", pair_cap=1 << 12, tile_k_max=512)


def _scene(n=512, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n), rng.uniform(1.5, 5, n)], -1
    ).astype(np.float32)
    return [
        jnp.asarray(x)
        for x in (
            means,
            rng.uniform(0, 1, (n, 3)).astype(np.float32),
            rng.normal(size=(n, 4)).astype(np.float32),
            rng.normal(1.0, 0.5, n).astype(np.float32),
            np.log(rng.uniform(0.01, 0.08, (n, 3))).astype(np.float32),
            np.ones(n, bool),
        )
    ]


def test_pallas_interpret_forward_matches_tiles():
    scene = _scene()
    img_t = np.asarray(
        jax.jit(lambda *a: render_gaussians(CAM, *a, config=CFG_T)[0])(*scene)
    )
    with pltpu.force_tpu_interpret_mode():
        img_p = np.asarray(
            jax.jit(lambda *a: render_gaussians(CAM, *a, config=CFG_P)[0])(*scene)
        )
    np.testing.assert_allclose(img_p, img_t, atol=1e-4)


def test_pallas_interpret_backward_matches_tiles():
    scene = _scene(seed=1)

    def gradfn(cfg):
        @jax.jit
        def g(means, rgb, quats, logit, logsc, active):
            def loss(m, r, q, l, s):
                img, _, _, _ = render_gaussians(CAM, m, r, q, l, s, active, config=cfg)
                return jnp.sum(img**2)

            return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
                means, rgb, quats, logit, logsc
            )
        return g

    gt = gradfn(CFG_T)(*scene)
    with pltpu.force_tpu_interpret_mode():
        gp = gradfn(CFG_P)(*scene)
    for name, x, y in zip(["means", "rgb", "quats", "logit", "logsc"], gt, gp):
        x, y = np.asarray(x), np.asarray(y)
        scale = np.abs(x).max() + 1e-8
        np.testing.assert_allclose(y, x, atol=5e-5 * scale, err_msg=name)
