"""Pallas kernel parity vs the XLA tiles backend — runs only on real TPU.

(The CPU test suite exercises the tiles backend against the naive oracle;
this file closes the chain tiles == pallas on hardware.)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    pytest.skip("Pallas TPU kernels need a TPU", allow_module_level=True)

from splatam_tpu.core.camera import Camera
from splatam_tpu.render.api import RenderConfig, render_gaussians


def _scene(n=4096, seed=0):
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
            np.log(rng.uniform(0.01, 0.05, (n, 3))).astype(np.float32),
            np.ones(n, bool),
        )
    ]


CAM = Camera(height=96, width=160, fx=120.0, fy=120.0, cx=80.0, cy=48.0)
CFG_T = RenderConfig(backend="tiles", pair_cap=1 << 14, tile_k_max=1024)
CFG_P = RenderConfig(backend="pallas", pair_cap=1 << 14, tile_k_max=1024)


def test_pallas_forward_matches_tiles():
    scene = _scene()

    @jax.jit
    def ft(*a):
        return render_gaussians(CAM, *a, config=CFG_T)[0]

    @jax.jit
    def fp(*a):
        return render_gaussians(CAM, *a, config=CFG_P)[0]

    img_t, img_p = np.asarray(ft(*scene)), np.asarray(fp(*scene))
    np.testing.assert_allclose(img_p, img_t, atol=1e-4)


def test_pallas_backward_matches_tiles():
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
    gp = gradfn(CFG_P)(*scene)
    for name, x, y in zip(["means", "rgb", "quats", "logit", "logsc"], gt, gp):
        x, y = np.asarray(x), np.asarray(y)
        scale = np.abs(x).max() + 1e-8
        np.testing.assert_allclose(y, x, atol=5e-5 * scale, err_msg=name)


def test_pallas_direct_j_matches_classic():
    """J-slot direct pair expansion feeds the pallas kernels the same sorted
    pair stream as the classic spread path (tests/test_binning_direct.py
    pins this on CPU through the tiles backend; this closes it on TPU)."""
    scene = _scene(seed=2)
    cfg_d = RenderConfig(backend="pallas", pair_cap=1 << 14, tile_k_max=1024,
                         direct_j=2)

    def outs(cfg):
        @jax.jit
        def g(means, rgb, quats, logit, logsc, active):
            def loss(m):
                img, _, _, _ = render_gaussians(
                    CAM, m, rgb, quats, logit, logsc, active, config=cfg
                )
                return jnp.sum(img ** 2), img

            (l, img), grad = jax.value_and_grad(loss, has_aux=True)(means)
            return img, grad
        return g(*scene)

    img_c, grad_c = outs(CFG_P)
    img_d, grad_d = outs(cfg_d)
    np.testing.assert_allclose(np.asarray(img_d), np.asarray(img_c), atol=1e-5)
    scale = np.abs(np.asarray(grad_c)).max() + 1e-8
    np.testing.assert_allclose(
        np.asarray(grad_d), np.asarray(grad_c), atol=1e-5 * scale
    )


def test_pairspace_tracking_matches_standard_path():
    """Tracking get_loss via the pair-space fast path (world16 +
    composite_pairs, grads pairs->pose) matches the standard reuse path
    (per-gaussian projection + gather + pairs->gaussian reduction) in loss
    value and pose gradients."""
    from splatam_tpu.slam.steps import (
        PhaseConfig, get_loss, loss_pair_structure,
    )
    from tests.test_pairspace import _GM, _cam, _pose, _scene

    gm = _GM(*_scene(n=2000, seed=5))
    cam = _cam(w=160, h=96)
    q, t = _pose()
    rcfg = RenderConfig(backend="pallas", pair_cap=1 << 15)
    pcfg = PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )
    rng = np.random.default_rng(2)
    color = jnp.asarray(rng.uniform(0, 1, (3, 96, 160)), jnp.float32)
    depth_gt = jnp.asarray(rng.uniform(1, 5, (96, 160)), jnp.float32)

    # prefer_w8=False pins the GENERIC world16 pair-space path (isotropic
    # maps otherwise route to the fused in-kernel projection, pinned below).
    ps = loss_pair_structure(
        gm, q, t, cam, rcfg, with_world16=True, prefer_w8=False
    )
    assert ps.world16 is not None

    def loss_fast(qt):
        return get_loss(gm, qt[0], qt[1], color, depth_gt, cam, pcfg, rcfg,
                        True, False, pair_structure=ps)[0]

    def loss_std(qt):
        return get_loss(gm, qt[0], qt[1], color, depth_gt, cam, pcfg, rcfg,
                        True, False,
                        pair_structure=ps._replace(world16=None))[0]

    lf, gf = jax.jit(jax.value_and_grad(loss_fast))((q, t))
    ls, gs = jax.jit(jax.value_and_grad(loss_std))((q, t))
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3,
            atol=2e-3 * float(np.max(np.abs(a))) + 1e-6,
        )


def test_fused_iso_matches_standard_path_on_tpu():
    """The fused isotropic in-kernel projection (render.pallas.fused_iso) —
    the production tracking AND mapping path for isotropic maps — matches
    the standard per-gaussian projection + gather path on hardware, in
    loss values, pose grads (tracking), and parameter grads (mapping).
    (CPU interpret-mode parity lives in tests/test_fused_iso.py.)"""
    from splatam_tpu.slam.steps import (
        PhaseConfig, get_loss, loss_pair_structure,
    )
    from tests.test_pairspace import _GM, _cam, _pose, _scene

    gm = _GM(*_scene(n=2000, seed=5))
    cam = _cam(w=160, h=96)
    q, t = _pose()
    rcfg = RenderConfig(backend="pallas", pair_cap=1 << 15)
    pcfg = PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )
    mcfg = PhaseConfig(
        use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )
    rng = np.random.default_rng(2)
    color = jnp.asarray(rng.uniform(0, 1, (3, 96, 160)), jnp.float32)
    depth_gt = jnp.asarray(rng.uniform(1, 5, (96, 160)), jnp.float32)

    ps_w8 = loss_pair_structure(gm, q, t, cam, rcfg, with_world16=True)
    assert ps_w8.world8 is not None and ps_w8.world16 is None

    # -- tracking: fused pose grads vs the standard reuse path ----------
    def loss_fused(qt):
        return get_loss(gm, qt[0], qt[1], color, depth_gt, cam, pcfg, rcfg,
                        True, False, pair_structure=ps_w8)[0]

    def loss_std(qt):
        return get_loss(gm, qt[0], qt[1], color, depth_gt, cam, pcfg, rcfg,
                        True, False,
                        pair_structure=ps_w8._replace(world8=None))[0]

    lf, gf = jax.jit(jax.value_and_grad(loss_fused))((q, t))
    ls, gs = jax.jit(jax.value_and_grad(loss_std))((q, t))
    np.testing.assert_allclose(float(lf), float(ls), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3,
            atol=2e-3 * float(np.max(np.abs(a))) + 1e-6,
        )

    # -- mapping: fused per-gaussian param grads vs the generic path ----
    def map_grads(dummy):
        def loss(params):
            g2 = _GM(params[0], gm.unnorm_rotations, params[2],
                     params[3], params[1], gm.active)
            return get_loss(g2, q, t, color, depth_gt, cam, mcfg, rcfg,
                            False, True, pair_structure=ps_w8,
                            means2d_dummy=dummy)[0]

        p = (gm.means3d, gm.rgb_colors, gm.logit_opacities, gm.log_scales)
        return jax.jit(jax.value_and_grad(loss))(p)

    lm_f, gm_f = map_grads(None)  # fused (no screen-space stats dummy)
    lm_g, gm_g = map_grads(jnp.zeros((2000, 2), jnp.float32))  # generic
    np.testing.assert_allclose(float(lm_f), float(lm_g), rtol=1e-4)
    for name, a, b in zip(("means", "rgb", "logit_op", "log_scales"),
                          gm_g, gm_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3,
            atol=2e-3 * float(np.max(np.abs(a))) + 1e-6, err_msg=name,
        )
