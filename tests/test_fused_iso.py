"""Parity of the fused isotropic in-kernel projection path (render.pallas.
fused_iso) against the XLA tiles backend, on CPU via the TPU interpreter.

The fused path replaces, for isotropic maps, both the pair-space tracking
render (world16 + XLA project_pairs) and the generic mapping render (O(N)
projection + 11-col gather + 16-row kernels). Both flavors must reproduce
the tiles backend's forward images AND gradients: pose grads for tracking,
all five per-gaussian parameter grads for mapping.

Reference semantics being locked: the two rasterizer launches per loss
iteration of scripts/splatam.py:249-253 with gradient gating per phase
(utils/slam_helpers.py:266-288).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from splatam_tpu.core.camera import Camera
from splatam_tpu.core.gaussians import GaussianMap
from splatam_tpu.render.api import RenderConfig
from splatam_tpu.slam import steps

if jax.default_backend() == "tpu":
    pytest.skip("interpret-mode coverage is for CPU runs", allow_module_level=True)

pytestmark = pytest.mark.slow  # interpreter is minutes-slow; RUN_SLOW=1

CAM = Camera(height=48, width=64, fx=60.0, fy=60.0, cx=32.0, cy=24.0)
CFG_T = RenderConfig(backend="tiles", pair_cap=1 << 12, tile_k_max=512)
CFG_P = RenderConfig(backend="pallas", pair_cap=1 << 12, tile_k_max=512)

PCFG_TRACK = steps.PhaseConfig(
    use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
    ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
)
PCFG_MAP = steps.PhaseConfig(
    use_sil_for_loss=False, sil_thres=0.5, use_l1=True,
    ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
)


def _gm(n=384, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1, 1, n),
         rng.uniform(1.0, 5, n)], -1,
    ).astype(np.float32)
    return GaussianMap(
        means3d=jnp.asarray(means),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        unnorm_rotations=jnp.asarray(
            rng.normal(size=(n, 4)).astype(np.float32)
        ),
        logit_opacities=jnp.asarray(
            rng.normal(1.0, 0.5, n).astype(np.float32)
        ),
        # ISOTROPIC [N, 1]: the shape that routes to the fused kernels.
        log_scales=jnp.asarray(
            np.log(rng.uniform(0.01, 0.08, (n, 1))).astype(np.float32)
        ),
        active=jnp.asarray(rng.uniform(size=n) > 0.1),
    )


def _frame(seed=3):
    rng = np.random.default_rng(seed)
    color = jnp.asarray(
        rng.uniform(0, 1, (3, CAM.height, CAM.width)).astype(np.float32)
    )
    depth = jnp.asarray(
        rng.uniform(1.0, 4.0, (CAM.height, CAM.width)).astype(np.float32)
    )
    return color, depth


Q = jnp.asarray([0.99, 0.02, -0.03, 0.01], jnp.float32)
T = jnp.asarray([0.02, -0.01, 0.03], jnp.float32)


def _track_loss_and_grads(gm, rcfg, interpret):
    color, depth = _frame()

    def run():
        ps = steps.loss_pair_structure(
            gm, Q, T, CAM, rcfg,
            with_world16=(rcfg.backend == "pallas"),
        )

        def f(qt):
            loss, _ = steps.get_loss(
                gm, qt[0], qt[1], color, depth, CAM, PCFG_TRACK, rcfg,
                True, False, pair_structure=ps,
            )
            return loss

        loss, grads = jax.value_and_grad(f)((Q, T))
        return loss, grads

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return jax.jit(run)()
    return jax.jit(run)()


def test_fused_tracking_pose_grads_match_tiles():
    gm = _gm()
    loss_t, (dq_t, dt_t) = _track_loss_and_grads(gm, CFG_T, interpret=False)
    loss_p, (dq_p, dt_p) = _track_loss_and_grads(gm, CFG_P, interpret=True)
    np.testing.assert_allclose(float(loss_p), float(loss_t), rtol=2e-4)
    scale = max(float(jnp.abs(dq_t).max()), 1e-3)
    np.testing.assert_allclose(
        np.asarray(dq_p), np.asarray(dq_t), atol=2e-4 * scale, rtol=2e-3
    )
    scale = max(float(jnp.abs(dt_t).max()), 1e-3)
    np.testing.assert_allclose(
        np.asarray(dt_p), np.asarray(dt_t), atol=2e-4 * scale, rtol=2e-3
    )


def _map_loss_and_grads(gm, rcfg, interpret):
    color, depth = _frame(seed=4)

    def run():
        ps = steps.loss_pair_structure(gm, Q, T, CAM, rcfg)
        params = (gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
                  gm.logit_opacities, gm.log_scales)

        def f(params):
            g2 = gm._replace(
                means3d=params[0], rgb_colors=params[1],
                unnorm_rotations=params[2], logit_opacities=params[3],
                log_scales=params[4],
            )
            loss, _ = steps.get_loss(
                g2, Q, T, color, depth, CAM, PCFG_MAP, rcfg, False, True,
                pair_structure=ps,
            )
            return loss

        return jax.value_and_grad(f)(params)

    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return jax.jit(run)()
    return jax.jit(run)()


def test_fused_mapping_param_grads_match_tiles():
    gm = _gm(seed=1)
    loss_t, grads_t = _map_loss_and_grads(gm, CFG_T, interpret=False)
    loss_p, grads_p = _map_loss_and_grads(gm, CFG_P, interpret=True)
    np.testing.assert_allclose(float(loss_p), float(loss_t), rtol=2e-4)
    names = ("means3d", "rgb", "rot", "logit_op", "log_scales")
    for name, gt, gp in zip(names, grads_t, grads_p):
        if name == "rot":
            # Isotropic covariance: rotation grads are analytically zero;
            # the generic path leaves float-noise residue there.
            assert float(jnp.abs(gp).max()) < 1e-5
            continue
        scale = max(float(jnp.abs(gt).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gt), atol=3e-4 * scale, rtol=3e-3,
            err_msg=name,
        )


def test_fused_forward_image_matches_tiles():
    gm = _gm(seed=2)
    color, depth = _frame(seed=5)

    def fwd(rcfg):
        def run():
            ps = steps.loss_pair_structure(gm, Q, T, CAM, rcfg)
            _, aux = steps.get_loss(
                gm, Q, T, color, depth, CAM, PCFG_MAP, rcfg, False, True,
                pair_structure=ps,
            )
            return aux.render_depth, aux.silhouette
        return run

    d_t, s_t = jax.jit(fwd(CFG_T))()
    with pltpu.force_tpu_interpret_mode():
        d_p, s_p = jax.jit(fwd(CFG_P))()
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_t), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_t), atol=1e-4)
