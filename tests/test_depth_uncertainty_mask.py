"""depth_unc_thres (TPU-native tracking extension, steps.PhaseConfig):
masking by NORMALIZED splat-depth variance must excise fg/bg mixture
pixels (occlusion boundaries) while keeping single-surface pixels whose
silhouette is merely slightly below 1."""
import numpy as np
import jax
import jax.numpy as jnp

from splatam_tpu.core.camera import Camera
from splatam_tpu.render.api import RenderConfig
from splatam_tpu.slam import steps

H, W = 32, 32
CAM = Camera(height=H, width=W, fx=40.0, fy=40.0, cx=16.0, cy=16.0)
RCFG = RenderConfig(backend="tiles", pair_cap=1 << 10, tile_k_max=128)


def _two_layer_scene():
    """A big far wall plus a small near blob covering the image center —
    center pixels composite a depth MIXTURE (std ~ 1 m), outer pixels see
    one surface."""
    means = np.array(
        [[0.0, 0.0, 4.0], [0.0, 0.0, 2.0]], np.float32
    )
    colors = np.array([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1]], np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
    # Far wall huge and opaque-ish; near blob moderate alpha so the
    # mixture has real variance.
    logit_op = np.array([4.0, 0.0], np.float32)
    log_scales = np.log(np.array([[3.0], [0.15]], np.float32))
    return steps.GaussianMap(
        means3d=jnp.asarray(means),
        rgb_colors=jnp.asarray(colors),
        unnorm_rotations=jnp.asarray(quats),
        logit_opacities=jnp.asarray(logit_op),
        log_scales=jnp.asarray(log_scales),
        active=jnp.ones(2, bool),
    )


def _loss(pcfg, gm, depth_gt):
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    color = jnp.zeros((3, H, W), jnp.float32)
    loss, aux = jax.jit(
        lambda: steps.get_loss(
            gm, q, t, color, depth_gt, CAM, pcfg, RCFG, True, False
        )
    )()
    return float(loss), aux


def test_uncertainty_mask_excises_mixture_pixels():
    gm = _two_layer_scene()
    # gt depth = near surface at center: the mixture's rendered depth
    # differs hugely there, so masked vs unmasked losses must differ.
    depth_gt = jnp.full((H, W), 4.0, jnp.float32)

    base = steps.PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )
    masked = steps.PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
        depth_unc_thres=0.3,
    )
    loss_base, _ = _loss(base, gm, depth_gt)
    loss_masked, _ = _loss(masked, gm, depth_gt)
    # The mixture pixels carry the depth error; masking them must strictly
    # reduce the summed tracking loss.
    assert np.isfinite(loss_base) and np.isfinite(loss_masked)
    assert loss_masked < loss_base * 0.9, (loss_masked, loss_base)

    # With thres=0 the option is inert: loss identical to base config.
    off = steps.PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
        depth_unc_thres=0.0,
    )
    loss_off, _ = _loss(off, gm, depth_gt)
    assert loss_off == loss_base


def test_uncertainty_mask_keeps_single_surface_pixels():
    """A lone clean wall (no mixture): the mask must change nothing even
    though silhouette < 1 everywhere (the raw unnormalized depth_sq -
    depth^2 would misfire here — regression guard for the sil
    normalization)."""
    means = np.array([[0.0, 0.0, 3.0]], np.float32)
    gm = steps.GaussianMap(
        means3d=jnp.asarray(means),
        rgb_colors=jnp.asarray(np.array([[0.5, 0.5, 0.5]], np.float32)),
        unnorm_rotations=jnp.asarray(np.array([[1, 0, 0, 0]], np.float32)),
        logit_opacities=jnp.asarray(np.array([2.0], np.float32)),  # ~0.88
        log_scales=jnp.asarray(np.log(np.array([[3.0]], np.float32))),
        active=jnp.ones(1, bool),
    )
    depth_gt = jnp.full((H, W), 3.2, jnp.float32)
    base = steps.PhaseConfig(
        use_sil_for_loss=True, sil_thres=0.5, use_l1=True,
        ignore_outlier_depth_loss=False, w_im=0.5, w_depth=1.0,
    )
    masked = base.__class__(**{**base.__dict__, "depth_unc_thres": 0.05})
    loss_base, _ = _loss(base, gm, depth_gt)
    loss_masked, _ = _loss(masked, gm, depth_gt)
    assert np.isclose(loss_base, loss_masked, rtol=0, atol=0), (
        loss_base, loss_masked,
    )
