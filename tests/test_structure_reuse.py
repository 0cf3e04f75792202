"""Pair-structure reuse (render.api.PairStructure, VERDICT r1 item 3).

Exactness: a structure computed from the SAME geometry must reproduce the
inline-binning render bit-for-bit. Approximation: phases with rebin_every>1
must land within tight tolerances of the exact path on a real optimization.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from splatam_tpu.core.camera import setup_camera
from splatam_tpu.core.gaussians import GaussianMap
from splatam_tpu.render.api import (
    RenderConfig,
    compute_pair_structure,
    render_rgbd_sil,
)
from splatam_tpu.slam import steps

W, H = 64, 48
RCFG = RenderConfig(backend="tiles", pair_cap=1 << 14, tile_k_max=512)


def _cam():
    k = [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]
    return setup_camera(W, H, k, np.eye(4, dtype=np.float32))


def _gm(n=512, cap=1024, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-1.2, 1.2, cap), rng.uniform(-0.9, 0.9, cap),
         rng.uniform(1.0, 4.0, cap)], axis=-1).astype(np.float32)
    gm = GaussianMap(
        means3d=jnp.asarray(means),
        rgb_colors=jnp.asarray(rng.uniform(0, 1, (cap, 3)).astype(np.float32)),
        unnorm_rotations=jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32), (cap, 1))),
        logit_opacities=jnp.asarray(
            rng.normal(1.5, 0.3, cap).astype(np.float32)),
        log_scales=jnp.asarray(
            np.log(means[:, 2:3] / 60.0).astype(np.float32)),
        active=jnp.asarray(np.arange(cap) < n),
    )
    return gm


def test_same_geometry_structure_is_exact():
    cam = _cam()
    gm = _gm()
    ps = compute_pair_structure(
        cam, gm.means3d, gm.unnorm_rotations, gm.logit_opacities,
        gm.log_scales, gm.active, RCFG,
    )
    out_inline = render_rgbd_sil(
        cam, gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
        gm.logit_opacities, gm.log_scales, gm.active, config=RCFG,
    )
    out_reuse = render_rgbd_sil(
        cam, gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
        gm.logit_opacities, gm.log_scales, gm.active, config=RCFG,
        pair_structure=ps,
    )
    np.testing.assert_array_equal(np.asarray(out_inline.im), np.asarray(out_reuse.im))
    np.testing.assert_array_equal(
        np.asarray(out_inline.depth), np.asarray(out_reuse.depth)
    )
    np.testing.assert_array_equal(
        np.asarray(out_inline.silhouette), np.asarray(out_reuse.silhouette)
    )


def test_stale_structure_silences_pruned_gaussians():
    """Deactivating a gaussian after the structure was built must remove its
    contribution exactly (opacity zeroing -> 1/255 skip)."""
    cam = _cam()
    gm = _gm()
    ps = compute_pair_structure(
        cam, gm.means3d, gm.unnorm_rotations, gm.logit_opacities,
        gm.log_scales, gm.active, RCFG,
    )
    pruned = np.asarray(gm.active).copy()
    pruned[:128] = False
    gm2 = gm._replace(active=jnp.asarray(pruned))
    out_exact = render_rgbd_sil(
        cam, gm2.means3d, gm2.rgb_colors, gm2.unnorm_rotations,
        gm2.logit_opacities, gm2.log_scales, gm2.active, config=RCFG,
    )
    out_stale = render_rgbd_sil(
        cam, gm2.means3d, gm2.rgb_colors, gm2.unnorm_rotations,
        gm2.logit_opacities, gm2.log_scales, gm2.active, config=RCFG,
        pair_structure=ps,
    )
    np.testing.assert_allclose(
        np.asarray(out_exact.im), np.asarray(out_stale.im), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_exact.silhouette), np.asarray(out_stale.silhouette),
        atol=1e-6,
    )


def _tracking_args(gm, cam, rebin):
    rng = np.random.default_rng(3)
    # Render "ground truth" from a slightly offset pose, then track back.
    q_gt = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    t_gt = jnp.asarray([0.02, -0.01, 0.015], jnp.float32)
    means_cam, rots_cam = steps.transform_to_frame(gm, q_gt, t_gt, False, False)
    out = render_rgbd_sil(
        cam, means_cam, gm.rgb_colors, rots_cam, gm.logit_opacities,
        gm.log_scales, gm.active, config=RCFG,
    )
    color = jnp.clip(out.im, 0, 1)
    depth = jnp.where(out.silhouette > 0.5, out.depth, 0.0)
    pcfg = steps.PhaseConfig(True, 0.99, True, True, 0.5, 1.0)
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)
    return steps.tracking_phase(
        gm, q0, t0, color, depth, cam, 20, False, 1e5, 0.002, 0.004,
        pcfg, RCFG, rebin_every=rebin,
    )


def test_tracking_rebin_matches_exact():
    """Stale candidate lists perturb individual Adam steps slightly (this
    toy scene has 512 gaussians at 64x48, so each edge pair carries far more
    weight than in a real map); what must hold is that rebin_every>1 tracks
    the pose to the SAME quality as exact per-iteration binning."""
    cam = _cam()
    gm = _gm()
    t_gt = np.array([0.02, -0.01, 0.015], np.float32)
    q1, t1, it1, loss1, _, _, _ = _tracking_args(gm, cam, 1)
    q4, t4, it4, loss4, _, _, _ = _tracking_args(gm, cam, 4)
    assert int(it1) == int(it4)
    err1 = float(np.linalg.norm(np.asarray(t1) - t_gt))
    err4 = float(np.linalg.norm(np.asarray(t4) - t_gt))
    assert err4 < max(1.3 * err1, err1 + 1e-3)
    # And the iterates stay on the same optimization path (mm-scale agreement).
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t4), atol=3e-3)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q4), atol=3e-3)
    assert abs(float(loss1) - float(loss4)) / max(float(loss1), 1e-6) < 0.1


def test_mapping_reuse_matches_exact():
    cam = _cam()
    gm = _gm()
    rng = np.random.default_rng(7)
    n_kf, n_iters = 3, 12
    kf_colors = jnp.asarray(
        rng.integers(0, 255, (n_kf + 1, H, W, 3), dtype=np.uint8))
    kf_depths = jnp.asarray(
        rng.uniform(1.0, 3.0, (n_kf + 1, H, W)).astype(np.float32))
    slots = jnp.asarray(rng.integers(0, n_kf, n_iters).astype(np.int32))
    qs = np.tile(np.array([1, 0, 0, 0], np.float32), (n_iters, 1))
    qs[:, 1] = rng.uniform(-0.02, 0.02, n_iters)
    ts = rng.uniform(-0.03, 0.03, (n_iters, 3)).astype(np.float32)
    # One pose per slot so each distinct keyframe has one structure.
    for i in range(n_iters):
        qs[i] = qs[int(slots[i])]
        ts[i] = ts[int(slots[i])]
    pcfg = steps.PhaseConfig(False, 0.5, True, False, 0.5, 1.0)
    lrs = (1e-4, 2e-3, 1e-3, 5e-2, 1e-3)
    from splatam_tpu.slam import optim

    params_of = lambda g: (g.means3d, g.rgb_colors, g.unnorm_rotations,
                           g.logit_opacities, g.log_scales)
    zeros = jnp.zeros((gm.capacity,), jnp.float32)

    def run(reuse):
        kwargs = {}
        if reuse:
            uniq = {}
            iter_idx = [uniq.setdefault(int(s), len(uniq)) for s in np.asarray(slots)]
            rows = list(uniq)
            rows += [rows[0]] * (4 - len(rows))
            kwargs = dict(
                reuse_structures=True,
                struct_qs=jnp.asarray(np.stack([qs[list(np.asarray(slots)).index(r)] for r in rows])),
                struct_ts=jnp.asarray(np.stack([ts[list(np.asarray(slots)).index(r)] for r in rows])),
                iter_struct_idx=jnp.asarray(np.array(iter_idx, np.int32)),
                n_structs=jnp.int32(len(uniq)),
            )
        return steps.mapping_phase(
            gm, kf_colors, kf_depths, slots, jnp.asarray(qs), jnp.asarray(ts),
            jnp.float32(2.0), cam, n_iters, pcfg, RCFG,
            steps.PruneConfig(enabled=True, stop_after=8, prune_every=4),
            lrs, optim.adam_init(params_of(gm)), (zeros, zeros, zeros),
        ) if not reuse else steps.mapping_phase(
            gm, kf_colors, kf_depths, slots, jnp.asarray(qs), jnp.asarray(ts),
            jnp.float32(2.0), cam, n_iters, pcfg, RCFG,
            steps.PruneConfig(enabled=True, stop_after=8, prune_every=4),
            lrs, optim.adam_init(params_of(gm)), (zeros, zeros, zeros),
            **kwargs,
        )

    gm1, _, _, loss1, _, _, _ = run(False)
    gm2, _, _, loss2, _, _, _ = run(True)
    assert abs(float(loss1) - float(loss2)) / max(abs(float(loss1)), 1e-6) < 0.02
    np.testing.assert_allclose(
        np.asarray(gm1.means3d), np.asarray(gm2.means3d), atol=2e-3
    )
    assert bool(jnp.all(gm1.active == gm2.active))
