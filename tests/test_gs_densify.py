"""3DGS clone/split/prune semantics vs a direct numpy reference.

Parity target: utils/slam_external.py:191-243 (densify) re-architected as
masked-buffer scatters in slam/steps_gs.py.
"""
import numpy as np
import jax
import jax.numpy as jnp

from splatam_tpu.core import gaussians as G
from splatam_tpu.slam import optim, steps_gs


def _setup(n_active=40, cap=128, seed=0):
    rng = np.random.default_rng(seed)
    gm = G.empty_map(cap, isotropic=False)
    means = rng.normal(size=(cap, 3)).astype(np.float32)
    log_scales = np.log(rng.uniform(0.005, 0.05, (cap, 3))).astype(np.float32)
    logit_op = rng.normal(0.0, 2.0, cap).astype(np.float32)
    active = np.arange(cap) < n_active
    gm = gm._replace(
        means3d=jnp.asarray(means),
        log_scales=jnp.asarray(log_scales),
        logit_opacities=jnp.asarray(logit_op),
        active=jnp.asarray(active),
    )
    grads = rng.uniform(0, 6e-4, cap).astype(np.float32)
    denom = np.ones(cap, np.float32)
    gsvars = steps_gs.GSVariables(
        means2d_grad_accum=jnp.asarray(grads),
        denom=jnp.asarray(denom),
        max_2d_radius=jnp.zeros(cap, jnp.float32),
    )
    return gm, gsvars, grads, active, means, log_scales, logit_op


def test_clone_split_prune_counts():
    cfg = steps_gs.DensifyConfig(
        grad_thresh=3e-4, num_to_split_into=2, removal_opacity_threshold=0.005,
        final_removal_opacity_threshold=0.005, remove_big_after=0,
    )
    gm, gsvars, grads, active, means, log_scales, logit_op = _setup()
    scene_radius = jnp.float32(2.0)
    opt_state = optim.adam_init(
        (gm.means3d, gm.rgb_colors, gm.unnorm_rotations, gm.logit_opacities, gm.log_scales)
    )
    gm2, gsvars2, opt2, ovf = steps_gs.densify_3dgs_step(
        gm, gsvars, opt_state, scene_radius, jax.random.PRNGKey(0),
        jnp.int32(100), cfg, final=False,
    )
    assert int(ovf) == 0

    # numpy reference of the expected surviving count
    max_scale = np.exp(log_scales).max(axis=1)
    high = (grads >= cfg.grad_thresh) & active
    to_clone = high & (max_scale <= 0.01 * 2.0)
    to_split = high & (max_scale > 0.01 * 2.0)
    # after clone + split(x2, original removed), prune by opacity and size
    sigm = 1.0 / (1.0 + np.exp(-logit_op))
    low_op = sigm < 0.005
    big = max_scale > 0.1 * 2.0
    survivors = active & ~to_split & ~low_op & ~big
    n_clones = int(to_clone.sum())  # clones inherit passing opacity/scale
    clone_ok = to_clone & ~low_op & ~big
    # split children: 2 per split gaussian, opacity inherited, scales shrunk
    n_split_children = 2 * int(to_split.sum())
    split_child_scale = np.exp(log_scales[to_split]).max(axis=1) / (0.8 * 2)
    child_ok = (~low_op[to_split]) & (split_child_scale <= 0.1 * 2.0)
    expected = int(survivors.sum()) + int(clone_ok.sum()) + 2 * int(child_ok.sum())
    assert int(gm2.num_active()) == expected

    # stats reset after densify (slam_external.py:220-222)
    assert float(gsvars2.means2d_grad_accum.sum()) == 0.0


def test_opacity_prune_only():
    cfg = steps_gs.DensifyConfig(grad_thresh=1e9, remove_big_after=10**6)
    gm, gsvars, grads, active, means, log_scales, logit_op = _setup(seed=2)
    opt_state = optim.adam_init(
        (gm.means3d, gm.rgb_colors, gm.unnorm_rotations, gm.logit_opacities, gm.log_scales)
    )
    gm2, _, _, _ = steps_gs.densify_3dgs_step(
        gm, gsvars, opt_state, jnp.float32(2.0), jax.random.PRNGKey(1),
        jnp.int32(0), cfg, final=False,
    )
    sigm = 1.0 / (1.0 + np.exp(-logit_op))
    expected = int((active & (sigm >= 0.005)).sum())
    assert int(gm2.num_active()) == expected
