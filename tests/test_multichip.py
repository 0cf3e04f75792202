"""Multi-chip row-sharded training step on the virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_dryrun_multichip_entrypoints():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
    ge.dryrun_multichip(min(8, len(jax.devices())))


def test_sharded_loss_matches_single_device():
    """Row-sharded psum loss == unsharded loss on the same scene."""
    from splatam_tpu.core.camera import Camera
    from splatam_tpu.parallel.spatial import make_mesh, make_sharded_train_step
    from splatam_tpu.render.api import RenderConfig
    from splatam_tpu.slam import optim
    from splatam_tpu.slam.steps import transform_to_frame
    from splatam_tpu.core.gaussians import GaussianMap
    from splatam_tpu.render.api import render_gaussians

    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs multiple devices")
    h = 16 * n_dev * 2
    cam = Camera(height=h, width=64, fx=60.0, fy=60.0, cx=32.0, cy=h / 2.0)
    rcfg = RenderConfig(backend="tiles", pair_cap=1 << 12, tile_k_max=256)

    rng = np.random.default_rng(0)
    n = 256
    means = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(1.5, 4, n)], -1
    ).astype(np.float32)
    params = (
        jnp.asarray(means),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(1.0, 0.5, (n,)).astype(np.float32)),
        jnp.asarray(np.log(rng.uniform(0.02, 0.08, (n, 1))).astype(np.float32)),
    )
    active = jnp.asarray(np.ones(n, bool))
    color = jnp.asarray(rng.uniform(0, 1, (3, h, 64)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1.0, 4.0, (h, 64)).astype(np.float32))
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)

    mesh = make_mesh(n_dev)
    step, shard_frame = make_sharded_train_step(
        mesh, cam, rcfg, lrs=(1e-4, 2.5e-3, 1e-3, 5e-2, 1e-3)
    )
    c_sh, d_sh = shard_frame(color, depth)
    opt_state = optim.adam_init(params)
    _, _, loss_sharded = step(params, active, opt_state, q, t, c_sh, d_sh)

    # Unsharded reference loss (same formula as _local_render_loss).
    gm = GaussianMap(*params, active)
    means_cam, rots_cam = transform_to_frame(gm, q, t, True, False)
    img, _, _, _ = render_gaussians(
        cam, means_cam, params[1], rots_cam, params[3], params[4], active, config=rcfg
    )
    valid = depth > 0
    expected = 1.0 * jnp.sum(jnp.abs(depth - img[3]) * valid) + 0.5 * jnp.sum(
        jnp.abs(color - img[:3])
    )
    np.testing.assert_allclose(
        float(loss_sharded), float(expected), rtol=1e-4
    )
