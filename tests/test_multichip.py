"""Multi-chip row-sharded phase programs on the virtual CPU mesh.

The contract: with a mesh, steps.get_loss / tracking_phase / mapping_phase
run the render row-sharded (parallel/spatial.py) but produce the SAME
numbers as the single-chip path — the gathered image is bit-identical, so
masks/median/SSIM semantics carry over exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.core.camera import Camera
from splatam_tpu.core.gaussians import GaussianMap
from splatam_tpu.parallel.spatial import make_mesh
from splatam_tpu.render.api import RenderConfig
from splatam_tpu.slam import optim, steps


def _scene(n=256, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(1.5, 4, n)], -1
    ).astype(np.float32)
    return GaussianMap(
        jnp.asarray(means),
        jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.normal(1.0, 0.5, (n,)).astype(np.float32)),
        jnp.asarray(np.log(rng.uniform(0.02, 0.08, (n, 1))).astype(np.float32)),
        jnp.asarray(np.ones(n, bool)),
    )


N_DEV = min(4, len(jax.devices()))
H, W = 80, 64  # H deliberately NOT divisible by 16*N_DEV (pads to 96)
CAM = Camera(height=H, width=W, fx=60.0, fy=60.0, cx=32.0, cy=H / 2.0)
RCFG = RenderConfig(backend="tiles", pair_cap=1 << 12, tile_k_max=256)
PCFG_T = steps.PhaseConfig(True, 0.99, True, True, 0.5, 1.0)
PCFG_M = steps.PhaseConfig(False, 0.5, True, False, 0.5, 1.0)


def _frame(seed=1):
    rng = np.random.default_rng(seed)
    color = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1.0, 4.0, (H, W)).astype(np.float32))
    return color, depth


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_sharded_get_loss_matches_unsharded():
    gm = _scene()
    color, depth = _frame()
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.asarray([0.02, -0.01, 0.03], jnp.float32)
    mesh = make_mesh(N_DEV)

    for tracking, mapping, pcfg in ((True, False, PCFG_T), (False, True, PCFG_M)):
        loss0, aux0 = jax.jit(
            lambda: steps.get_loss(gm, q, t, color, depth, CAM, pcfg, RCFG,
                                   tracking, mapping)
        )()
        loss1, aux1 = jax.jit(
            lambda: steps.get_loss(gm, q, t, color, depth, CAM, pcfg, RCFG,
                                   tracking, mapping, mesh=mesh)
        )()
        np.testing.assert_allclose(float(loss1), float(loss0), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(aux1.silhouette), np.asarray(aux0.silhouette), atol=1e-5
        )
        # radii: sharded culling is per-row-block; the pmax must reproduce
        # the full-image visibility
        np.testing.assert_array_equal(
            np.asarray(aux1.radii) > 0, np.asarray(aux0.radii) > 0
        )


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_sharded_tracking_phase_matches_unsharded():
    gm = _scene(seed=2)
    color, depth = _frame(seed=3)
    q0 = jnp.asarray([1.0, 0.01, 0, 0], jnp.float32)
    t0 = jnp.asarray([0.05, 0, 0], jnp.float32)
    mesh = make_mesh(N_DEV)

    args = (gm, q0, t0, color, depth, CAM, 5, False, 1e5, 2e-3, 1e-3, PCFG_T, RCFG)
    q_a, t_a, it_a, loss_a, _, _, _ = steps.tracking_phase(*args)
    q_b, t_b, it_b, loss_b, _, _, _ = steps.tracking_phase(*args, mesh=mesh)
    assert int(it_a) == int(it_b)
    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(q_b), np.asarray(q_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_a), atol=1e-5)


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_sharded_mapping_phase_matches_unsharded():
    gm = _scene(seed=4)
    color, depth = _frame(seed=5)
    mesh = make_mesh(N_DEV)
    n_iters = 4
    kf_colors = jnp.zeros((1, H, W, 3), jnp.uint8).at[0].set(
        (jnp.transpose(color, (1, 2, 0)) * 255).astype(jnp.uint8)
    )
    kf_depths = depth[None]
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    params = (gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
              gm.logit_opacities, gm.log_scales)
    zeros = jnp.zeros((gm.capacity,), jnp.float32)

    def run(mesh_arg):
        return steps.mapping_phase(
            gm, kf_colors, kf_depths,
            jnp.zeros((n_iters,), jnp.int32),
            jnp.tile(q[None], (n_iters, 1)),
            jnp.tile(t[None], (n_iters, 1)),
            jnp.float32(2.0), CAM, n_iters, PCFG_M, RCFG,
            steps.PruneConfig(enabled=True, prune_every=2, stop_after=10),
            (1e-4, 2.5e-3, 1e-3, 5e-2, 1e-3),
            optim.adam_init(params),
            (zeros, zeros, zeros),
            track_stats=True,
            mesh=mesh_arg,
        )

    gm_a, _, gsv_a, loss_a, _, _, _ = run(None)
    gm_b, _, gsv_b, loss_b, _, _, _ = run(mesh)
    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gm_b.means3d), np.asarray(gm_a.means3d), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(gm_b.active), np.asarray(gm_a.active))
    # 3DGS densification stats (dummy-grad accumulators) must survive the
    # sharded path with the reference's full-image NDC scaling.
    np.testing.assert_allclose(
        np.asarray(gsv_b[0]), np.asarray(gsv_a[0]), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(gsv_b[1]), np.asarray(gsv_a[1]), atol=1e-6)


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_sharded_tracking_reuse_matches_unsharded_reuse():
    """Pair-structure reuse must COMPOSE with row sharding: each shard
    builds/reuses its own row-block structure (compute_pair_structure_sharded)
    and the result matches the single-chip reuse path."""
    gm = _scene(seed=6)
    color, depth = _frame(seed=7)
    q0 = jnp.asarray([1.0, 0.01, 0, 0], jnp.float32)
    t0 = jnp.asarray([0.05, 0, 0], jnp.float32)
    mesh = make_mesh(N_DEV)

    args = (gm, q0, t0, color, depth, CAM, 6, False, 1e5, 2e-3, 1e-3, PCFG_T, RCFG)
    q_a, t_a, it_a, loss_a, _, _, _ = steps.tracking_phase(*args, rebin_every=3)
    q_b, t_b, it_b, loss_b, _, _, _ = steps.tracking_phase(
        *args, mesh=mesh, rebin_every=3
    )
    assert int(it_a) == int(it_b)
    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(q_b), np.asarray(q_a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_a), atol=1e-5)


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
def test_sharded_mapping_reuse_matches_unsharded_reuse():
    gm = _scene(seed=8)
    color, depth = _frame(seed=9)
    mesh = make_mesh(N_DEV)
    n_iters = 4
    kf_colors = jnp.zeros((1, H, W, 3), jnp.uint8).at[0].set(
        (jnp.transpose(color, (1, 2, 0)) * 255).astype(jnp.uint8)
    )
    kf_depths = depth[None]
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t = jnp.zeros(3, jnp.float32)
    params = (gm.means3d, gm.rgb_colors, gm.unnorm_rotations,
              gm.logit_opacities, gm.log_scales)
    zeros = jnp.zeros((gm.capacity,), jnp.float32)

    def run(mesh_arg):
        return steps.mapping_phase(
            gm, kf_colors, kf_depths,
            jnp.zeros((n_iters,), jnp.int32),
            jnp.tile(q[None], (n_iters, 1)),
            jnp.tile(t[None], (n_iters, 1)),
            jnp.float32(2.0), CAM, n_iters, PCFG_M, RCFG,
            steps.PruneConfig(enabled=True, prune_every=2, stop_after=10),
            (1e-4, 2.5e-3, 1e-3, 5e-2, 1e-3),
            optim.adam_init(params),
            (zeros, zeros, zeros),
            track_stats=True,
            mesh=mesh_arg,
            reuse_structures=True,
            struct_qs=jnp.tile(q[None], (2, 1)),
            struct_ts=jnp.tile(t[None], (2, 1)),
            iter_struct_idx=jnp.zeros((n_iters,), jnp.int32),
            n_structs=jnp.int32(1),
        )

    gm_a, _, gsv_a, loss_a, _, _, _ = run(None)
    gm_b, _, gsv_b, loss_b, _, _, _ = run(mesh)
    np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gm_b.means3d), np.asarray(gm_a.means3d), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(gm_b.active), np.asarray(gm_a.active))
    np.testing.assert_allclose(
        np.asarray(gsv_b[0]), np.asarray(gsv_a[0]), rtol=1e-3, atol=1e-6
    )


@pytest.mark.skipif(N_DEV < 2, reason="needs multiple devices")
@pytest.mark.slow
def test_sharded_fused_iso_matches_unsharded():
    """The fused isotropic in-kernel-projection paths (render.pallas.
    fused_iso) must COMPOSE with row sharding (VERDICT r4 item 6): each
    shard gathers its own world8 rows and runs the fused kernels on its
    row block with the cy shift riding the dynamic pose vector. Runs the
    REAL Mosaic kernels under the TPU interpreter on the CPU mesh."""
    from jax.experimental.pallas import tpu as pltpu

    rcfg = RenderConfig(backend="pallas", pair_cap=1 << 12, tile_k_max=256)
    gm = _scene(seed=10)
    color, depth = _frame(seed=11)
    q = jnp.asarray([1.0, 0.01, 0, 0], jnp.float32)
    t = jnp.asarray([0.03, -0.01, 0.02], jnp.float32)
    mesh = make_mesh(2)

    with pltpu.force_tpu_interpret_mode():
        # ---- tracking (pairs core): loss + pose grads --------------------
        def track_loss(qt, mesh_arg):
            ps = steps.loss_pair_structure(
                gm, qt[0], qt[1], CAM, rcfg, with_world16=True, mesh=mesh_arg
            )
            assert (ps.world8 is not None), "w8 gate did not unlock"
            loss, _ = steps.get_loss(
                gm, qt[0], qt[1], color, depth, CAM, PCFG_T, rcfg,
                True, False, mesh=mesh_arg, pair_structure=ps,
            )
            return loss

        (l0, g0) = jax.value_and_grad(track_loss)((q, t), None)
        (l1, g1) = jax.value_and_grad(track_loss)((q, t), mesh)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                                   rtol=1e-4, atol=1e-6)

        # ---- mapping (gauss core): loss + param grads --------------------
        def map_loss(means, mesh_arg):
            g2 = gm._replace(means3d=means)
            ps = steps.loss_pair_structure(g2, q, t, CAM, rcfg,
                                           mesh=mesh_arg)
            loss, _ = steps.get_loss(
                g2, q, t, color, depth, CAM, PCFG_M, rcfg, False, True,
                mesh=mesh_arg, pair_structure=ps,
            )
            return loss

        (m0, gm0) = jax.value_and_grad(map_loss)(gm.means3d, None)
        (m1, gm1) = jax.value_and_grad(map_loss)(gm.means3d, mesh)
        np.testing.assert_allclose(float(m1), float(m0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gm1), np.asarray(gm0),
                                   rtol=1e-4, atol=1e-6)


def test_dryrun_multichip_entrypoints():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
    ge.dryrun_multichip(min(8, len(jax.devices())))
