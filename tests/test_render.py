import numpy as np
import pytest
import jax
import jax.numpy as jnp

from splatam_tpu.core.camera import setup_camera
from splatam_tpu.render.api import RenderConfig, render_gaussians, render_rgbd_sil


def make_scene(n=200, seed=0, spread=1.0, z_range=(1.5, 4.0), opacity=1.5, scale=0.08,
               anisotropic=False):
    """Random cloud of Gaussians in front of the camera."""
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread * 0.6, spread * 0.6, n),
            rng.uniform(*z_range, n),
        ],
        axis=-1,
    ).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    logit_op = rng.normal(loc=opacity, scale=0.5, size=(n,)).astype(np.float32)
    s_cols = 3 if anisotropic else 1
    log_scales = np.log(rng.uniform(scale * 0.5, scale * 1.5, (n, s_cols))).astype(np.float32)
    active = np.ones(n, bool)
    return (
        jnp.asarray(means),
        jnp.asarray(colors),
        jnp.asarray(quats),
        jnp.asarray(logit_op),
        jnp.asarray(log_scales),
        jnp.asarray(active),
    )


def make_cam(w=96, h=64):
    k = [[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]]
    return setup_camera(w, h, k, np.eye(4, dtype=np.float32))


NAIVE = RenderConfig(backend="naive")
TILES = RenderConfig(backend="tiles", pair_cap=1 << 14, tile_k_max=256)


def _render_jit(config, cam):
    @jax.jit
    def f(means, colors, quats, logit_op, log_scales, active):
        return render_gaussians(
            cam, means, colors, quats, logit_op, log_scales, active, config=config
        )

    return f


def test_forward_tiles_matches_naive():
    cam = make_cam()
    scene = make_scene()
    img_n, radii_n, _, _ = _render_jit(NAIVE, cam)(*scene)
    img_t, radii_t, overflow, _ = _render_jit(TILES, cam)(*scene)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(radii_n), np.asarray(radii_t))
    # Depth quantization in the tile sort can swap near-equal depths; allow
    # tiny discrepancies but require near-exact agreement overall.
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_n), atol=2e-5)


def test_render_silhouette_and_depth_semantics():
    cam = make_cam()
    scene = make_scene(n=50, opacity=4.0)  # near-opaque
    out = render_rgbd_sil(cam, *scene, config=TILES)
    sil = np.asarray(out.silhouette)
    assert sil.max() <= 1.0 + 1e-5
    assert sil.max() > 0.9  # opaque gaussians should saturate silhouette
    depth = np.asarray(out.depth)
    covered = sil > 0.99
    assert covered.sum() > 20
    # Composited depth over covered pixels should be within the z range.
    assert depth[covered].min() > 1.0
    assert depth[covered].max() < 4.5
    # Uncertainty must be non-negative where silhouette is saturated.
    unc = np.asarray(out.depth_sq) - depth**2
    assert unc[covered].min() > -1e-3


def test_inactive_gaussians_excluded():
    cam = make_cam()
    means, colors, quats, logit_op, log_scales, active = make_scene(n=60)
    active2 = active.at[::2].set(False)
    render = _render_jit(TILES, cam)
    img_masked, radii, _, _ = render(means, colors, quats, logit_op, log_scales, active2)
    assert np.all(np.asarray(radii)[::2] == 0)
    img_subset, _, _, _ = render_gaussians(
        cam,
        means[1::2],
        colors[1::2],
        quats[1::2],
        logit_op[1::2],
        log_scales[1::2],
        active[1::2],
        config=TILES,
    )
    np.testing.assert_allclose(np.asarray(img_masked), np.asarray(img_subset), atol=1e-4)


def _loss_fn(config, cam, target):
    @jax.jit
    def loss(means, colors, quats, logit_op, log_scales, active):
        img, _, _, _ = render_gaussians(
            cam, means, colors, quats, logit_op, log_scales, active, config=config
        )
        return jnp.sum(jnp.abs(img[:3] - target)) + jnp.sum(img[3] * 0.1)

    return loss


def test_backward_tiles_matches_naive_autodiff():
    cam = make_cam(w=64, h=48)
    scene = make_scene(n=80, seed=2, anisotropic=True)
    target = jnp.zeros((3, 48, 64))
    loss_naive = _loss_fn(NAIVE, cam, target)
    loss_tiles = _loss_fn(TILES, cam, target)

    g_naive = jax.jit(jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4)))(*scene)
    g_tiles = jax.jit(jax.grad(loss_tiles, argnums=(0, 1, 2, 3, 4)))(*scene)
    names = ["means3d", "colors", "quats", "logit_op", "log_scales"]
    for name, gn, gt in zip(names, g_naive, g_tiles):
        gn, gt = np.asarray(gn), np.asarray(gt)
        scale = np.abs(gn).max() + 1e-8
        np.testing.assert_allclose(gt, gn, atol=3e-4 * scale, err_msg=name)


def test_oracle_gradient_matches_float64_finite_differences():
    """Validate the oracle's jax.grad against float64 central differences.

    Chain of trust: tile-backend analytic backward == oracle autodiff
    (test above), oracle autodiff == f64 finite differences (this test).
    Float32 FD is too coarse for this loss surface, so x64 is enabled
    locally.
    """
    with jax.enable_x64():
        cam = make_cam(w=32, h=32)
        scene = make_scene(n=12, seed=3, spread=0.4, z_range=(1.8, 2.5), scale=0.15)
        scene = tuple(
            jnp.asarray(np.asarray(s), jnp.float64)
            if np.asarray(s).dtype.kind == "f"
            else s
            for s in scene
        )

        def loss(means, colors, quats, logit_op, log_scales, active):
            img, _, _, _ = render_gaussians(
                cam, means, colors, quats, logit_op, log_scales, active,
                config=RenderConfig(backend="naive"),
            )
            return jnp.sum(img[:4] ** 2)

        g = np.asarray(jax.grad(loss, argnums=0)(*scene))
        means = np.asarray(scene[0])
        rng = np.random.default_rng(0)
        checked = 0
        for _ in range(6):
            i = int(rng.integers(12))
            j = int(rng.integers(3))
            eps = 1e-5
            mp, mm = means.copy(), means.copy()
            mp[i, j] += eps
            mm[i, j] -= eps
            fd = (
                float(loss(jnp.asarray(mp), *scene[1:]))
                - float(loss(jnp.asarray(mm), *scene[1:]))
            ) / (2 * eps)
            an = float(g[i, j])
            if abs(fd) < 1e-4 and abs(an) < 1e-4:
                continue
            np.testing.assert_allclose(an, fd, rtol=1e-4, atol=1e-4)
            checked += 1
        assert checked >= 3


def test_means2d_dummy_gradient():
    cam = make_cam(w=64, h=48)
    scene = make_scene(n=40, seed=5)
    dummy = jnp.zeros((40, 2), jnp.float32)

    def loss(dummy):
        img, _, _, _ = render_gaussians(
            cam, *scene, config=TILES, means2d_dummy=dummy
        )
        return jnp.sum(img[:3] ** 2)

    g = np.asarray(jax.grad(loss)(dummy))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_pair_overflow_reported():
    cam = make_cam()
    scene = make_scene(n=300)
    cfg = RenderConfig(backend="tiles", pair_cap=64, tile_k_max=64)
    _, _, overflow, _ = render_gaussians(cam, *scene, config=cfg)
    assert int(overflow) > 0
