import numpy as np
import jax
import jax.numpy as jnp
import pytest

from splatam_tpu.core.losses import calc_psnr, calc_ssim, ms_ssim
from splatam_tpu.slam import optim


def test_adam_matches_torch():
    """Our masked Adam must reproduce torch.optim.Adam bit-for-bit-ish
    (the reference relies on torch Adam semantics incl. eps placement,
    scripts/splatam.py:160-166)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(50, 3)).astype(np.float32)
    grads = [rng.normal(size=(50, 3)).astype(np.float32) for _ in range(5)]
    lr, eps = 0.01, 1e-15

    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.Adam([tp], lr=lr, eps=eps)
    for g in grads:
        tp.grad = torch.tensor(g)
        opt.step()
    expected = tp.detach().numpy()

    params = jnp.asarray(p0)
    state = optim.adam_init(params)
    for g in grads:
        params, state = optim.adam_step(state, params, jnp.asarray(g), jnp.float32(lr), eps)
    np.testing.assert_allclose(np.asarray(params), expected, atol=1e-5)


def test_ssim_matches_reference_formula():
    """SSIM via separable convs == the reference's 2D-window conv
    (utils/slam_external.py:66-97), checked against a direct numpy impl."""
    rng = np.random.default_rng(1)
    img1 = rng.uniform(0, 1, (3, 40, 56)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.08, img1.shape), 0, 1).astype(np.float32)

    ours = float(calc_ssim(jnp.asarray(img1), jnp.asarray(img2)))

    # direct 2D conv reference
    from scipy.signal import convolve2d

    xs = np.arange(11)
    g1 = np.exp(-((xs - 5) ** 2) / (2 * 1.5**2))
    g1 /= g1.sum()
    win = np.outer(g1, g1)

    def blur(img):
        return np.stack(
            [convolve2d(c, win[::-1, ::-1], mode="same") for c in img]
        )

    mu1, mu2 = blur(img1), blur(img2)
    s1 = blur(img1 * img1) - mu1**2
    s2 = blur(img2 * img2) - mu2**2
    s12 = blur(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    np.testing.assert_allclose(ours, ssim_map.mean(), atol=2e-3)


def test_psnr_identical_images():
    img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (3, 16, 16)).astype(np.float32))
    noisy = jnp.clip(img + 0.01, 0, 1)
    psnr = float(calc_psnr(img, noisy).mean())
    assert 35 < psnr < 45


def test_ms_ssim_ranges():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (3, 180, 200)).astype(np.float32)
    same = float(ms_ssim(jnp.asarray(img), jnp.asarray(img)))
    assert same > 0.99
    other = rng.uniform(0, 1, (3, 180, 200)).astype(np.float32)
    diff = float(ms_ssim(jnp.asarray(img), jnp.asarray(other)))
    assert diff < same


def test_ply_roundtrip(tmp_path):
    from splatam_tpu.io.ply import load_ply, save_ply

    rng = np.random.default_rng(4)
    n = 100
    means = rng.normal(size=(n, 3)).astype(np.float32)
    scales = rng.normal(size=(n, 1)).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.normal(size=(n, 1)).astype(np.float32)
    path = str(tmp_path / "splat.ply")
    save_ply(path, means, scales, rots, rgbs, opac)
    back = load_ply(path)
    np.testing.assert_allclose(back["means3D"], means, atol=1e-6)
    np.testing.assert_allclose(back["rgb_colors"], rgbs, atol=1e-5)
    np.testing.assert_allclose(back["unnorm_rotations"], rots, atol=1e-6)
    np.testing.assert_allclose(back["logit_opacities"], opac, atol=1e-6)
    np.testing.assert_allclose(back["log_scales"], np.tile(scales, (1, 3)), atol=1e-6)


def test_keyframe_selection_overlap():
    from splatam_tpu.slam.keyframes import keyframe_selection_overlap

    rng = np.random.default_rng(5)
    depth = rng.uniform(1, 3, (60, 80)).astype(np.float32)
    k = np.array([[70.0, 0, 40], [0, 70.0, 30], [0, 0, 1]])
    w2c = np.eye(4)
    # keyframe 0: same pose (full overlap); keyframe 1: looking away
    away = np.eye(4)
    away[:3, :3] = np.diag([1, -1, -1])  # 180 degree flip
    away[:3, 3] = [0, 0, -10]
    sel = keyframe_selection_overlap(
        depth, w2c, k, [w2c, away], k=2, rng=np.random.default_rng(0)
    )
    assert sel == [0]


def test_gaussian_map_compaction():
    from splatam_tpu.core import gaussians as G

    gm = G.empty_map(64)
    rng = np.random.default_rng(6)
    means = rng.normal(size=(64, 3)).astype(np.float32)
    active = rng.uniform(size=64) > 0.5
    gm = gm._replace(means3d=jnp.asarray(means), active=jnp.asarray(active))
    ts = jnp.asarray(np.arange(64, dtype=np.float32))
    gm2, ts2 = G.compact(gm, ts)
    n = int(active.sum())
    assert bool(gm2.active[:n].all())
    assert not bool(gm2.active[n:].any())
    np.testing.assert_allclose(np.asarray(gm2.means3d[:n]), means[active], atol=0)
    np.testing.assert_allclose(np.asarray(ts2[:n]), np.arange(64)[active], atol=0)
