"""Loss and image-metric primitives (pure JAX).

Parity targets: utils/slam_helpers.py:5-18 (L1 variants),
utils/slam_external.py:49-97 (PSNR / SSIM with the 11x11 sigma-1.5 Gaussian
window). SSIM here uses separable 1D convolutions — mathematically identical
to the reference's 2D conv of the outer-product window, but maps to two small
convs that XLA fuses well on TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss_v1(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.abs(x - y).mean()


def l1_loss_v2(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.abs(x - y).sum(-1).mean()


def weighted_l2_loss_v1(x, y, w):
    return jnp.sqrt(((x - y) ** 2) * w + 1e-20).mean()


def weighted_l2_loss_v2(x, y, w):
    return jnp.sqrt(((x - y) ** 2).sum(-1) * w + 1e-20).mean()


def calc_mse(img1: jax.Array, img2: jax.Array) -> jax.Array:
    return ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(1, keepdims=True)


def calc_psnr(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """Per-channel PSNR, [C, H, W] inputs -> [C, 1] (matches calc_psnr)."""
    mse = calc_mse(img1, img2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur_sep(img: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 'same' blur of [C, H, W] with a separable 1D window."""
    c = img.shape[0]
    ws = window.shape[0]
    pad = ws // 2
    x = img[None]  # [1, C, H, W]
    kh = jnp.tile(window.reshape(1, 1, ws, 1), (c, 1, 1, 1))
    kw = jnp.tile(window.reshape(1, 1, 1, ws), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn, feature_group_count=c
    )
    return x[0]


def calc_ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    size_average: bool = True,
) -> jax.Array:
    """SSIM over [C, H, W] images in [0, 1]. Parity: utils/slam_external.py:66-97."""
    window = jnp.asarray(_gaussian_window(window_size, 1.5))

    mu1 = _blur_sep(img1, window)
    mu2 = _blur_sep(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur_sep(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur_sep(img2 * img2, window) - mu2_sq
    sigma12 = _blur_sep(img1 * img2, window) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2))


def ms_ssim(img1: jax.Array, img2: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Multi-scale SSIM over [C, H, W] (5 scales, standard weights).

    Replaces the reference's pytorch_msssim dependency
    (utils/eval_helpers.py:19,482-483).
    """
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], dtype=jnp.float32)
    window = jnp.asarray(_gaussian_window(11, 1.5))
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def _ssim_and_cs(a, b):
        mu1, mu2 = _blur_sep(a, window), _blur_sep(b, window)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = _blur_sep(a * a, window) - mu1_sq
        s2 = _blur_sep(b * b, window) - mu2_sq
        s12 = _blur_sep(a * b, window) - mu1_mu2
        cs = (2 * s12 + c2) / (s1 + s2 + c2)
        ssim = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
        return ssim.mean(), cs.mean()

    def _downsample(x):
        c, h, w = x.shape
        h2, w2 = (h // 2) * 2, (w // 2) * 2
        x = x[:, :h2, :w2].reshape(c, h2 // 2, 2, w2 // 2, 2)
        return x.mean(axis=(2, 4))

    mcs = []
    a, b = img1, img2
    ssim_val = jnp.float32(0)
    for i in range(5):
        ssim_val, cs = _ssim_and_cs(a, b)
        mcs.append(cs)
        if i < 4:
            a, b = _downsample(a), _downsample(b)
    mcs = jnp.stack(mcs[:-1])
    # Standard MS-SSIM combination with ReLU clamping for stability.
    mcs = jnp.maximum(mcs, 0.0)
    ssim_val = jnp.maximum(ssim_val, 0.0)
    return jnp.prod(mcs ** weights[:-1]) * ssim_val ** weights[-1]
