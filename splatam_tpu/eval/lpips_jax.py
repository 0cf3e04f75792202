"""LPIPS (AlexNet) in JAX.

Replaces the reference's torchmetrics LPIPS dependency
(utils/eval_helpers.py:20-21,484-485). The AlexNet feature trunk + linear
heads are implemented here; pretrained weights are REQUIRED for the metric
to be meaningful and are loaded from an .npz (see `weights_path` resolution
below). In a zero-egress environment without cached weights the metric is
unavailable and `lpips_fn()` returns None — eval records NaN for LPIPS and
says so, rather than reporting a random-weight number.

Weight npz format: alexnet conv kernels 'features.{0,3,6,8,10}.weight'
([out,in,kh,kw]) / '.bias', and LPIPS linear heads 'lin{0-4}.model.1.weight'
([1,C,1,1]).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_ALEX_CFG = [
    # (key, out_ch, kernel, stride, padding)
    ("features.0", 64, 11, 4, 2),
    ("features.3", 192, 5, 1, 2),
    ("features.6", 384, 3, 1, 1),
    ("features.8", 256, 3, 1, 1),
    ("features.10", 256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after first two conv stages
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHT_PATHS = [
    os.path.expanduser("~/.cache/splatam_tpu/lpips_alex.npz"),
    os.path.join(os.path.dirname(__file__), "lpips_alex.npz"),
]


def _load_weights(weights_path: str | None):
    paths = [weights_path] if weights_path else DEFAULT_WEIGHT_PATHS
    for p in paths:
        if p and os.path.exists(p):
            return dict(np.load(p))
    return None


def _alex_features(weights, x):
    """x: [N, 3, H, W] in [-1, 1] -> list of 5 feature maps."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(_SCALE)[
        None, :, None, None
    ]
    feats = []
    for i, (key, _, k, stride, pad) in enumerate(_ALEX_CFG):
        w = jnp.asarray(weights[f"{key}.weight"])
        b = jnp.asarray(weights[f"{key}.bias"])
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
    return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


def lpips_fn(weights_path: str | None = None):
    """Returns a jitted lpips(img1, img2) over [3,H,W] images in [0,1],
    or None if no pretrained weights are available."""
    weights = _load_weights(weights_path)
    if weights is None:
        return None

    @jax.jit
    def lpips(img1, img2):
        x1 = img1[None] * 2.0 - 1.0
        x2 = img2[None] * 2.0 - 1.0
        f1 = _alex_features(weights, x1)
        f2 = _alex_features(weights, x2)
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            d = (_normalize_tensor(a) - _normalize_tensor(b)) ** 2
            lin = jnp.asarray(weights[f"lin{i}.model.1.weight"])[0, :, 0, 0]
            total = total + jnp.mean(jnp.sum(d * lin[None, :, None, None], axis=1))
        return total

    return lpips
