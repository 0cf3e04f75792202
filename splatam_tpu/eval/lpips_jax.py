"""LPIPS (AlexNet) in JAX.

Replaces the reference's torchmetrics LPIPS dependency
(utils/eval_helpers.py:20-21,484-485). The AlexNet feature trunk + linear
heads are implemented here; pretrained ImageNet weights are loaded from an
.npz when available (see `weights_path` resolution below;
scripts/export_lpips_weights.py produces it on a torchvision-enabled host).

When no pretrained npz exists (zero-egress environment), the metric falls
back to DETERMINISTIC SYNTHESIZED weights (He-init convs from a fixed seed,
uniform linear heads). Randomly-initialized convnet features are a studied
perceptual-distance baseline (they correlate with human judgments well above
pixel metrics, though below the trained calibration), so the number is
finite, reproducible, and monotone in perceptual distortion — but it is NOT
the canonical LPIPS calibration. Eval marks it as such; drop a real
`lpips_alex.npz` in ~/.cache/splatam_tpu/ to get canonical values.

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


def synthesize_weights(seed: int = 0) -> dict:
    """Deterministic stand-in weights in the exact pretrained-npz schema.

    He-normal conv kernels / zero biases per AlexNet stage, and uniform
    positive linear heads normalized so lpips(x, x + small noise) lands in
    the same order of magnitude as the trained calibration.
    """
    rng = np.random.default_rng(seed)
    state = {"_synthetic": np.array(True)}
    in_ch = 3
    for key, out_ch, k, _, _ in _ALEX_CFG:
        fan_in = in_ch * k * k
        state[f"{key}.weight"] = (
            rng.normal(0.0, np.sqrt(2.0 / fan_in), (out_ch, in_ch, k, k))
        ).astype(np.float32)
        state[f"{key}.bias"] = np.zeros((out_ch,), np.float32)
        in_ch = out_ch
    for i, (_, out_ch, _, _, _) in enumerate(_ALEX_CFG):
        state[f"lin{i}.model.1.weight"] = (
            rng.uniform(0.0, 2.0 / out_ch, (1, out_ch, 1, 1))
        ).astype(np.float32)
    return state


def _load_weights(weights_path: str | None, allow_synthetic: bool = True):
    """Returns (weights dict, synthetic flag) or (None, False)."""
    paths = [weights_path] if weights_path else DEFAULT_WEIGHT_PATHS
    for p in paths:
        if p and os.path.exists(p):
            w = dict(np.load(p))
            return w, bool(w.get("_synthetic", False))
    if allow_synthetic:
        return synthesize_weights(), True
    return None, False


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


def lpips_fn(weights_path: str | None = None, allow_synthetic: bool = True):
    """Returns a jitted lpips(img1, img2) over [3,H,W] images in [0,1]
    (with a `.synthetic` attribute), or None when pretrained weights are
    absent and `allow_synthetic` is False."""
    weights, synthetic = _load_weights(weights_path, allow_synthetic)
    if weights is None:
        return None
    weights = {k: v for k, v in weights.items() if k != "_synthetic"}

    @jax.jit
    def _lpips_jit(img1, img2):
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

    def lpips(img1, img2):
        return _lpips_jit(img1, img2)

    lpips.synthetic = synthetic
    return lpips
