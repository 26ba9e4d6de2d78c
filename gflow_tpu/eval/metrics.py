"""Image quality metrics — PSNR / SSIM / LPIPS.

The reference uses the `piqa` package (gflow/benchmark.py:199-230); piqa is
not available here, so PSNR and SSIM are computed with our JAX
implementations (the SSIM matches the standard window-11/sigma-1.5
formulation) and LPIPS is provided as a JAX re-implementation of the
standard AlexNet-based metric that activates when a weights file is
supplied (this environment has no network access and ships no pretrained
CNN weights; benchmark reports None for LPIPS without weights, mirroring
the reference's behavior of skipping failed metrics,
gflow/benchmark.py:360-387).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..opt.losses import ssim as _ssim


def psnr(img: np.ndarray, ref: np.ndarray, max_val: float = 1.0) -> float:
    """Peak signal-to-noise ratio over (H, W, C) images in [0, max_val]."""
    mse = float(np.mean((np.asarray(img, np.float64) - np.asarray(ref, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(max_val**2 / mse))


def ssim_metric(img: np.ndarray, ref: np.ndarray) -> float:
    return float(_ssim(jnp.asarray(img, jnp.float32), jnp.asarray(ref, jnp.float32)))


# ---------------------------------------------------------------------------
# LPIPS (AlexNet backbone): weights-gated
# ---------------------------------------------------------------------------

LPIPS_WEIGHTS_ENV = "GFLOW_LPIPS_WEIGHTS"

_ALEX_CFG = [  # (out_channels, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool after these conv indices (AlexNet features)

_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def _alex_features(x, weights):
    """x: (1, 3, H, W) normalized; returns the 5 relu feature maps."""
    feats = []
    h = x
    for i, (_, k, s, p) in enumerate(_ALEX_CFG):
        wk = weights[f"conv{i}_w"]
        bk = weights[f"conv{i}_b"]
        h = jax.lax.conv_general_dilated(
            h, wk, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + bk[None, :, None, None]
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
    return feats


def load_lpips_weights(path: str | None = None):
    """Load converted LPIPS(Alex) weights from an .npz (conv{i}_w/b +
    lin{i}_w). Returns None when unavailable."""
    path = path or os.environ.get(LPIPS_WEIGHTS_ENV)
    if not path or not os.path.exists(path):
        return None
    d = np.load(path)
    return {k: jnp.asarray(d[k]) for k in d.files}


def lpips(img: np.ndarray, ref: np.ndarray, weights=None) -> float | None:
    """LPIPS(Alex). Inputs (H, W, 3) in [0, 1]. Returns None without weights."""
    if weights is None:
        weights = load_lpips_weights()
    if weights is None:
        return None

    def prep(x):
        x = jnp.asarray(x, jnp.float32) * 2 - 1  # [-1, 1]
        x = (x - _SHIFT) / _SCALE
        return jnp.transpose(x, (2, 0, 1))[None]

    fa = _alex_features(prep(img), weights)
    fb = _alex_features(prep(ref), weights)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        # upstream normalize_tensor: x / (||x|| + eps), eps OUTSIDE the sqrt
        a = a / (jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{i}_w"]  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return float(total)
