"""Colormaps + ANSI logging (reference: gflow/utils/color.py).

The reference applies matplotlib colormaps on the host (implicitly detaching
gradients). Here the colormap is a 256-entry LUT baked as a JAX constant and
indexed with stop_gradient'd integer codes — jit-compatible, same semantics.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_ANSI = {
    "red": "\033[91m",
    "green": "\033[92m",
    "yellow": "\033[93m",
    "blue": "\033[94m",
    "purple": "\033[95m",
    "cyan": "\033[96m",
    "white": "\033[97m",
}


def print_color(msg, color="green"):
    code = _ANSI.get(color)
    print(f"{code} {msg}\033[00m" if code else msg)


@lru_cache(maxsize=None)
def _lut(colormap: str) -> np.ndarray:
    import matplotlib

    cmap = matplotlib.colormaps[colormap]
    return np.asarray(cmap(np.arange(256) / 255.0)[:, :3], np.float32)


def apply_float_colormap(
    image: jax.Array, colormap: str = "turbo", non_zero: bool = False
) -> jax.Array:
    """(..., 1) float values -> (..., 3) colormapped.

    Matches reference normalization (gflow/utils/color.py:24-43): shift by the
    min (of nonzero values when non_zero), divide by max, clip to [0,1],
    256-bin LUT lookup.
    """
    image = jax.lax.stop_gradient(image)
    if non_zero:
        nz = image != 0
        mn = jnp.min(jnp.where(nz, image, jnp.inf))
        mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    else:
        mn = jnp.min(image)
    image = image - mn
    image = image / (jnp.max(image) + 1e-5)
    image = jnp.clip(image, 0.0, 1.0)
    image = jnp.nan_to_num(image, nan=0.0)
    if colormap == "grey":
        return jnp.broadcast_to(image, image.shape[:-1] + (3,))
    codes = (image[..., 0] * 255).astype(jnp.int32)
    lut = jnp.asarray(_lut(colormap))
    return lut[codes]
