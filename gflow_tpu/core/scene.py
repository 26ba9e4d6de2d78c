"""Gaussian scene state as a fixed-capacity JAX pytree.

The reference stores raw (pre-activation) attribute tensors in a dict that
grows via ``torch.cat`` at densification (gflow/trainer.py:79-86, 941-951).
Growing shapes force recompilation under XLA, so the TPU-native design uses a
**fixed capacity** with a prefix-contiguous alive count: slots [0, n_alive)
hold live Gaussians; dead slots render as fully transparent (their activated
opacity is masked to 0 inside the rasterizer).

Activations (reference: gflow/trainer.py:58-77):
    scale   = |x|                 (raw kept positive; inverse is also |x|)
    rotate  = x / ||x||           (wxyz quaternion)
    opacity = sigmoid(10 * x)     ("sensitive sigmoid")
    rgb     = sigmoid(x)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

OPACITY_SENSITIVITY = 10.0


class GaussianScene(NamedTuple):
    """Raw (pre-activation) Gaussian attributes with a fixed capacity C."""

    xyz: jax.Array      # (C, 3)
    scale: jax.Array    # (C, 3) raw; activated by abs
    rotate: jax.Array   # (C, 4) wxyz; activated by L2-normalize
    opacity: jax.Array  # (C, 1) raw; activated by sigmoid(10x)
    rgb: jax.Array      # (C, 3) raw; activated by sigmoid
    n_alive: jax.Array  # () int32, number of live prefix slots

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def alive_mask(self) -> jax.Array:
        idx = jnp.arange(self.capacity)
        return idx < self.n_alive

    def activated(self):
        """Returns (xyz, scale, rotate, opacity, rgb) with activations applied
        and dead slots forced transparent."""
        alive = self.alive_mask()[:, None]
        return (
            self.xyz,
            jnp.abs(self.scale),
            _normalize(self.rotate),
            jax.nn.sigmoid(self.opacity * OPACITY_SENSITIVITY) * alive,
            jax.nn.sigmoid(self.rgb),
        )


def _normalize(q, eps=1e-12):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def activate(name: str, x: jax.Array) -> jax.Array:
    if name == "scale":
        return jnp.abs(x)
    if name == "rotate":
        return _normalize(x)
    if name == "opacity":
        return jax.nn.sigmoid(x * OPACITY_SENSITIVITY)
    if name == "rgb":
        return jax.nn.sigmoid(x)
    return x


def activate_inv(name: str, x: jax.Array) -> jax.Array:
    """Inverse activations used when writing values into the raw state."""
    if name == "scale":
        return jnp.abs(x)
    if name == "rotate":
        return _normalize(x)
    if name == "opacity":
        eps = 1e-15
        x = jnp.clip(x, eps, 1 - eps)
        return jax.scipy.special.logit(x) / OPACITY_SENSITIVITY
    if name == "rgb":
        eps = 1e-15
        x = jnp.clip(x, eps, 1 - eps)
        return jax.scipy.special.logit(x)
    return x


def scene_capacity(n_points: int, headroom: float = 2.0, align: int = 1024) -> int:
    """Pick a static capacity: n_points * headroom rounded up to `align`."""
    c = int(n_points * headroom)
    return max(align, -(-c // align) * align)


def make_empty_scene(capacity: int, key: jax.Array | None = None) -> GaussianScene:
    """Random-initialized scene matching the reference's defaults
    (gflow/trainer.py:79-86): xyz ~ U[-1,1], scale ~ U[0,1], rotate random
    unit quaternion, opacity = inv_sigmoid10(0.99), rgb ~ U[0,1] raw."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    C = capacity
    return GaussianScene(
        xyz=jax.random.uniform(k1, (C, 3), jnp.float32) * 2 - 1,
        scale=jax.random.uniform(k2, (C, 3), jnp.float32),
        rotate=_normalize(jax.random.uniform(k3, (C, 4), jnp.float32)),
        opacity=jnp.full((C, 1), activate_inv("opacity", jnp.float32(0.99))),
        rgb=jax.random.uniform(k4, (C, 3), jnp.float32),
        n_alive=jnp.asarray(C, jnp.int32),
    )


def scene_from_arrays(
    capacity: int,
    xyz: jax.Array,
    scale_act: jax.Array,
    rotate: jax.Array,
    opacity_act: jax.Array,
    rgb_act: jax.Array,
) -> GaussianScene:
    """Build a scene from *activated* values (scale/opacity/rgb in activated
    space), padding to `capacity`. Dead padding slots get opacity ~0 and are
    placed behind the camera origin so they cull cheaply."""
    n = xyz.shape[0]
    if n > capacity:
        raise ValueError(f"{n} points exceed capacity {capacity}")
    # normalize opacity to the declared (C, 1) column layout — a 1-D input
    # otherwise builds a scene whose activated() broadcasts (C,)·(C,1) into
    # a (C, C) opacity and fails deep inside the compositor
    opacity_act = jnp.asarray(opacity_act, jnp.float32).reshape(n, 1)

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((capacity - n,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    return GaussianScene(
        xyz=pad(jnp.asarray(xyz, jnp.float32), 0.0),
        scale=pad(activate_inv("scale", jnp.asarray(scale_act, jnp.float32)), 1e-8),
        rotate=pad(activate_inv("rotate", jnp.asarray(rotate, jnp.float32)), 0.5),
        opacity=pad(
            activate_inv("opacity", jnp.asarray(opacity_act, jnp.float32)), -1.0
        ),
        rgb=pad(activate_inv("rgb", jnp.asarray(rgb_act, jnp.float32)), 0.0),
        n_alive=jnp.asarray(n, jnp.int32),
    )
