"""Optimization state pytrees.

The differentiable parameters are split from integer/recurrent state so that
``jax.grad`` sees only float leaves (the reference mixes them inside one
class; gflow/trainer.py:123-153 builds torch param groups from it).

Param groups mirror the reference optimizer exactly
(gflow/trainer.py:133-148): Gaussian attributes at ``lr``, camera pose at
``lr_camera``, and the scale/shift-invariant depth correction (a, b) at
``lr``.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Params(NamedTuple):
    """All differentiable leaves. Attribute arrays are raw (pre-activation),
    capacity-padded."""

    xyz: jax.Array      # (C, 3)
    scale: jax.Array    # (C, 3)
    rotate: jax.Array   # (C, 4) wxyz
    opacity: jax.Array  # (C, 1)
    rgb: jax.Array      # (C, 3)
    pose: jax.Array     # (7,) quat xyzw + translation (world->camera)
    depth_ab: jax.Array # (2,) scale/shift-invariant depth correction [a, b]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]


# lr-group id per leaf: 0 = attributes, 1 = pose ("extr"), 2 = depth a/b
PARAM_GROUPS = Params(
    xyz=0, scale=0, rotate=0, opacity=0, rgb=0, pose=1, depth_ab=2
)


class FrameState(NamedTuple):
    """Non-differentiable recurrent state carried across frames
    (reference caches: gflow/trainer.py:620-625 last_*; still bookkeeping
    trainer.py:588-599)."""

    n_alive: jax.Array          # () int32
    still_mask: jax.Array       # (C,) bool, meaningful for slots < last_num
    still_mask_tentative: jax.Array  # (C,) bool — fresh labels incl. old pts
    last_uv: jax.Array          # (C, 2)
    last_depth: jax.Array       # (C, 1)
    last_xyz: jax.Array         # (C, 3)
    last_num: jax.Array         # () int32  (0 == no previous fit — "has_last" signal)


def init_frame_state(capacity: int) -> FrameState:
    C = capacity
    return FrameState(
        n_alive=jnp.asarray(0, jnp.int32),
        still_mask=jnp.ones((C,), bool),
        still_mask_tentative=jnp.ones((C,), bool),
        last_uv=jnp.zeros((C, 2), jnp.float32),
        last_depth=jnp.zeros((C, 1), jnp.float32),
        last_xyz=jnp.zeros((C, 3), jnp.float32),
        last_num=jnp.asarray(0, jnp.int32),
    )


class Targets(NamedTuple):
    """Per-frame ground-truth priors (all device arrays)."""

    image: jax.Array      # (H, W, 3) in [0, 1]
    depth: jax.Array      # (H, W, 1)
    flow: jax.Array       # (H, W, 2) forward flow from PREVIOUS frame
    move_mask: jax.Array  # (H, W) bool epipolar moving-region prior
    occ_mask: jax.Array   # (H, W) bool occlusion mask (densify target)


class OptState(NamedTuple):
    """Hand-rolled Adam (torch semantics: b1=.9 b2=.999 eps=1e-8, bias
    correction). Fresh per train() stage, matching the reference's
    fresh-Adam-per-call (gflow/trainer.py:383)."""

    m: Params
    v: Params
    step: jax.Array           # () int32
    post_densify: jax.Array   # () bool — see densify.py for the mirrored quirk


def init_opt_state(params: Params) -> OptState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return OptState(
        m=zeros,
        v=zeros,
        step=jnp.asarray(0, jnp.int32),
        post_densify=jnp.asarray(False),
    )


def adam_update(
    params: Params,
    grads: Params,
    opt_state: OptState,
    lr_attr,
    lr_pose,
    lr_depth,
    b1=0.9,
    b2=0.999,
    eps=1e-8,
) -> tuple[Params, OptState]:
    step = opt_state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    lrs = [lr_attr, lr_pose, lr_depth]

    new_m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, opt_state.m, grads)
    new_v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, opt_state.v, grads)
    new_p = Params(
        *(
            p - lrs[grp] * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            for p, m, v, grp in zip(params, new_m, new_v, PARAM_GROUPS)
        )
    )
    return new_p, OptState(
        m=new_m, v=new_v, step=step, post_densify=opt_state.post_densify
    )
