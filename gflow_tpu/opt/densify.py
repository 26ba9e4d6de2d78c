"""Error-driven densification with static shapes.

The reference appends points by torch.cat and rebuilds the Adam optimizer
(gflow/trainer.py:878-951). Here the scene has fixed capacity, so densify is
a jit-safe scatter into free slots: a static `max_densify` sample is drawn
every call and entries beyond the dynamically-computed `densify_num` are
masked out. Sampling uses inverse-CDF over the error-probability map — the
same distribution as np.random.choice(p=...) (gflow/trainer.py:905).

Mirrored reference quirk (documented in SURVEY 7.4): after densification the
reference rebuilds Adam with ONLY the attribute group at constant lr
(trainer.py:951) — its LR scheduler stays attached to the dead optimizer, so
pose/depth updates stop and the schedule freezes for the rest of the stage.
We reproduce this via OptState.post_densify (moments reset, pose/depth lr=0,
constant attribute lr).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import pix2world
from .state import Params, OptState, init_opt_state
from ..core.scene import activate_inv


def densify_by_pixels(
    params: Params,
    n_alive: jax.Array,     # () int32
    error_map: jax.Array,   # (H, W) rgb pixel error
    mask: jax.Array,        # (H, W) bool region to densify (occ mask or error>thr)
    gt_image: jax.Array,    # (H, W, 3)
    gt_depth: jax.Array,    # (H, W, 1)
    intr: jax.Array,
    extr: jax.Array,
    num_points,             # scalar — the configured base point count
    percent,                # scalar
    key: jax.Array,
    max_densify: int,
):
    """Returns (new_params, new_n_alive, densify_num)."""
    H, W = error_map.shape
    C = params.capacity

    # error + min-positive uniform floor (trainer.py:884)
    pos = jnp.where(error_map > 0, error_map, jnp.inf)
    floor = jnp.min(pos)
    floor = jnp.where(jnp.isfinite(floor), floor, 1e-8)
    err = (error_map + floor) * mask.astype(error_map.dtype)

    mask_ratio = jnp.mean(mask.astype(jnp.float32))
    densify_num = (num_points * mask_ratio * percent).astype(jnp.int32)
    densify_num = jnp.minimum(densify_num, max_densify)
    densify_num = jnp.minimum(densify_num, C - n_alive)

    p = err.reshape(-1)
    cdf = jnp.cumsum(p)
    total = cdf[-1]
    u = jax.random.uniform(key, (max_densify,)) * total
    flat_idx = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, H * W - 1)
    ys = flat_idx // W
    xs = flat_idx % W

    take = jnp.arange(max_densify) < densify_num

    depths = gt_depth[ys, xs, 0]  # (M,)
    # scales = (1/num_points) * depth/depth.min over the selected sample
    # (trainer.py:912-915)
    dmin = jnp.min(jnp.where(take, depths, jnp.inf))
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 1.0)
    scales = (1.0 / num_points) * (depths / dmin)
    rgbs = jnp.clip(gt_image[ys, xs], 1e-15, 1 - 1e-15)

    uv = jnp.stack([xs, ys], axis=1).astype(jnp.float32)
    new_xyz = pix2world(uv, depths, intr, extr)  # (M, 3)
    new_scale = jnp.abs(scales)[:, None].repeat(3, axis=1)
    new_rotate = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32), (max_densify, 4)
    )
    new_opacity = jnp.full(
        (max_densify, 1), activate_inv("opacity", jnp.float32(0.99))
    )
    new_rgb = activate_inv("rgb", rgbs)

    slots = n_alive + jnp.arange(max_densify, dtype=jnp.int32)
    slots = jnp.where(take, slots, C)  # out-of-range -> dropped by scatter

    def put(arr, vals):
        return arr.at[slots].set(vals, mode="drop")

    new_params = params._replace(
        xyz=put(params.xyz, new_xyz),
        scale=put(params.scale, new_scale),
        rotate=put(params.rotate, new_rotate),
        opacity=put(params.opacity, new_opacity),
        rgb=put(params.rgb, new_rgb),
    )
    return new_params, n_alive + densify_num, densify_num


def reset_opt_after_densify(opt_state: OptState, params: Params) -> OptState:
    fresh = init_opt_state(params)
    return fresh._replace(post_densify=jnp.asarray(True))
