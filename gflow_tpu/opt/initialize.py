"""Parameter initialization from the first frame
(reference: SimpleGaussian.init_gaussians_from_image, gflow/trainer.py:206-238).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.camera import pix2world, extr_to_pose
from ..core.sampling import complex_texture_sampling
from ..core.scene import activate_inv
from .state import Params


def init_params_from_image(
    gt_image: np.ndarray,   # (H, W, 3) float [0, 1]
    gt_depth: np.ndarray,   # (H, W)
    num_points: int,
    capacity: int,
    intr,                   # (4,)
    extr,                   # (3, 4) world->camera
    mask: np.ndarray | None = None,
    drop_to: int | None = None,
    rng: np.random.Generator | None = None,
):
    """Returns (Params, n_alive int). Gradient-importance pixel sampling,
    unprojection through the current camera, scales proportional to depth
    clamped at 1e-3 (trainer.py:223-225), opacity 0.99, random rotations."""
    xys, depths, scales, rgbs = complex_texture_sampling(
        gt_image, gt_depth, num_points=num_points, mask=mask, drop_to=drop_to,
        rng=rng,
    )
    n = xys.shape[0]
    if n > capacity:
        raise ValueError(f"init produced {n} > capacity {capacity} points")
    if rng is None:
        rng = np.random.default_rng()

    xyz = np.asarray(
        pix2world(jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(intr),
                  jnp.asarray(extr))
    )
    scales = scales * (depths / depths.min())
    scales = np.clip(scales, None, 1e-3)
    scales3 = np.repeat(scales[:, None], 3, axis=1)
    eps = 1e-15
    rgbs = np.clip(rgbs, eps, 1 - eps)
    rot = rng.random((n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)

    C = capacity

    def pad(x, fill=0.0):
        out = np.full((C,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    params = Params(
        xyz=pad(xyz),
        scale=pad(np.abs(scales3), 1e-8),
        rotate=pad(rot, 0.5),
        opacity=pad(
            np.asarray(activate_inv("opacity", jnp.full((n, 1), 0.99)), np.float32),
            -1.0,
        ),
        rgb=pad(np.asarray(activate_inv("rgb", jnp.asarray(rgbs)), np.float32)),
        pose=jnp.asarray(extr_to_pose(jnp.asarray(extr))),
        depth_ab=jnp.asarray([1.0, 0.0], jnp.float32),
    )
    return params, n
