"""Pinhole camera model with a differentiable quaternion+translation pose.

Capability parity: the reference keeps intrinsics as a 4-vector [fx, fy, cx, cy]
and the world->camera pose as a 7-vector (unit quaternion xyzw + translation),
materializing a (3,4) extrinsic on demand (reference: gflow/trainer.py:40-42,
115-121, roma.RigidUnitQuat).  Unprojection uses fx for both axes
(reference: gflow/utils/geometry.py:104-116).

Conventions
-----------
- camera pose quaternion: **xyzw** (matches roma.RigidUnitQuat; identity = [0,0,0,1])
- Gaussian rotation quaternion (see ops/projection.py): **wxyz** (identity = [1,0,0,0])
- extr is world->camera: x_cam = R @ x_world + t, shape (3, 4)
- pixel coordinates: x (u) is the column index, y (v) the row index; the
  projected uv of a world point sits on the integer pixel grid (the reference
  indexes gt maps with ``uv.long()``).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Camera math is tiny but precision-critical: TPU matmuls default to bf16
# inputs, which costs ~1e-2 relative error — visible as >0.2 px projection
# error. Force full fp32 for all geometry matmuls.
_HI = jax.lax.Precision.HIGHEST


class Camera(NamedTuple):
    """Differentiable camera parameters (a pytree of two leaves)."""

    intr: jax.Array  # (4,) [fx, fy, cx, cy]
    pose: jax.Array  # (7,) [qx, qy, qz, qw, tx, ty, tz]  (world->camera)

    @property
    def extr(self) -> jax.Array:
        return pose_to_extr(self.pose)

    def with_focal_pp(self, focal=None, pp=None) -> "Camera":
        intr = self.intr
        if focal is not None:
            intr = intr.at[:2].set(jnp.asarray([focal, focal], intr.dtype))
        if pp is not None:
            intr = intr.at[2:].set(jnp.asarray(pp, intr.dtype))
        return self._replace(intr=intr)

    def with_extr(self, extr, scale=None) -> "Camera":
        extr = jnp.asarray(extr, jnp.float32)
        t = extr[:3, 3] * (scale if scale is not None else 1.0)
        pose = jnp.concatenate([rotmat_to_quat_xyzw(extr[:3, :3]), t])
        return self._replace(pose=pose)


def default_intrinsics(W: int, H: int) -> jax.Array:
    """90-degree-fov default intrinsics (reference: gflow/trainer.py:37-40)."""
    fov = math.pi / 2.0
    fx = 0.5 * float(W) / math.tan(0.5 * fov)
    fy = 0.5 * float(H) / math.tan(0.5 * fov)
    return jnp.asarray([fx, fy, W / 2.0, H / 2.0], jnp.float32)


def default_camera(W: int, H: int) -> Camera:
    return Camera(
        intr=default_intrinsics(W, H),
        pose=jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], jnp.float32),
    )


# ---------------------------------------------------------------------------
# Quaternion math
# ---------------------------------------------------------------------------


def quat_xyzw_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-normalizes and converts an xyzw quaternion to a (3,3) rotation."""
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    x, y, z, w = q[0], q[1], q[2], q[3]
    return _quat_components_to_rotmat(w, x, y, z)


def quat_wxyz_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-normalizes and converts a wxyz quaternion to a (3,3) rotation.

    Batched: accepts (..., 4) and returns (..., 3, 3).
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return _quat_components_to_rotmat(w, x, y, z)


def _quat_components_to_rotmat(w, x, y, z):
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat_xyzw(R: jax.Array) -> jax.Array:
    """Branchless (3,3) rotation -> xyzw quaternion (Shepperd's method).

    Computes all four candidate quaternions and selects the numerically best
    one — data-independent control flow so it jits cleanly.
    """
    R = jnp.asarray(R, jnp.float32)
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # candidate 0: trace-dominant
    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr])
    # candidate 1: x-dominant
    q1 = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12])
    # candidate 2: y-dominant
    q2 = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20])
    # candidate 3: z-dominant
    q3 = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01])

    cands = jnp.stack([q0, q1, q2, q3])  # (4, 4) xyzw
    scores = jnp.stack([tr, m00, m11, m22])
    best = jnp.argmax(scores)
    q = cands[best]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    # canonicalize sign (w >= 0)
    return q * jnp.where(q[3] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Pose <-> extrinsic
# ---------------------------------------------------------------------------


def pose_to_extr(pose: jax.Array) -> jax.Array:
    """(7,) quat-xyzw + translation -> (3,4) world->camera matrix."""
    R = quat_xyzw_to_rotmat(pose[:4])
    return jnp.concatenate([R, pose[4:7, None]], axis=1)


def extr_to_pose(extr: jax.Array) -> jax.Array:
    extr = jnp.asarray(extr, jnp.float32)
    return jnp.concatenate([rotmat_to_quat_xyzw(extr[:3, :3]), extr[:3, 3]])


# ---------------------------------------------------------------------------
# Projection / unprojection
# ---------------------------------------------------------------------------


def pix2world(uv: jax.Array, depth: jax.Array, intr: jax.Array, extr: jax.Array):
    """Unproject pixel coords + depth to world points.

    Mirrors the reference math exactly (gflow/utils/geometry.py:104-116):
    cam = [depth * (uv - pp) / fx, depth]  (fx used for BOTH axes), then
    world = inv([extr; 0 0 0 1]) applied to cam.

    uv: (N, 2) pixel xy; depth: (N,) or (N, 1); returns (N, 3).
    """
    depth = depth.reshape(-1, 1)
    focal = intr[0]
    pp = intr[2:4]
    cam = jnp.concatenate([depth * (uv - pp) / focal, depth], axis=-1)  # (N, 3)
    R = extr[:3, :3]
    t = extr[:3, 3]
    # inverse of [R|t]: x_world = R^T (x_cam - t)
    return jnp.matmul(cam - t, R, precision=_HI)


def world2pix(xyz: jax.Array, intr: jax.Array, extr: jax.Array):
    """Project world points to (uv, depth) with pinhole intrinsics.

    Equivalent surface to msplat.project_point (reference call site:
    gflow/utils/render.py:21-24): uv (N,2), depth (N,1); depth==0 encodes a
    culled point (behind the near plane).
    """
    R = extr[:3, :3]
    t = extr[:3, 3]
    cam = jnp.matmul(xyz, R.T, precision=_HI) + t  # (N, 3)
    z = cam[:, 2:3]
    near = 0.01
    safe_z = jnp.where(z > near, z, 1.0)
    u = intr[0] * cam[:, 0:1] / safe_z + intr[2]
    v = intr[1] * cam[:, 1:2] / safe_z + intr[3]
    visible = z > near
    uv = jnp.concatenate([u, v], axis=-1)
    uv = jnp.where(visible, uv, -9999.0)
    depth = jnp.where(visible, z, 0.0)
    return uv, depth
