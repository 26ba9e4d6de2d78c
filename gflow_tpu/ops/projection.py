"""Differentiable Gaussian projection + EWA splatting (pure JAX).

Capability parity with the msplat CUDA ops invoked at
gflow/utils/render.py:21-49 (`project_point`, `compute_cov3d`, `ewa_project`),
but with NO custom backward: keeping this stage in plain JAX lets autodiff
produce gradients w.r.t. xyz / scale / rotation / intrinsics / **camera pose**
for free — the reference relies on pose gradients through projection for its
camera-only stage (gflow/trainer.py:130-137).

All math follows the standard 3DGS/EWA formulation:
  Sigma3 = R diag(s^2) R^T
  t      = W x + c                       (camera-space point)
  J      = d(proj)/d(t)                  (2x3 affine approximation)
  Sigma2 = J W Sigma3 W^T J^T + 0.3 I    (low-pass dilation)
  conic  = Sigma2^{-1}  (upper-tri a, b, c)
  radius = ceil(3 sqrt(lambda_max))
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


NEAR_PLANE = 0.01
DILATION = 0.3
TILE = 16

# full-fp32 matmuls: TPU's default bf16 matmul precision costs >0.2 px of
# projection error, which corrupts both rendering and pose gradients
_HI = jax.lax.Precision.HIGHEST


def compute_cov3d(scale: jax.Array, rotate_wxyz: jax.Array) -> jax.Array:
    """(N,3) scales + (N,4) wxyz quats -> (N,6) upper-triangular 3D covariance
    [xx, xy, xz, yy, yz, zz].

    Fully elementwise (no batched 3x3 matmuls — XLA lowers tiny batched
    matmuls to scalar loops on TPU, measured ~10x slower than this form)."""
    q = rotate_wxyz / jnp.maximum(
        jnp.linalg.norm(rotate_wxyz, axis=-1, keepdims=True), 1e-12
    )
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rotation matrix entries
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = scale[:, 0] ** 2
    s1 = scale[:, 1] ** 2
    s2 = scale[:, 2] ** 2
    # cov = R diag(s^2) R^T
    c_xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c_xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c_xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c_yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c_yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c_zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([c_xx, c_xy, c_xz, c_yy, c_yz, c_zz], axis=-1)


def supported_max_radius(max_tiles_per_gaussian: int) -> float:
    """Largest projected 3-sigma radius (px) the binning stage's static
    candidate grid is guaranteed to cover when centered on the splat
    (see ops/binning.py): (MX/2)*TILE - TILE/2 for the smaller grid axis."""
    from .binning import _rect_grid_dims

    mx, my = _rect_grid_dims(max_tiles_per_gaussian)
    return (min(mx, my) / 2) * TILE - TILE / 2


def project_gaussians(
    xyz: jax.Array,
    scale: jax.Array,
    rotate: jax.Array,
    intr: jax.Array,
    extr: jax.Array,
    W: int,
    H: int,
    max_radius: float | None = None,
):
    """Full projection pipeline in one differentiable function.

    Returns a dict with:
      uv      (N, 2) pixel coords (garbage where ~visible)
      depth   (N, 1) camera z; 0 where culled (msplat convention)
      conic   (N, 3) inverse 2D covariance, upper-tri (a, b, c)
      radius  (N,)   float extent (3 sigma) in pixels, 0 where invisible
      visible (N,)   bool
    """
    fx, fy, cx, cy = intr[0], intr[1], intr[2], intr[3]
    Rw2c = extr[:3, :3]
    t = extr[:3, 3]
    # elementwise world->camera (a (N,3)x(3,3) matmul at HIGHEST precision
    # lowers poorly on TPU; this form is exact f32 and fuses)
    X, Y, Z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    cam = jnp.stack(
        [
            Rw2c[0, 0] * X + Rw2c[0, 1] * Y + Rw2c[0, 2] * Z + t[0],
            Rw2c[1, 0] * X + Rw2c[1, 1] * Y + Rw2c[1, 2] * Z + t[1],
            Rw2c[2, 0] * X + Rw2c[2, 1] * Y + Rw2c[2, 2] * Z + t[2],
        ],
        axis=-1,
    )
    z = cam[:, 2]
    visible = z > NEAR_PLANE
    safe_z = jnp.where(visible, z, 1.0)

    u = fx * cam[:, 0] / safe_z + cx
    v = fy * cam[:, 1] / safe_z + cy
    uv = jnp.stack([u, v], axis=-1)

    # --- 3D covariance ---
    cov6 = compute_cov3d(scale, rotate)  # (N, 6)
    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = (cov6[:, i] for i in range(6))

    # --- EWA: clamp camera-space x/y to the (padded) frustum for stability ---
    lim_x = 1.3 * (0.5 * W / fx)
    lim_y = 1.3 * (0.5 * H / fy)
    tx = jnp.clip(cam[:, 0] / safe_z, -lim_x, lim_x) * safe_z
    ty = jnp.clip(cam[:, 1] / safe_z, -lim_y, lim_y) * safe_z

    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z
    # J rows (2x3): [fx/z, 0, -fx tx/z^2], [0, fy/z, -fy ty/z^2]
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # A = J @ W, rows a0 = j00*W0 + j02*W2 ; a1 = j11*W1 + j12*W2   (each (N,3))
    W0, W1, W2 = Rw2c[0], Rw2c[1], Rw2c[2]
    a0 = j00[:, None] * W0[None, :] + j02[:, None] * W2[None, :]
    a1 = j11[:, None] * W1[None, :] + j12[:, None] * W2[None, :]

    # Sigma2 = A Sigma3 A^T — expand with the packed symmetric cov
    def sigma_vec(a):  # Sigma3 @ a, for row vector a (N,3)
        sx = c_xx * a[:, 0] + c_xy * a[:, 1] + c_xz * a[:, 2]
        sy = c_xy * a[:, 0] + c_yy * a[:, 1] + c_yz * a[:, 2]
        sz = c_xz * a[:, 0] + c_yz * a[:, 1] + c_zz * a[:, 2]
        return jnp.stack([sx, sy, sz], axis=-1)

    s0 = sigma_vec(a0)
    cov2_a = jnp.sum(a0 * s0, axis=-1) + DILATION
    cov2_b = jnp.sum(a1 * s0, axis=-1)
    cov2_c = jnp.sum(a1 * sigma_vec(a1), axis=-1) + DILATION

    if max_radius is not None:
        # isotropically shrink the 2D covariance so the 3-sigma radius never
        # exceeds what the binning stage's static per-Gaussian tile grid can
        # cover. Without this, oversized splats render as hard-edged squares
        # (the grid boundary) and their gradients chase the artifact. The
        # CUDA reference has unbounded per-tile lists and needs no cap; this
        # is the TPU static-shape trade, kept consistent between rendering
        # and binning so optimization stays well-posed.
        mid0 = 0.5 * (cov2_a + cov2_c)
        det0 = cov2_a * cov2_c - cov2_b * cov2_b
        lam0 = mid0 + jnp.sqrt(jnp.maximum(mid0 * mid0 - det0, 0.1))
        shrink = jnp.minimum(1.0, ((max_radius / 3.0) ** 2) / lam0)
        cov2_a = cov2_a * shrink
        cov2_b = cov2_b * shrink
        cov2_c = cov2_c * shrink

    det = cov2_a * cov2_c - cov2_b * cov2_b
    det_ok = det > 1e-12
    # the +0.3 dilation guarantees det >= 0.3*(a+c) + 0.09 mathematically;
    # values below that are fp cancellation on huge covariances. Flooring the
    # divisor bounds conic magnitudes AND the 1/det^2 terms in its gradient —
    # unbounded they overflow f32 to inf and poison Adam moments with NaN.
    safe_det = jnp.maximum(det, 9e-2)
    conic = jnp.stack(
        [cov2_c / safe_det, -cov2_b / safe_det, cov2_a / safe_det], axis=-1
    )

    mid = 0.5 * (cov2_a + cov2_c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    # cull: behind near plane, degenerate cov, or fully off-screen
    on_screen = (
        (u + radius > 0) & (u - radius < W) & (v + radius > 0) & (v - radius < H)
    )
    visible = visible & det_ok & on_screen
    radius = jnp.where(visible, radius, 0.0)
    depth = jnp.where(visible, z, 0.0)[:, None]
    uv = jnp.where(visible[:, None], uv, -9999.0)

    return {
        "uv": uv,
        "depth": depth,
        "conic": conic,
        "radius": radius,
        "visible": visible,
    }
