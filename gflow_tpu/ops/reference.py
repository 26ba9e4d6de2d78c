"""Dense O(N*H*W) reference rasterizer — the correctness oracle.

Composites every Gaussian against every pixel in global front-to-back depth
order. Differentiable end-to-end by plain autodiff. Used for golden tests of
the tiled production path and as a CPU fallback for tiny scenes. Matches the
alpha-blending semantics of msplat's `alpha_blending` (call site:
gflow/utils/render.py:56-106): alpha = min(0.99, opa * exp(power)),
contributions below 1/255 are skipped, background fills residual
transmittance.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import TILE

ALPHA_CLAMP = 0.99
ALPHA_SKIP = 1.0 / 255.0


def composite_dense(
    uv: jax.Array,       # (N, 2)
    conic: jax.Array,    # (N, 3)
    opacity: jax.Array,  # (N, 1) activated
    features: jax.Array, # (N, F) activated
    depth: jax.Array,    # (N, 1) 0 == culled
    radius: jax.Array,   # (N,)
    bg,                  # scalar or (F,)
    W: int,
    H: int,
    tile_consistent: bool = True,
) -> jax.Array:
    """Returns (H, W, F).

    tile_consistent: when True, a Gaussian contributes only to pixels whose
    16x16 tile intersects its radius-square — exactly the visibility rule of
    the tile-binned path, so golden tests can compare bit-for-bit semantics.
    """
    N = uv.shape[0]
    visible = (depth[:, 0] > 0)

    # global depth order (invisible last)
    sort_key = jnp.where(visible, depth[:, 0], jnp.inf)
    order = jnp.argsort(sort_key)
    uv, conic, opacity, features = uv[order], conic[order], opacity[order], features[order]
    visible, radius = visible[order], radius[order]

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px = jnp.broadcast_to(xs[None, :], (H, W)).reshape(-1)  # (P,)
    py = jnp.broadcast_to(ys[:, None], (H, W)).reshape(-1)

    dx = px[None, :] - uv[:, 0:1]  # (N, P)
    dy = py[None, :] - uv[:, 1:2]
    a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    alpha = jnp.minimum(ALPHA_CLAMP, opacity * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where(power > 0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_SKIP, 0.0, alpha)
    alpha = alpha * visible[:, None]

    if tile_consistent:
        n_tx = -(-W // TILE)
        n_ty = -(-H // TILE)
        tx = (px // TILE).astype(jnp.int32)[None, :]
        ty = (py // TILE).astype(jnp.int32)[None, :]
        rminx, rmaxx, rminy, rmaxy = _tile_rect(uv, radius, n_tx, n_ty)
        in_rect = (
            (tx >= rminx[:, None]) & (tx < rmaxx[:, None])
            & (ty >= rminy[:, None]) & (ty < rmaxy[:, None])
        )
        alpha = jnp.where(in_rect, alpha, 0.0)

    trans = jnp.cumprod(1.0 - alpha, axis=0)  # inclusive
    trans_excl = jnp.concatenate([jnp.ones((1, alpha.shape[1])), trans[:-1]], axis=0)
    w = alpha * trans_excl  # (N, P)
    out = jnp.matmul(w.T, features, precision=jax.lax.Precision.HIGHEST)  # (P, F)
    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (features.shape[1],))
    out = out + trans[-1][:, None] * bg[None, :]
    return out.reshape(H, W, features.shape[1])


def _tile_rect(uv, radius, n_tx, n_ty):
    """Tile-grid rectangle [min, max) touched by each Gaussian's radius-square
    (same rule as 3DGS tile binning)."""
    rminx = jnp.clip(jnp.floor((uv[:, 0] - radius) / TILE), 0, n_tx).astype(jnp.int32)
    rmaxx = jnp.clip(
        jnp.floor((uv[:, 0] + radius + TILE - 1) / TILE), 0, n_tx
    ).astype(jnp.int32)
    rminy = jnp.clip(jnp.floor((uv[:, 1] - radius) / TILE), 0, n_ty).astype(jnp.int32)
    rmaxy = jnp.clip(
        jnp.floor((uv[:, 1] + radius + TILE - 1) / TILE), 0, n_ty
    ).astype(jnp.int32)
    return rminx, rmaxx, rminy, rmaxy
