"""Tile binning: build fixed-capacity, depth-sorted per-tile Gaussian lists.

TPU-native replacement for msplat's `sort_gaussian` (call site:
gflow/utils/render.py:52-54). The CUDA implementation duplicates each
Gaussian per touched 16x16 tile, radix-sorts packed (tile, depth) keys and
extracts per-tile ranges with atomics. On TPU we keep **static shapes**:

1. every Gaussian emits exactly MAX_TILES_PER_GAUSSIAN candidate entries
   (entries past its actual tile-rect get a sentinel tile id),
2. one `jax.lax.sort` lexicographically orders (tile, depth) — XLA's TPU sort
   is efficient and fully on-device,
3. per-tile ranks come from a vectorized searchsorted (segment starts), and a
   scatter with mode='drop' packs the first K entries of each tile into a
   dense (num_tiles, K) index matrix.

The resulting index matrix is integer data (treated as constant by autodiff);
gradients flow through the values *gathered* with it in the compositing
stage, matching how CUDA 3DGS treats its sorted ID lists.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import TILE
from .reference import _tile_rect


class TileBins(NamedTuple):
    tile_lists: jax.Array   # (T, K) int32 gaussian indices, -1 = empty
    tile_counts: jax.Array  # (T,) int32 number of valid entries (pre-truncation, capped at K in lists)
    n_tx: int
    n_ty: int


def bin_gaussians(
    uv: jax.Array,       # (N, 2)
    depth: jax.Array,    # (N, 1), 0 == culled
    radius: jax.Array,   # (N,)
    W: int,
    H: int,
    max_per_tile: int = 256,
    max_tiles_per_gaussian: int = 32,
) -> TileBins:
    N = uv.shape[0]
    M = max_tiles_per_gaussian
    K = max_per_tile
    n_tx = -(-W // TILE)
    n_ty = -(-H // TILE)
    T = n_tx * n_ty

    visible = depth[:, 0] > 0
    rminx, rmaxx, rminy, rmaxy = _tile_rect(uv, radius, n_tx, n_ty)
    rw = jnp.maximum(rmaxx - rminx, 0)
    rh = jnp.maximum(rmaxy - rminy, 0)
    n_rect = rw * rh

    # entry j of gaussian i covers tile (rminx + j % rw, rminy + j // rw)
    j = jnp.arange(M, dtype=jnp.int32)[None, :]  # (1, M)
    safe_rw = jnp.maximum(rw, 1)[:, None]
    ox = j % safe_rw
    oy = j // safe_rw
    tile = (rminy[:, None] + oy) * n_tx + (rminx[:, None] + ox)  # (N, M)
    valid = (j < n_rect[:, None]) & visible[:, None]
    tile = jnp.where(valid, tile, T)  # sentinel = T (out of range)

    tile_flat = tile.reshape(-1)
    depth_flat = jnp.broadcast_to(depth[:, 0:1], (N, M)).reshape(-1)
    idx_flat = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, M)
    ).reshape(-1)

    tile_s, _, idx_s = jax.lax.sort(
        (tile_flat, depth_flat, idx_flat), num_keys=2, is_stable=False
    )

    # rank within tile segment
    L = tile_s.shape[0]
    seg_start = jnp.searchsorted(tile_s, tile_s, side="left")
    rank = jnp.arange(L, dtype=jnp.int32) - seg_start.astype(jnp.int32)

    tile_lists = jnp.full((T, K), -1, jnp.int32)
    # entries with tile_s == T (sentinel) or rank >= K are dropped
    tile_lists = tile_lists.at[tile_s, rank].set(idx_s, mode="drop")

    ones = jnp.ones_like(tile_s)
    tile_counts = jnp.zeros((T,), jnp.int32).at[tile_s].add(ones, mode="drop")

    return TileBins(tile_lists=tile_lists, tile_counts=tile_counts, n_tx=n_tx, n_ty=n_ty)
