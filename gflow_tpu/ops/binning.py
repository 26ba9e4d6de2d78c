"""Tile binning: build fixed-capacity, depth-sorted per-tile Gaussian lists.

TPU-native replacement for msplat's `sort_gaussian` (call site:
gflow/utils/render.py:52-54). The CUDA implementation duplicates each
Gaussian per touched 16x16 tile, radix-sorts packed (tile, depth) keys and
extracts per-tile ranges with atomics. On TPU we keep **static shapes**:

1. every Gaussian emits a fixed MX x MY grid of candidate tile entries
   covering its tile-rect (entries outside the rect get a sentinel id).
   MX is a power of two so the lane->offset decomposition is bit ops —
   integer div/mod by a *runtime* divisor has no TPU vector hardware and
   costs ~100x (measured: it dominated an early implementation),
2. one `jax.lax.sort` lexicographically orders (tile, depth) — XLA's TPU
   radix sort handles the ~1M-entry stream in well under a millisecond,
3. per-tile ranks come from a cummax over segment starts, and a scatter
   with mode='drop' packs the first K entries of each tile into a dense
   (num_tiles, K) index matrix.

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
    # arrays only (vmap-friendly); grid dims come from tile_grid(W, H)
    tile_lists: jax.Array   # (T, K) int32 gaussian indices, -1 = empty
    tile_counts: jax.Array  # (T,) int32 valid entries (uncapped count)


def tile_grid(W: int, H: int) -> tuple[int, int]:
    return -(-W // TILE), -(-H // TILE)


def _rect_grid_dims(max_tiles_per_gaussian: int) -> tuple[int, int]:
    """Static (MX, MY) candidate grid with MX a power of two."""
    m = max(4, max_tiles_per_gaussian)
    # wide-ish grids suit typical splats; MX power of two for cheap div/mod
    if m >= 64:
        return 8, 8
    if m >= 32:
        return 8, 4
    if m >= 16:
        return 4, 4
    return 4, 2


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
    MX, MY = _rect_grid_dims(max_tiles_per_gaussian)
    M = MX * MY
    K = max_per_tile
    n_tx, n_ty = tile_grid(W, H)
    T = n_tx * n_ty

    visible = depth[:, 0] > 0
    rminx, rmaxx, rminy, rmaxy = _tile_rect(uv, radius, n_tx, n_ty)

    # The static MX x MY candidate grid is CENTERED on the Gaussian's own
    # tile (clamped into its rect): when a large splat's rect exceeds the
    # grid, coverage is lost symmetrically at the far corners (where alpha
    # is smallest) instead of clipping one side — an anchored-at-rect-min
    # enumeration measurably destabilizes optimization of large splats.
    cx = jnp.floor(uv[:, 0] / TILE - (MX - 1) / 2).astype(jnp.int32)
    cy = jnp.floor(uv[:, 1] / TILE - (MY - 1) / 2).astype(jnp.int32)
    gx0 = jnp.clip(cx, rminx, jnp.maximum(rmaxx - MX, rminx))
    gy0 = jnp.clip(cy, rminy, jnp.maximum(rmaxy - MY, rminy))

    # entry j covers tile (gx0 + j % MX, gy0 + j // MX); static MX (power of
    # 2) keeps the decomposition on the VPU as shifts/masks
    j = jnp.arange(M, dtype=jnp.int32)[None, :]  # (1, M)
    ox = j & (MX - 1)
    oy = j >> (MX.bit_length() - 1)
    tx = gx0[:, None] + ox
    ty = gy0[:, None] + oy
    tile = ty * n_tx + tx  # (N, M)
    valid = (
        (tx < rmaxx[:, None]) & (ty < rmaxy[:, None]) & visible[:, None]
    )
    tile = jnp.where(valid, tile, T)  # sentinel = T (out of range)

    # pack (tile, depth) into ONE int32 sort key: tile in the high bits, the
    # top bits of the positive-float depth below (positive IEEE floats are
    # order-isomorphic to their bit patterns). A single-key 2-operand int32
    # sort is ~2x the 2-key 3-operand form on TPU (int64 keys are ~2x
    # SLOWER — no native i64 lanes); the ~1e-4 relative depth quantization
    # only permutes near-equal-depth splats.
    tile_bits = max((T + 1).bit_length(), 1)
    depth_nbits = 31 - tile_bits
    if depth_nbits < 12:
        raise ValueError(f"too many tiles ({T}) for int32 packed sort keys")
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(depth[:, 0], 0.0), jnp.int32
    ) >> (31 - depth_nbits)  # monotone for depth >= 0
    key = (tile << depth_nbits) | jnp.broadcast_to(
        depth_bits[:, None], (N, M)
    )
    key_flat = key.reshape(-1)
    idx_flat = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[:, None], (N, M)
    ).reshape(-1)

    key_s, idx_s = jax.lax.sort((key_flat, idx_flat), num_keys=1,
                                is_stable=False)
    tile_s = key_s >> depth_nbits

    # segment starts per tile via binary search over the sorted stream, then
    # a dense (T, K) gather — far cheaper on TPU than scattering L entries
    L = tile_s.shape[0]
    starts = jnp.searchsorted(
        tile_s, jnp.arange(T + 1, dtype=tile_s.dtype), side="left"
    ).astype(jnp.int32)  # (T+1,); starts[T] = first sentinel position
    k = jnp.arange(K, dtype=jnp.int32)
    pos = starts[:T, None] + k[None, :]           # (T, K)
    in_seg = pos < starts[1:, None]
    pos = jnp.minimum(pos, L - 1)
    tile_lists = jnp.where(in_seg, idx_s[pos], -1)
    tile_counts = starts[1:] - starts[:T]

    return TileBins(tile_lists=tile_lists, tile_counts=tile_counts)
