"""Per-tile front-to-back alpha compositing (differentiable, chunked).

TPU-native replacement for msplat's `alpha_blending` CUDA kernel (call site:
gflow/utils/render.py:56-106). The CUDA kernel walks each tile's depth-sorted
Gaussian range sequentially per pixel with early termination. On TPU the same
math vectorizes: with a fixed per-tile capacity K and depth-sorted lists,

    out[p] = sum_k f_k * alpha_k[p] * prod_{j<k} (1 - alpha_j[p]) + T_final * bg

is an exclusive cumulative product over K followed by a (P, K) @ (K, F)
matmul — MXU-friendly, order-correct, and differentiable by plain autodiff
(no hand-written VJP needed; the Pallas kernel in pallas_raster.py is a
performance drop-in with identical semantics).

Memory is bounded by processing tiles in chunks with `jax.lax.map`: the
(chunk, K, P) alpha tensor never exceeds a few tens of MB.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .projection import TILE
from .reference import ALPHA_CLAMP, ALPHA_SKIP


def blend_tile_block(c_uv, c_conic, c_op, c_feat, c_px, c_py, bg):
    """Front-to-back alpha blend of a (C, K, ·) block of per-tile gathered
    attributes onto (C, P) pixel coordinates -> (C, P, F).

    The ONE compositing body every XLA path shares — the single-chip
    chunked path, the tile-sharded multi-chip path (both via
    composite_tiles), and the batched B-frames harness
    (parallel/multichip.composite_tiles_batched). The Pallas kernel
    (pallas_raster.py) is a semantics-identical performance drop-in,
    golden-tested against this."""
    dx = c_px[:, None, :] - c_uv[:, :, 0:1]  # (C, K, P)
    dy = c_py[:, None, :] - c_uv[:, :, 1:2]
    a = c_conic[:, :, 0:1]
    b = c_conic[:, :, 1:2]
    c = c_conic[:, :, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    # clamp before exp: a PSD conic keeps power <= 0, but padded/garbage
    # lanes can overflow exp and poison fused gradients with inf*0
    alpha = jnp.minimum(ALPHA_CLAMP, c_op * jnp.exp(jnp.minimum(power, 0.0)))
    alpha = jnp.where(power > 0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_SKIP, 0.0, alpha)

    trans = jnp.cumprod(1.0 - alpha, axis=1)  # inclusive, (C, K, P)
    trans_excl = jnp.concatenate(
        [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=1
    )
    w = alpha * trans_excl  # (C, K, P)
    out = jnp.einsum(
        "ckp,ckf->cpf", w, c_feat, precision=jax.lax.Precision.HIGHEST
    )  # (C, P, F)
    return out + trans[:, -1][:, :, None] * bg[None, None, :]


def composite_tiles(
    tile_lists: jax.Array,  # (T, K) int32, -1 = empty
    uv: jax.Array,          # (N, 2)
    conic: jax.Array,       # (N, 3)
    opacity: jax.Array,     # (N, 1) activated
    features: jax.Array,    # (N, F) activated
    bg,                     # scalar or (F,)
    W: int,
    H: int,
    n_tx: int,
    n_ty: int,
    tile_chunk: int = 64,
    shard_axes: tuple | None = None,
) -> jax.Array:
    """Returns the composited image (H, W, F).

    shard_axes (static): mesh axis name(s) to shard the tile dimension over
    — the multi-chip mode (SURVEY 2.3(i): per-tile compositing is
    embarrassingly parallel; the backward's per-Gaussian gradient
    scatter-add becomes an XLA all-reduce over ICI). Requires an ambient
    mesh (jax.set_mesh). The sharded path skips lax.map chunking — a scan
    serializes under GSPMD; sharding the tile axis already bounds the
    per-device (T/D, K, P) alpha tensor — and is otherwise the SAME code
    as the single-chip chunked path (one shared do_tiles body)."""
    T, K = tile_lists.shape
    F = features.shape[1]
    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (F,))

    idx = tile_lists
    valid = idx >= 0
    safe = jnp.where(valid, idx, 0)
    # pre-gather per-tile packed attributes: (T, K, 2+3+1+F)
    g_uv = uv[safe]
    g_conic = conic[safe]
    g_op = jnp.where(valid[..., None], opacity[safe], 0.0)
    g_feat = features[safe]

    # per-tile pixel coordinates
    tile_ids = jnp.arange(T, dtype=jnp.int32)
    tx0 = (tile_ids % n_tx) * TILE
    ty0 = (tile_ids // n_tx) * TILE
    P = TILE * TILE
    off = jnp.arange(P, dtype=jnp.float32)
    offx = off % TILE
    offy = off // TILE
    px = tx0[:, None].astype(jnp.float32) + offx[None, :]  # (T, P)
    py = ty0[:, None].astype(jnp.float32) + offy[None, :]

    def do_chunk(args):
        return blend_tile_block(*args, bg=bg)

    if shard_axes is not None:
        from jax.sharding import PartitionSpec

        def constrain(x):
            spec = PartitionSpec(shard_axes, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(x, spec)

        out = do_chunk(jax.tree.map(
            constrain, (g_uv, g_conic, g_op, g_feat, px, py)
        ))  # (T, P, F), tile axis sharded
    else:
        n_chunks = -(-T // tile_chunk)
        pad = n_chunks * tile_chunk - T

        def reshape_chunks(x):
            padded = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
            return padded.reshape((n_chunks, tile_chunk) + x.shape[1:])

        chunks = jax.tree.map(
            reshape_chunks, (g_uv, g_conic, g_op, g_feat, px, py)
        )
        out_chunks = jax.lax.map(do_chunk, chunks)  # (n_chunks, chunk, P, F)
        out = out_chunks.reshape(n_chunks * tile_chunk, P, F)[:T]
    # (T, P, F) -> (n_ty, n_tx, TILE, TILE, F) -> (H_pad, W_pad, F) -> crop
    img = (
        out.reshape(n_ty, n_tx, TILE, TILE, F)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_ty * TILE, n_tx * TILE, F)
    )
    return img[:H, :W]
