"""Pallas TPU kernel for per-tile front-to-back compositing (fwd + custom VJP).

Replaces the XLA-composed compositor (ops/composite.py) on the hot path.
Per 16x16 tile, with K depth-sorted candidates in VMEM:

    forward:  alpha_k[p] = min(.99, op_k exp(power_k[p]))  (masked)
              T_k = prod_{j<k} (1-alpha_j)   (exclusive cumprod)
              out[p] = (alpha*T)^T feat + T_final bg

    backward: the standard 3DGS suffix-sum trick:
              S_k = sum_{j>k} w_j (f_j.g),
              dalpha = T_k fg_k - (S_k + T_final (bg.g)) / (1-alpha_k),
              then chain to opacity / uv / conic; dfeat = w @ g.

The exclusive cumulative prod/sum run as Hillis-Steele log-shift passes
(pltpu.roll) directly in the product domain — no log1p/exp transcendentals
(measured on par with the log-space form; kept for the simpler backward).
Rejected variants, measured at canonical scale (854x480, K=128): a
(K,K)x(K,P) triangular matmul on the MXU — no faster; depth-slab
early-termination (the CUDA 3DGS trick) — 1.6-2.8x SLOWER in every count
regime, per-slab branch + scratch read/modify/write overhead exceeds the
skipped work on this VPU. Cumprod underflow to 0 for deep stacks is
exactly the saturated-transmittance regime and is harmless in both
directions (w=0, and the backward divides by 1-alpha, not T).

Each grid step processes TILE_GROUP tiles (statically unrolled) to amortize
per-step fixed costs; fully-empty tiles (tile_counts == 0 — background
regions) skip all math via a scalar predicate. All per-Gaussian inputs are
packed into ONE (T, K, 6+F) array: a single wide row-gather outside the
kernel is ~2x cheaper than four narrow ones, and its autodiff transpose —
the scatter-add of Gaussian gradients — becomes a single scatter.

Equivalent CUDA surface: msplat.alpha_blending fwd/bwd
(call site gflow/utils/render.py:56-106).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import TILE
from .reference import ALPHA_CLAMP, ALPHA_SKIP

P_PIX = TILE * TILE  # 256 pixels per tile
TILE_GROUP = 4       # tiles per grid step (unrolled)
_HI = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    """Run the kernels in Pallas interpret mode (pure-XLA emulation): lets
    the shard_map-wrapped compositors execute on the virtual-CPU test
    meshes (tests/test_multichip.py; __graft_entry__.dryrun_multichip).
    Env-gated (GFLOW_PALLAS_INTERPRET=1), read at trace time — production
    TPU paths never pay it."""
    import os

    return os.environ.get("GFLOW_PALLAS_INTERPRET", "0") == "1"


def _pixel_offsets():
    """(1, P) in-tile x/y pixel offsets as f32."""
    i = jax.lax.broadcasted_iota(jnp.int32, (1, P_PIX), 1)
    ox = (i & (TILE - 1)).astype(jnp.float32)
    oy = (i >> 4).astype(jnp.float32)  # TILE == 16
    return ox, oy


def _alpha(uv, conic, op, tx0, ty0):
    """uv (K,2), conic (K,3), op (K,1) -> alpha (K,P) + backward pieces."""
    ox, oy = _pixel_offsets()
    px = tx0 + ox  # (1, P)
    py = ty0 + oy
    dx = px - uv[:, 0:1]  # (K, P)
    dy = py - uv[:, 1:2]
    a = conic[:, 0:1]
    b = conic[:, 1:2]
    c = conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
    # clamped exp: PSD conics keep power <= 0; garbage lanes must not emit
    # inf (0*inf = NaN downstream in the hand-written backward)
    raw = op * jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.minimum(ALPHA_CLAMP, raw)
    live = (power <= 0) & (alpha >= ALPHA_SKIP)
    alpha = jnp.where(live, alpha, 0.0)
    # grad of alpha wrt raw is 1 only where live and unclamped
    dmask = live & (raw < ALPHA_CLAMP)
    return alpha, raw, dmask, dx, dy


def _cumprod_excl(x):
    """Exclusive cumulative product along axis 0 of (K, P): Hillis-Steele
    log-shift passes on the VPU (factors in [0.01, 1]; graceful underflow
    to 0 == fully saturated transmittance)."""
    K = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    e = jnp.where(row >= 1, pltpu.roll(x, 1, axis=0), 1.0)
    s = 1
    while s < K:
        e = e * jnp.where(row >= s + 1, pltpu.roll(e, s, axis=0), 1.0)
        s *= 2
    return e


def _cumsum_suffix_excl(x):
    """Exclusive suffix sum along axis 0: S[k] = sum_{j > k} x[j]."""
    K = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    # pltpu.roll is circular with non-negative shift: roll by K-s == shift -s
    e = jnp.where(row <= K - 2, pltpu.roll(x, K - 1, axis=0), 0.0)
    s = 1
    while s < K:
        e = e + jnp.where(row <= K - 1 - s - 1, pltpu.roll(e, K - s, axis=0), 0.0)
        s *= 2
    return e


def _tile_origin(t, n_tx):
    tx0 = ((t % n_tx) * TILE).astype(jnp.float32)
    ty0 = ((t // n_tx) * TILE).astype(jnp.float32)
    return tx0, ty0


def _fwd_kernel(cnt_ref, attr_ref, bg_ref, *out_refs, n_tx, F, with_cov):
    # attr layout along the last axis: uv(2) conic(3) opacity(1) feat(F)
    # [+ mov(1) when with_cov: a 0/1 moving flag; the second output is the
    #  per-pixel max moving alpha — the camera stage's coverage mask,
    #  computed from the SAME alpha the composite already evaluates]
    out_ref = out_refs[0]
    cov_ref = out_refs[1] if with_cov else None
    pid = pl.program_id(0)
    for g in range(TILE_GROUP):
        t = pid * TILE_GROUP + g
        tx0, ty0 = _tile_origin(t, n_tx)
        count = cnt_ref[pid, g]

        @pl.when(count > 0)
        def _(g=g, tx0=tx0, ty0=ty0):
            attrs = attr_ref[g]
            uv = attrs[:, 0:2]
            conic = attrs[:, 2:5]
            op = attrs[:, 5:6]
            feat = attrs[:, 6:6 + F]
            alpha, _, _, _, _ = _alpha(uv, conic, op, tx0, ty0)
            # packed lists are contiguous: slots >= count hold garbage
            # (clamped gathers of row 0) — zero them HERE instead of an
            # XLA-side masked opacity write (profiled 2x0.5 ms/iter of
            # dynamic-update-slice over the whole (T,K,CA) pack)
            K = attrs.shape[0]
            alive = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) < count
            alpha = jnp.where(alive, alpha, 0.0)
            t_excl = _cumprod_excl(1.0 - alpha)
            w = alpha * t_excl  # (K, P)
            out = jnp.dot(w.T, feat, preferred_element_type=jnp.float32,
                          precision=_HI)  # (P, F)
            t_final = t_excl[-1:] * (1.0 - alpha[-1:])  # (1, P)
            out_ref[g] = out + t_final.T * bg_ref[0][None, :]
            if with_cov:
                mov = attrs[:, 6 + F:7 + F]  # (K, 1)
                cov_ref[g] = jnp.max(alpha * mov, axis=0)[:, None]

        @pl.when(count <= 0)
        def _(g=g):
            out_ref[g] = jnp.broadcast_to(bg_ref[0][None, :], (P_PIX, F))
            if with_cov:
                cov_ref[g] = jnp.zeros((P_PIX, 1), jnp.float32)


def _bwd_kernel(cnt_ref, attr_ref, bg_ref, g_ref, dattr_ref, *, n_tx, F,
                with_cov=False):
    # with_cov: attrs carry a trailing mov flag column; its gradient is zero
    # (the coverage output is used only through a boolean threshold)
    pid = pl.program_id(0)
    K = attr_ref.shape[1]
    CA = 6 + F + (1 if with_cov else 0)
    bg = bg_ref[0]  # (F,)
    for g_i in range(TILE_GROUP):
        t = pid * TILE_GROUP + g_i
        tx0, ty0 = _tile_origin(t, n_tx)
        count = cnt_ref[pid, g_i]

        @pl.when(count > 0)
        def _(g_i=g_i, tx0=tx0, ty0=ty0):
            attrs = attr_ref[g_i]
            uv = attrs[:, 0:2]
            conic = attrs[:, 2:5]
            op = attrs[:, 5:6]
            feat = attrs[:, 6:6 + F]
            g = g_ref[g_i]  # (P, F)

            alpha, raw, dmask, dx, dy = _alpha(uv, conic, op, tx0, ty0)
            alive = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0) < count
            alpha = jnp.where(alive, alpha, 0.0)
            dmask = dmask & alive  # garbage slots: zero grads (see fwd)
            om = 1.0 - alpha
            t_excl = _cumprod_excl(om)
            w = alpha * t_excl
            t_final = t_excl[-1:] * om[-1:]  # (1, P)

            fg = jnp.dot(feat, g.T, preferred_element_type=jnp.float32,
                         precision=_HI)  # (K, P)
            bgg = jnp.dot(g, bg[:, None], preferred_element_type=jnp.float32,
                          precision=_HI).T  # (1, P)

            S = _cumsum_suffix_excl(w * fg)  # S[k] = sum_{j > k} w_j fg_j
            dalpha = t_excl * fg - (S + t_final * bgg) / om
            d_raw = jnp.where(dmask, dalpha, 0.0)  # d alpha / d raw gate

            # raw = op * exp(power)
            dpower = d_raw * raw
            # d_raw * exp(power) == dpower / op with op constant per
            # gaussian: one moment sum + (K,1) divide replaces a (K,P)
            # divide + multiply + its own reduction
            s0 = jnp.sum(dpower, axis=1, keepdims=True)
            dop = jnp.where(op > 0, s0 / jnp.maximum(op, 1e-20), 0.0)

            a = conic[:, 0:1]
            b = conic[:, 1:2]
            c = conic[:, 2:3]
            # power = -0.5 (a dx^2 + c dy^2) - b dx dy ; d dx/du = -1.
            # a/b/c are constant across the tile's pixels, so factor them
            # OUT of the lane reductions: 5 moment sums replace 5 full
            # (K, P) integrand builds (profiled: the kernels are elementwise
            # -bound, not scan-bound — this trims the dominant term).
            dpx = dpower * dx
            dpy = dpower * dy
            s1 = jnp.sum(dpx, axis=1, keepdims=True)
            s2 = jnp.sum(dpy, axis=1, keepdims=True)
            s3 = jnp.sum(dpx * dx, axis=1, keepdims=True)
            s4 = jnp.sum(dpx * dy, axis=1, keepdims=True)
            s5 = jnp.sum(dpy * dy, axis=1, keepdims=True)
            du = (a * s1 + b * s2)[:, 0]
            dv = (c * s2 + b * s1)[:, 0]
            da = (-0.5 * s3)[:, 0]
            db = (-s4)[:, 0]
            dc = (-0.5 * s5)[:, 0]
            dfeat = jnp.dot(w, g, preferred_element_type=jnp.float32,
                            precision=_HI)  # (K, F)
            cols = [du[:, None], dv[:, None], da[:, None], db[:, None],
                    dc[:, None], dop, dfeat]
            if with_cov:
                cols.append(jnp.zeros((K, 1), jnp.float32))
            dattr_ref[g_i] = jnp.concatenate(cols, axis=1)

        @pl.when(count <= 0)
        def _(g_i=g_i):
            dattr_ref[g_i] = jnp.zeros((K, CA), jnp.float32)


def _block(K, C):
    return pl.BlockSpec((TILE_GROUP, K, C), lambda t: (t, 0, 0),
                        memory_space=pltpu.VMEM)


def _cnt_spec(G):
    return pl.BlockSpec((G, TILE_GROUP), lambda t: (0, 0),
                        memory_space=pltpu.SMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _packed_composite(g_attrs, counts, bg_vec, n_tx, with_cov=False):
    return _packed_fwd_call(g_attrs, counts, bg_vec, n_tx, with_cov)


def _packed_fwd_call(g_attrs, counts, bg_vec, n_tx, with_cov=False):
    T, K, CA = g_attrs.shape
    F = CA - 6 - (1 if with_cov else 0)
    G = T // TILE_GROUP
    out_shape = [jax.ShapeDtypeStruct((T, P_PIX, F), jnp.float32)]
    out_specs = [pl.BlockSpec((TILE_GROUP, P_PIX, F), lambda t: (t, 0, 0),
                              memory_space=pltpu.VMEM)]
    if with_cov:
        out_shape.append(jax.ShapeDtypeStruct((T, P_PIX, 1), jnp.float32))
        out_specs.append(
            pl.BlockSpec((TILE_GROUP, P_PIX, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_tx=n_tx, F=F, with_cov=with_cov),
        grid=(G,),
        in_specs=[
            _cnt_spec(G),
            _block(K, CA),
            pl.BlockSpec((1, F), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(counts.reshape(G, TILE_GROUP), g_attrs, bg_vec[None, :])
    return tuple(out) if with_cov else out[0]


def _packed_fwd(g_attrs, counts, bg_vec, n_tx, with_cov=False):
    out = _packed_fwd_call(g_attrs, counts, bg_vec, n_tx, with_cov)
    return out, (g_attrs, counts, bg_vec)


def _packed_bwd(n_tx, with_cov, res, g):
    g_attrs, counts, bg_vec = res
    if with_cov:
        g = g[0]  # coverage cotangent is structurally zero (bool threshold)
    T, K, CA = g_attrs.shape
    F = CA - 6 - (1 if with_cov else 0)
    G = T // TILE_GROUP
    dattrs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_tx=n_tx, F=F, with_cov=with_cov),
        grid=(G,),
        in_specs=[
            _cnt_spec(G),
            _block(K, CA),
            pl.BlockSpec((1, F), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_GROUP, P_PIX, F), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_block(K, CA),
        out_shape=jax.ShapeDtypeStruct((T, K, CA), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=_interpret(),
    )(counts.reshape(G, TILE_GROUP), g_attrs, bg_vec[None, :], g)
    return dattrs, None, jnp.zeros_like(bg_vec)


_packed_composite.defvjp(_packed_fwd, _packed_bwd)


def composite_tiles_pallas(tile_lists, uv, conic, opacity, features, bg,
                           W, H, n_tx, n_ty, tile_counts=None):
    """Drop-in replacement for ops.composite.composite_tiles (same semantics,
    Pallas-accelerated). Differentiable w.r.t. uv/conic/opacity/features via
    the custom VJP + XLA's gather transpose. tile_counts (uncapped per-tile
    entry counts from binning) lets empty background tiles skip all math;
    derived from tile_lists when not provided."""
    T, K = tile_lists.shape
    F = features.shape[1]
    bg_vec = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (F,))

    if tile_counts is None:
        counts = jnp.sum(tile_lists >= 0, axis=1).astype(jnp.int32)
    else:
        counts = jnp.minimum(tile_counts, K).astype(jnp.int32)

    # pad tile count to a TILE_GROUP multiple (padding tiles are empty; their
    # outputs are discarded by the [:T] crop below)
    T_pad = -(-T // TILE_GROUP) * TILE_GROUP
    if T_pad != T:
        tile_lists = jnp.concatenate(
            [tile_lists, jnp.full((T_pad - T, K), -1, tile_lists.dtype)], 0
        )
        counts = jnp.concatenate(
            [counts, jnp.zeros((T_pad - T,), counts.dtype)], 0
        )

    # single wide row gather; slots >= count gather row 0 harmlessly — the
    # kernel zeroes their alpha from the per-tile count (packed lists are
    # contiguous), so no masked-opacity rewrite of the pack is needed
    safe = jnp.maximum(tile_lists, 0)
    attrs = jnp.concatenate([uv, conic, opacity, features], axis=1)
    g_attrs = attrs[safe]

    out = _packed_composite(g_attrs, counts, bg_vec, n_tx)[:T]
    img = (
        out.reshape(n_ty, n_tx, TILE, TILE, F)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_ty * TILE, n_tx * TILE, F)
    )
    return img[:H, :W]


# ---------------------------------------------------------------------------
# Fused main-composite + moving-coverage (camera-only stage)
# ---------------------------------------------------------------------------


def composite_with_coverage_pallas(tile_lists, uv, conic, opacity, features,
                                   mov, bg, W, H, n_tx, n_ty,
                                   tile_counts=None):
    """Camera-only stage fast path: the moving-coverage mask rides the MAIN
    forward kernel as a second output (max over K of alpha * mov-flag, from
    the same alpha the composite already evaluates) — no second gather, no
    second kernel. Profiled: a separate coverage pass costs ~3.8 ms/iter at
    854x480/50k, as much as a full second composite; this form is ~free.

    max-alpha > 0 iff the moving-only composite differs from the background
    (the front-most contributing splat has positive transmittance), so the
    boolean support matches the reference's re-render + threshold
    (trainer.py:427-451). The coverage output carries no gradient (used only
    through a boolean threshold). Returns (img (H,W,F), coverage (H,W,1))."""
    T, K = tile_lists.shape
    F = features.shape[1]
    bg_vec = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (F,))

    if tile_counts is None:
        counts = jnp.sum(tile_lists >= 0, axis=1).astype(jnp.int32)
    else:
        counts = jnp.minimum(tile_counts, K).astype(jnp.int32)

    T_pad = -(-T // TILE_GROUP) * TILE_GROUP
    if T_pad != T:
        tile_lists = jnp.concatenate(
            [tile_lists, jnp.full((T_pad - T, K), -1, tile_lists.dtype)], 0
        )
        counts = jnp.concatenate(
            [counts, jnp.zeros((T_pad - T,), counts.dtype)], 0
        )

    safe = jnp.maximum(tile_lists, 0)  # in-kernel count masking, see above
    attrs = jnp.concatenate([uv, conic, opacity, features, mov], axis=1)
    g_attrs = attrs[safe]  # ONE wide gather, CA = 6+F+1

    img_flat, cov_flat = _packed_composite(g_attrs, counts, bg_vec, n_tx,
                                           True)
    img_flat, cov_flat = img_flat[:T], cov_flat[:T]

    def unflatten(out, C):
        img = (
            out.reshape(n_ty, n_tx, TILE, TILE, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(n_ty * TILE, n_tx * TILE, C)
        )
        return img[:H, :W]

    return unflatten(img_flat, F), unflatten(cov_flat, 1)


# ---------------------------------------------------------------------------
# shard_map-wrapped compositors (multi-chip fitting mode)
# ---------------------------------------------------------------------------


def _shard_setup(shard_axes, tile_lists, tile_counts, n_tx, n_ty):
    """Pad the tile-row count to a mesh-axis multiple and return
    (mesh, axis sizes, padded lists/counts, rows per shard)."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        raise ValueError(
            "sharded Pallas compositor requires an ambient jax.set_mesh mesh"
        )
    sizes = tuple(int(mesh.shape[a]) for a in shard_axes)
    D = 1
    for s in sizes:
        D *= s
    K = tile_lists.shape[1]
    if tile_counts is None:
        tile_counts = jnp.sum(tile_lists >= 0, axis=1).astype(jnp.int32)
    n_ty_pad = -(-n_ty // D) * D
    if n_ty_pad != n_ty:
        pr = (n_ty_pad - n_ty) * n_tx
        tile_lists = jnp.concatenate(
            [tile_lists, jnp.full((pr, K), -1, tile_lists.dtype)], 0
        )
        tile_counts = jnp.concatenate(
            [tile_counts, jnp.zeros((pr,), tile_counts.dtype)], 0
        )
    return mesh, sizes, tile_lists, tile_counts, n_ty_pad // D


def _band_index(shard_axes, sizes):
    """Linearized shard index over (possibly several) mesh axes."""
    idx = jnp.int32(0)
    for a, s in zip(shard_axes, sizes):
        idx = idx * s + jax.lax.axis_index(a)
    return idx


def composite_tiles_pallas_sharded(tile_lists, uv, conic, opacity, features,
                                   bg, W, H, n_tx, n_ty, shard_axes,
                                   tile_counts=None):
    """shard_map-wrapped Pallas compositor — the multi-chip fitting mode on
    the fast kernel (VERDICT r4 item 4; previously sharding forced the XLA
    compositor).

    The tile axis is row-major (tile id = ty*n_tx + tx), so sharding it in
    contiguous blocks hands each device a horizontal BAND of tile rows.
    Within a band the kernel runs unmodified: shift uv.y by the band's
    pixel origin and composite the band as a standalone
    (rows_per*TILE, n_tx*TILE) image — alpha depends only on (pixel - uv),
    invariant under the joint shift. Per-Gaussian inputs stay replicated
    (50k points is small); shard_map's transpose inserts the psum over
    their gradients — the same ICI all-reduce GSPMD places for the sharded
    XLA path (ops/composite.composite_tiles shard_axes)."""
    from jax.sharding import PartitionSpec as P

    mesh, sizes, tile_lists, tile_counts, rows_per = _shard_setup(
        shard_axes, tile_lists, tile_counts, n_tx, n_ty)
    band_H = rows_per * TILE
    Wp = n_tx * TILE
    F = features.shape[1]
    bg_vec = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (F,))

    def body(tl, cnt, uv, conic, opacity, features, bg_v):
        y0 = (_band_index(shard_axes, sizes) * band_H).astype(uv.dtype)
        shift = jnp.stack([jnp.zeros((), uv.dtype), y0])
        return composite_tiles_pallas(
            tl, uv - shift, conic, opacity, features, bg_v,
            Wp, band_H, n_tx, rows_per, tile_counts=cnt,
        )

    t_spec = P(shard_axes)
    rep = P()
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation; the replicated inputs' gradient psum is structural (the
    # transpose of an untiled in_spec), not vma-dependent — grad parity vs
    # the single-device compositor is locked in tests/test_multichip.py
    img = jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(t_spec, t_spec, rep, rep, rep, rep, rep),
        out_specs=P(shard_axes, None, None),
    )(tile_lists, tile_counts, uv, conic, opacity, features, bg_vec)
    return img[:H, :W]


def composite_with_coverage_pallas_sharded(tile_lists, uv, conic, opacity,
                                           features, mov, bg, W, H, n_tx,
                                           n_ty, shard_axes,
                                           tile_counts=None):
    """Sharded twin of composite_with_coverage_pallas (camera-only stage
    fast path): same band decomposition, two banded outputs."""
    from jax.sharding import PartitionSpec as P

    mesh, sizes, tile_lists, tile_counts, rows_per = _shard_setup(
        shard_axes, tile_lists, tile_counts, n_tx, n_ty)
    band_H = rows_per * TILE
    Wp = n_tx * TILE
    F = features.shape[1]
    bg_vec = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (F,))

    def body(tl, cnt, uv, conic, opacity, features, mov, bg_v):
        y0 = (_band_index(shard_axes, sizes) * band_H).astype(uv.dtype)
        shift = jnp.stack([jnp.zeros((), uv.dtype), y0])
        return composite_with_coverage_pallas(
            tl, uv - shift, conic, opacity, features, mov, bg_v,
            Wp, band_H, n_tx, rows_per, tile_counts=cnt,
        )

    t_spec = P(shard_axes)
    rep = P()
    img, cov = jax.shard_map(
        body, mesh=mesh, check_vma=False,
        in_specs=(t_spec, t_spec, rep, rep, rep, rep, rep, rep),
        out_specs=(P(shard_axes, None, None), P(shard_axes, None, None)),
    )(tile_lists, tile_counts, uv, conic, opacity, features, mov, bg_vec)
    return img[:H, :W], cov[:H, :W]
