"""In-situ cost attribution for the compositor kernels: clone the real
fwd/bwd kernels with individual stages stubbed out and time each variant
through the chained-fori harness (small carry; the (T,K,CA) operand is
regenerated on-device each iteration from the carry — identical traffic in
every variant, so deltas isolate the stubbed stage)."""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gflow_tpu.ops.pallas_raster import (
    _alpha, _cumprod_excl, _cumsum_suffix_excl, _tile_origin, _cnt_spec,
    _block, P_PIX, TILE_GROUP, _HI)

T, K, F = 1620, 128, 4
CA = 6 + F
T_pad = -(-T // TILE_GROUP) * TILE_GROUP
G = T_pad // TILE_GROUP
N_TX = 54
INNER = 40


def fwd_kernel(cnt_ref, attr_ref, bg_ref, out_ref, *, do_alpha, do_scan,
               do_mm):
    pid = pl.program_id(0)
    for g in range(TILE_GROUP):
        t = pid * TILE_GROUP + g
        tx0, ty0 = _tile_origin(t, N_TX)
        count = cnt_ref[pid, g]

        @pl.when(count > 0)
        def _(g=g, tx0=tx0, ty0=ty0):
            attrs = attr_ref[g]
            feat = attrs[:, 6:6 + F]
            if do_alpha:
                alpha, _, _, _, _ = _alpha(attrs[:, 0:2], attrs[:, 2:5],
                                           attrs[:, 5:6], tx0, ty0)
            else:
                alpha = attrs[:, 5:6] * jnp.ones((K, P_PIX), jnp.float32) * 0.01
            if do_scan:
                t_excl = _cumprod_excl(1.0 - alpha)
            else:
                t_excl = 1.0 - alpha * 0.5
            w = alpha * t_excl
            if do_mm:
                out = jnp.dot(w.T, feat, preferred_element_type=jnp.float32,
                              precision=_HI)
            else:
                out = jnp.sum(w, axis=0)[:, None] * jnp.ones(
                    (P_PIX, F), jnp.float32)
            t_final = t_excl[-1:] * (1.0 - alpha[-1:])
            out_ref[g] = out + t_final.T * bg_ref[0][None, :]

        @pl.when(count <= 0)
        def _(g=g):
            out_ref[g] = jnp.broadcast_to(bg_ref[0][None, :], (P_PIX, F))


def bwd_kernel(cnt_ref, attr_ref, bg_ref, g_ref, dattr_ref, *, do_alpha,
               do_scan1, do_scan2, do_mm, do_reduce):
    pid = pl.program_id(0)
    bg = bg_ref[0]
    for g_i in range(TILE_GROUP):
        t = pid * TILE_GROUP + g_i
        tx0, ty0 = _tile_origin(t, N_TX)
        count = cnt_ref[pid, g_i]

        @pl.when(count > 0)
        def _(g_i=g_i, tx0=tx0, ty0=ty0):
            attrs = attr_ref[g_i]
            conic = attrs[:, 2:5]
            op = attrs[:, 5:6]
            feat = attrs[:, 6:6 + F]
            g = g_ref[g_i]
            if do_alpha:
                alpha, raw, dmask, dx, dy = _alpha(attrs[:, 0:2], conic, op,
                                                   tx0, ty0)
            else:
                alpha = op * jnp.ones((K, P_PIX), jnp.float32) * 0.01
                raw, dmask = alpha, alpha > 0
                dx = dy = alpha
            om = 1.0 - alpha
            t_excl = _cumprod_excl(om) if do_scan1 else om
            w = alpha * t_excl
            t_final = t_excl[-1:] * om[-1:]
            if do_mm:
                fg = jnp.dot(feat, g.T, preferred_element_type=jnp.float32,
                             precision=_HI)
            else:
                fg = w
            bgg = jnp.dot(g, bg[:, None], preferred_element_type=jnp.float32,
                          precision=_HI).T
            S = _cumsum_suffix_excl(w * fg) if do_scan2 else w * fg
            dalpha = t_excl * fg - (S + t_final * bgg) / om
            d_raw = jnp.where(dmask, dalpha, 0.0)
            dpower = d_raw * raw
            exp_p = jnp.where(op > 0, raw / jnp.maximum(op, 1e-20), 0.0)
            a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]
            if do_reduce:
                dop = jnp.sum(d_raw * exp_p, axis=1, keepdims=True)
                du = jnp.sum(dpower * (a * dx + b * dy), axis=1)
                dv = jnp.sum(dpower * (c * dy + b * dx), axis=1)
                da = jnp.sum(dpower * (-0.5 * dx * dx), axis=1)
                db = jnp.sum(dpower * (-dx * dy), axis=1)
                dc = jnp.sum(dpower * (-0.5 * dy * dy), axis=1)
            else:
                dop = dpower[:, :1]
                du = dv = da = db = dc = dpower[:, 0]
            if do_mm:
                dfeat = jnp.dot(w, g, preferred_element_type=jnp.float32,
                                precision=_HI)
            else:
                dfeat = w[:, :F]
            dattr_ref[g_i] = jnp.concatenate(
                [du[:, None], dv[:, None], da[:, None], db[:, None],
                 dc[:, None], dop, dfeat], axis=1)

        @pl.when(count <= 0)
        def _(g_i=g_i):
            dattr_ref[g_i] = jnp.zeros((K, CA), jnp.float32)


def main():
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0.1, 0.9, (T_pad, K, CA)), jnp.float32)
    counts = jnp.full((G, TILE_GROUP), K, jnp.int32)
    bg = jnp.zeros((1, F), jnp.float32)
    g_ct = jnp.asarray(rng.uniform(-1, 1, (T_pad, P_PIX, F)), jnp.float32)

    def time_fwd(name, **flags):
        call = pl.pallas_call(
            functools.partial(fwd_kernel, **flags),
            grid=(G,),
            in_specs=[_cnt_spec(G), _block(K, CA),
                      pl.BlockSpec((1, F), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE_GROUP, P_PIX, F),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T_pad, P_PIX, F), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        def body(i, seed):
            attrs = base * (0.9 + 0.2 * seed)  # regenerated on-device
            out = call(counts, attrs, bg)
            return jnp.mean(out) * 1e-3 + seed * 0.999

        run(name, body)

    def time_bwd(name, **flags):
        call = pl.pallas_call(
            functools.partial(bwd_kernel, **flags),
            grid=(G,),
            in_specs=[_cnt_spec(G), _block(K, CA),
                      pl.BlockSpec((1, F), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((TILE_GROUP, P_PIX, F),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=_block(K, CA),
            out_shape=jax.ShapeDtypeStruct((T_pad, K, CA), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        def body(i, seed):
            attrs = base * (0.9 + 0.2 * seed)
            out = call(counts, attrs, bg, g_ct)
            return jnp.mean(out) * 1e-9 + seed * 0.999

        run(name, body)

    def run(name, body):
        jf = jax.jit(lambda s: jax.lax.fori_loop(0, INNER, body, s))
        s = jf(jnp.asarray(0.5))
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        n_outer = 3
        for _ in range(n_outer):
            s = jf(s)
        jax.block_until_ready(s)
        dt = (time.perf_counter() - t0) / (n_outer * INNER) * 1e3
        print(f"{name:52s} {dt:8.3f} ms")

    time_fwd("fwd FULL", do_alpha=True, do_scan=True, do_mm=True)
    time_fwd("fwd no scan", do_alpha=True, do_scan=False, do_mm=True)
    time_fwd("fwd no alpha", do_alpha=False, do_scan=True, do_mm=True)
    time_fwd("fwd no matmul", do_alpha=True, do_scan=True, do_mm=False)
    time_bwd("bwd FULL", do_alpha=True, do_scan1=True, do_scan2=True,
             do_mm=True, do_reduce=True)
    time_bwd("bwd no cumprod scan", do_alpha=True, do_scan1=False,
             do_scan2=True, do_mm=True, do_reduce=True)
    time_bwd("bwd no suffix scan", do_alpha=True, do_scan1=True,
             do_scan2=False, do_mm=True, do_reduce=True)
    time_bwd("bwd no alpha", do_alpha=False, do_scan1=True, do_scan2=True,
             do_mm=True, do_reduce=True)
    time_bwd("bwd no matmuls", do_alpha=True, do_scan1=True, do_scan2=True,
             do_mm=False, do_reduce=True)
    time_bwd("bwd no lane reductions", do_alpha=True, do_scan1=True,
             do_scan2=True, do_mm=True, do_reduce=False)


if __name__ == "__main__":
    main()
