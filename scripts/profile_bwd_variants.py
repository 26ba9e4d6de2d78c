"""Backward-kernel variant shootout: lane reductions & suffix-scan forms."""
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
    _alpha, _cumprod_excl, _cumsum_suffix_excl, _tile_origin,
    P_PIX, TILE_GROUP, _HI)

INNER = 30
HI3 = jax.lax.Precision.HIGHEST


def timeit(name, make_body, x0, n_outer=3):
    body = make_body()
    f = jax.jit(lambda c: jax.lax.fori_loop(0, INNER, body, c))
    c = f(x0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        c = f(c)
    jax.block_until_ready(c)
    print(f"{name:56s} {(time.perf_counter()-t0)/(n_outer*INNER)*1e3:8.3f} ms")
    return c


def make_bwd(n_tx, F, reduce_kind, suffix_kind):
    def kern(attr_ref, bg_ref, g_ref, dattr_ref):
        pid = pl.program_id(0)
        K = attr_ref.shape[1]
        bg = bg_ref[0]
        ones_p = jnp.ones((P_PIX, 1), jnp.float32)
        if suffix_kind == "matmul":
            row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
            U = (col > row).astype(jnp.float32)  # strictly upper
        for g_i in range(TILE_GROUP):
            t = pid * TILE_GROUP + g_i
            tx0, ty0 = _tile_origin(t, n_tx)
            attrs = attr_ref[g_i]
            uv = attrs[:, 0:2]
            conic = attrs[:, 2:5]
            op = attrs[:, 5:6]
            feat = attrs[:, 6:6 + F]
            g = g_ref[g_i]

            alpha, raw, dmask, dx, dy = _alpha(uv, conic, op, tx0, ty0)
            om = 1.0 - alpha
            t_excl = _cumprod_excl(om)
            w = alpha * t_excl
            t_final = t_excl[-1:] * om[-1:]

            fg = jnp.dot(feat, g.T, preferred_element_type=jnp.float32,
                         precision=_HI)
            bgg = jnp.dot(g, bg[:, None], preferred_element_type=jnp.float32,
                          precision=_HI).T

            wfg = w * fg
            if suffix_kind == "roll":
                S = _cumsum_suffix_excl(wfg)
            else:
                S = jnp.dot(U, wfg, preferred_element_type=jnp.float32,
                            precision=HI3)
            dalpha = t_excl * fg - (S + t_final * bgg) / om
            d_raw = jnp.where(dmask, dalpha, 0.0)

            dpower = d_raw * raw
            exp_p = jnp.where(op > 0, raw / jnp.maximum(op, 1e-20), 0.0)

            a = conic[:, 0:1]
            b = conic[:, 1:2]
            c = conic[:, 2:3]
            if reduce_kind == "sum":
                dop = jnp.sum(d_raw * exp_p, axis=1, keepdims=True)
                du = jnp.sum(dpower * (a * dx + b * dy), axis=1)[:, None]
                dv = jnp.sum(dpower * (c * dy + b * dx), axis=1)[:, None]
                da = jnp.sum(dpower * (-0.5 * dx * dx), axis=1)[:, None]
                db = jnp.sum(dpower * (-dx * dy), axis=1)[:, None]
                dc = jnp.sum(dpower * (-0.5 * dy * dy), axis=1)[:, None]
            else:
                red = lambda X: jnp.dot(X, ones_p,
                                        preferred_element_type=jnp.float32,
                                        precision=_HI)
                dop = red(d_raw * exp_p)
                du = red(dpower * (a * dx + b * dy))
                dv = red(dpower * (c * dy + b * dx))
                da = red(dpower * (-0.5 * dx * dx))
                db = red(dpower * (-dx * dy))
                dc = red(dpower * (-0.5 * dy * dy))
            dfeat = jnp.dot(w, g, preferred_element_type=jnp.float32,
                            precision=_HI)
            dattr_ref[g_i] = jnp.concatenate(
                [du, dv, da, db, dc, dop, dfeat], axis=1)

    def call(g_attrs, g_ct, bg_vec):
        T, K, CA = g_attrs.shape
        return pl.pallas_call(
            kern,
            grid=(T // TILE_GROUP,),
            in_specs=[
                pl.BlockSpec((TILE_GROUP, K, CA), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_GROUP, P_PIX, F), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_GROUP, K, CA), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, K, CA), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(g_attrs, bg_vec[None, :], g_ct)
    return call


def main():
    n_tx = 54
    T, K, F = 1620, 128, 4
    rng = np.random.default_rng(0)
    Tp = -(-T // TILE_GROUP) * TILE_GROUP
    uv_t = np.stack([(np.arange(Tp) % n_tx) * 16 + 8,
                     (np.arange(Tp) // n_tx) * 16 + 8], -1)
    uv = uv_t[:, None, :] + rng.normal(0, 10, (Tp, K, 2))
    a = rng.uniform(0.05, 0.5, (Tp, K, 1))
    c = rng.uniform(0.05, 0.5, (Tp, K, 1))
    b = rng.uniform(-1, 1, (Tp, K, 1)) * np.sqrt(a * c) * 0.5
    op = rng.uniform(0.3, 0.9, (Tp, K, 1))
    feat = rng.uniform(0, 1, (Tp, K, F))
    ga = jnp.asarray(np.concatenate([uv, a, b, c, op, feat], -1), jnp.float32)
    g_ct = jnp.asarray(rng.normal(size=(Tp, P_PIX, F)), jnp.float32)
    bg_vec = jnp.zeros((F,), jnp.float32)

    results = {}
    for rk in ("sum", "dot"):
        for sk in ("roll", "matmul"):
            call = make_bwd(n_tx, F, rk, sk)
            out = timeit(f"bwd reduce={rk} suffix={sk}",
                         lambda call=call: (
                             lambda i, cc: cc + 1e-9 * call(cc, g_ct, bg_vec)),
                         ga)
            results[(rk, sk)] = jax.jit(
                lambda cc, call=call: call(cc, g_ct, bg_vec))(ga)
    basev = np.asarray(results[("sum", "roll")])
    for k, v in results.items():
        err = np.max(np.abs(np.asarray(v) - basev)) / (np.abs(basev).max() + 1e-8)
        print(f"  {k}: max rel-to-peak diff vs base {err:.2e}")


if __name__ == "__main__":
    main()
