"""Microbenchmark: Hillis-Steele scan variants for the compositor kernels.

The fwd/bwd kernels spend most cycles in log-shift scans over (K=128,
P=256) blocks. Candidates:
  A. status quo: roll along axis 0 (sublanes), 7 passes
  B. transposed: (P, K) layout, roll along axis 1 (lanes), 7 passes
  C. two-level (chunked) scan axis 0: 4 segmented passes + chunk-carry
Grid/iteration structure mirrors the real kernels (TILE_GROUP unrolled,
405 grid steps == 1620 tiles).
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, P = 128, 256
TILE_GROUP = 4
T = 1620
INNER = 30


def timeit(name, f, x0, n_outer=3):
    jf = jax.jit(lambda c: jax.lax.fori_loop(0, INNER, f, c))
    c = jf(x0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        c = jf(c)
    jax.block_until_ready(c)
    print(f"{name:56s} {(time.perf_counter()-t0)/(n_outer*INNER)*1e3:8.3f} ms")


def scan_a(x):  # (K, P) axis-0 rolls
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    e = jnp.where(row >= 1, pltpu.roll(x, 1, axis=0), 1.0)
    s = 1
    while s < K:
        e = e * jnp.where(row >= s + 1, pltpu.roll(e, s, axis=0), 1.0)
        s *= 2
    return e


def scan_b(x):  # (P, K) axis-1 rolls
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    e = jnp.where(col >= 1, pltpu.roll(x, 1, axis=1), 1.0)
    s = 1
    while s < K:
        e = e * jnp.where(col >= s + 1, pltpu.roll(e, s, axis=1), 1.0)
        s *= 2
    return e


def scan_c(x, c=16):  # two-level: segmented local + chunk carries
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    seg = row & (c - 1)
    e = jnp.where(seg >= 1, pltpu.roll(x, 1, axis=0), 1.0)
    s = 1
    while s < c:
        e = e * jnp.where(seg >= s + 1, pltpu.roll(e, s, axis=0), 1.0)
        s *= 2
    nc = K // c
    tot = x.reshape(nc, c, -1)  # manual tree product (no reduce_prod on TPU)
    while tot.shape[1] > 1:
        h = tot.shape[1] // 2
        tot = tot[:, :h] * tot[:, h:]
    tot = tot[:, 0]  # (NC, P)
    crow = jax.lax.broadcasted_iota(jnp.int32, tot.shape, 0)
    ce = jnp.where(crow >= 1, pltpu.roll(tot, 1, axis=0), 1.0)
    s = 1
    while s < nc:
        ce = ce * jnp.where(crow >= s + 1, pltpu.roll(ce, s, axis=0), 1.0)
        s *= 2
    carry = jnp.broadcast_to(ce[:, None, :], (nc, c, ce.shape[-1]))
    return e * carry.reshape(x.shape)


def make_kernel(scan, transposed):
    def kern(x_ref, o_ref):
        for g in range(TILE_GROUP):
            x = x_ref[g]
            e = scan(x)
            o_ref[g] = jnp.sum(e, axis=(0 if transposed else 0),
                               keepdims=True) * jnp.ones_like(x) * 1e-6 + x * 0.99
    return kern


def run(name, scan, transposed):
    a, b = (P, K) if transposed else (K, P)
    G = T // TILE_GROUP
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(0.9, 1.0, (T, a, b)), jnp.float32)

    kern = make_kernel(scan, transposed)
    call = pl.pallas_call(
        kern, grid=(G,),
        in_specs=[pl.BlockSpec((TILE_GROUP, a, b), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE_GROUP, a, b), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, a, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    timeit(name, lambda i, c: call(c), x0)


def main():
    run("A: (K,P) roll axis0, 7 passes", scan_a, False)
    run("B: (P,K) roll axis1 (lanes), 7 passes", scan_b, True)
    run("C: (K,P) two-level c=16", functools.partial(scan_c, c=16), False)
    run("C8: (K,P) two-level c=8", functools.partial(scan_c, c=8), False)


if __name__ == "__main__":
    main()
