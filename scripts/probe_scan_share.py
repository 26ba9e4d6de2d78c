"""Measure the scans' share of the real compositor fwd+bwd by stubbing
_cumprod_excl/_cumsum_suffix_excl (numerically wrong, timing-only), using
the exact harness from profile_step.py (known to cross-validate against
bench.py)."""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import gflow_tpu.ops.pallas_raster as pr
from gflow_tpu.ops.binning import bin_gaussians, tile_grid
from gflow_tpu.ops.projection import project_gaussians, supported_max_radius
from gflow_tpu.ops.render import RenderConfig

INNER = 50


def timeit(name, make_body, x0, n_outer=4):
    body = make_body()
    f = jax.jit(lambda c: jax.lax.fori_loop(0, INNER, body, c))
    c = f(x0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        c = f(c)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / (n_outer * INNER) * 1e3
    print(f"{name:52s} {dt:8.3f} ms")
    return c


def main():
    W, H = 854, 480
    CAP = 65_536
    rng = np.random.default_rng(0)
    n = 50_000

    xyz = np.c_[rng.uniform(-2, 2, (CAP, 2)), rng.uniform(1.5, 6.0, (CAP, 1))]
    scale = rng.uniform(0.005, 0.03, (CAP, 3))
    rotate = np.tile([1.0, 0, 0, 0], (CAP, 1))
    opacity = rng.uniform(0.2, 0.9, (CAP, 1))
    opacity[n:] = 0.0
    rgb = rng.uniform(0, 1, (CAP, 3))
    intr = np.asarray([500.0, 500.0, W / 2, H / 2], np.float32)
    extr = np.c_[np.eye(3), np.zeros(3)].astype(np.float32)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    xyz, scale, rotate, opacity, rgb, intr, extr = map(
        f32, (xyz, scale, rotate, opacity, rgb, intr, extr))

    cfg = RenderConfig()
    max_r = supported_max_radius(cfg.max_tiles_per_gaussian)
    n_tx, n_ty = tile_grid(W, H)
    proj = jax.jit(lambda x: project_gaussians(
        x, scale, rotate, intr, extr, W, H, max_radius=max_r))(xyz)
    uv, depth, conic = proj["uv"], proj["depth"], proj["conic"]
    bins = jax.jit(lambda u: bin_gaussians(
        u, depth, proj["radius"], W, H, cfg.max_per_tile,
        cfg.max_tiles_per_gaussian))(uv)
    tl = bins.tile_lists
    feats = jnp.concatenate([rgb, depth], axis=1)

    def comp_f(uv):
        return pr.composite_tiles_pallas(tl, uv, conic, opacity, feats, 0.0,
                                         W, H, n_tx, n_ty)

    def fb(name):
        timeit(name + " fwd", lambda: (
            lambda i, c: c + 1e-7 * comp_f(c).sum()), uv)
        timeit(name + " fwd+bwd", lambda: (
            lambda i, c: c + 1e-9 * jax.grad(
                lambda u: comp_f(u).sum())(c)), uv)

    orig_prod, orig_suf = pr._cumprod_excl, pr._cumsum_suffix_excl

    fb("baseline")
    pr._cumprod_excl = lambda x: x * 0.99
    fb("no cumprod")
    pr._cumprod_excl = orig_prod
    pr._cumsum_suffix_excl = lambda x: x * 0.98
    fb("no suffix-sum (bwd only uses it)")
    pr._cumprod_excl = lambda x: x * 0.99
    fb("no scans at all")
    pr._cumprod_excl, pr._cumsum_suffix_excl = orig_prod, orig_suf


if __name__ == "__main__":
    main()
