"""Per-component timing of the train-step hot path at canonical bench scale.

Each component is timed by CHAINING it inside a jitted lax.fori_loop (the
output perturbs the next input), so one dispatch covers many real device
executions — immune to dispatch latency, async-queue artifacts, and any
result memoization in the axon tunnel. Not a test — a diagnostic.
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from gflow_tpu.ops.binning import bin_gaussians, tile_grid
from gflow_tpu.ops.projection import project_gaussians, supported_max_radius
from gflow_tpu.ops.pallas_raster import composite_tiles_pallas
from gflow_tpu.ops.render import RenderConfig

INNER = 50


def timeit(name, make_body, x0, n_outer=4):
    """make_body: () -> (body(i, carry) -> carry). Times INNER chained
    executions per dispatch."""
    body = make_body()
    f = jax.jit(lambda c: jax.lax.fori_loop(0, INNER, body, c))
    c = f(x0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        c = f(c)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / (n_outer * INNER) * 1e3
    print(f"{name:48s} {dt:8.3f} ms")
    return c


def main():
    W, H = 854, 480
    CAP = 65_536
    rng = np.random.default_rng(0)
    n = 50_000

    xyz = np.c_[rng.uniform(-2, 2, (CAP, 2)), rng.uniform(1.5, 6.0, (CAP, 1))]
    scale = rng.uniform(0.005, 0.03, (CAP, 3))
    rotate = rng.normal(size=(CAP, 4))
    rotate /= np.linalg.norm(rotate, axis=1, keepdims=True)
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

    def proj_f(xyz):
        return project_gaussians(xyz, scale, rotate, intr, extr, W, H,
                                 max_radius=max_r)

    timeit("projection fwd",
           lambda: (lambda i, c: c + 1e-7 * proj_f(c)["uv"].sum()), xyz)

    def proj_grad_body(i, c):
        g = jax.grad(lambda x: proj_f(x)["uv"].sum()
                     + proj_f(x)["conic"].sum())(c)
        return c + 1e-9 * g

    timeit("projection fwd+bwd", lambda: proj_grad_body, xyz)

    proj = jax.jit(proj_f)(xyz)
    uv, depth, conic, radius = (proj["uv"], proj["depth"], proj["conic"],
                                proj["radius"])

    bin_f = functools.partial(
        bin_gaussians, W=W, H=H, max_per_tile=cfg.max_per_tile,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian)

    def bin_body(i, c):
        bins = bin_f(c, depth, radius)
        return c + 1e-7 * bins.tile_lists.sum().astype(jnp.float32)

    timeit("binning (sort+pack)", lambda: bin_body, uv)
    bins = jax.jit(lambda u: bin_f(u, depth, radius))(uv)
    tl = bins.tile_lists
    print(f"  tiles={tl.shape[0]} K={tl.shape[1]} "
          f"overflow={float((bins.tile_counts > tl.shape[1]).mean()):.3f}")

    feats = jnp.concatenate([rgb, depth], axis=1)  # F=4 like train

    def gather_only(uv):
        valid = tl >= 0
        safe = jnp.where(valid, tl, 0)
        attrs = jnp.concatenate([uv, conic, opacity, feats], axis=1)
        g_attrs = attrs[safe]
        return g_attrs.at[..., 5:6].multiply(
            valid[..., None].astype(jnp.float32))

    timeit("gather (T,K,10)",
           lambda: (lambda i, c: c + 1e-7 * gather_only(c).sum()), uv)
    timeit("gather fwd+bwd (scatter-add transpose)",
           lambda: (lambda i, c: c + 1e-7 * jax.grad(
               lambda u: gather_only(u).sum())(c)), uv)

    def comp_f(uv):
        return composite_tiles_pallas(tl, uv, conic, opacity, feats, 0.0,
                                      W, H, n_tx, n_ty)

    timeit("composite fwd (gather+pallas)",
           lambda: (lambda i, c: c + 1e-7 * comp_f(c).sum()), uv)
    timeit("composite fwd+bwd (full)",
           lambda: (lambda i, c: c + 1e-9 * jax.grad(
               lambda u: comp_f(u).sum())(c)), uv)

    # pallas kernels alone (packed input, no gather)
    from gflow_tpu.ops.pallas_raster import (_packed_fwd_call, _packed_bwd,
                                             TILE_GROUP)
    T, K = tl.shape
    T_pad = -(-T // TILE_GROUP) * TILE_GROUP
    g_attrs0 = jax.jit(gather_only)(uv)
    g_attrs0 = jnp.concatenate(
        [g_attrs0, jnp.zeros((T_pad - T, K, 10))], 0)
    bg_vec = jnp.zeros((4,), jnp.float32)

    counts0 = jnp.minimum(bins.tile_counts, K).astype(jnp.int32)
    counts0 = jnp.concatenate(
        [counts0, jnp.zeros((T_pad - T,), jnp.int32)], 0)
    timeit("pallas fwd kernel only",
           lambda: (lambda i, c: c + 1e-7 * _packed_fwd_call(
               c, counts0, bg_vec, n_tx).sum()), g_attrs0)
    g_ct = jnp.ones((T_pad, 256, 4), jnp.float32)
    timeit("pallas bwd kernel only",
           lambda: (lambda i, c: c + 1e-9 * _packed_bwd(
               n_tx, (c, counts0, bg_vec), g_ct)[0]), g_attrs0)

    # full train iteration (forward+grad of everything incl losses)
    from gflow_tpu.opt import (LossWeights, StageConfig, StageDynamics,
                               Targets, init_frame_state)
    from gflow_tpu.opt.train import _forward, _gate_grads
    from gflow_tpu.opt.state import Params, init_opt_state, adam_update
    from gflow_tpu.opt.losses import flow_prior_terms

    params = Params(
        xyz=xyz, scale=scale, rotate=rotate,
        opacity=jnp.full((CAP, 1), 0.1), rgb=rgb,
        pose=jnp.asarray([1.0, 0, 0, 0, 0, 0, 0], jnp.float32),
        depth_ab=jnp.asarray([1.0, 0.0], jnp.float32),
    )
    state = init_frame_state(CAP)._replace(n_alive=jnp.asarray(n, jnp.int32))
    img_t = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    targets = Targets(
        image=img_t, depth=jnp.ones((H, W, 1)), flow=jnp.zeros((H, W, 2)),
        move_mask=jnp.zeros((H, W), bool), occ_mask=jnp.zeros((H, W), bool))
    scfg = StageConfig(W=W, H=H, iterations=300, render=cfg)
    dyn = StageDynamics.make(lr=1e-3, weights=LossWeights.make(
        rgb=1.0, depth=0.1, var=50.0, flow=0.01), num_points=n)
    fp = flow_prior_terms(state, targets, False, W, H)
    opt_state0 = init_opt_state(params)

    def full_iter(i, carry):
        params, opt_state = carry
        def loss_fn(p):
            return _forward(p, state.n_alive, state, targets, intr,
                            dyn.weights, scfg, flow_prior=fp)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = _gate_grads(grads, state, state.n_alive, False)
        p2, o2 = adam_update(params, grads, opt_state,
                             jnp.asarray(1e-3), jnp.asarray(0.0),
                             jnp.asarray(1e-3))
        return p2, o2

    timeit("FULL train iteration (fwd+bwd+adam)",
           lambda: full_iter, (params, opt_state0), n_outer=2)


if __name__ == "__main__":
    main()
