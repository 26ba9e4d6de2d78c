"""Why is the camera-only stage slower per-iter than the full stage?

Times value_and_grad of _forward (the per-iteration hot body) under
camera_only True/False and ablations, chained in a fori_loop (one dispatch
covers INNER real executions; see profile_step.py for why).
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from gflow_tpu.opt import (LossWeights, StageConfig, StageDynamics, Targets,
                           init_frame_state)
from gflow_tpu.opt.initialize import init_params_from_image
from gflow_tpu.opt.losses import flow_prior_terms
from gflow_tpu.opt.train import _forward, _gate_grads
from gflow_tpu.opt.state import adam_update, init_opt_state
from gflow_tpu.ops.render import RenderConfig

INNER = 30


def timeit(name, body, x0, n_outer=3):
    f = jax.jit(lambda c: jax.lax.fori_loop(0, INNER, body, c))
    c = f(x0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n_outer):
        c = f(c)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / (n_outer * INNER) * 1e3
    print(f"{name:52s} {dt:8.3f} ms")


def main():
    W, H = 854, 480
    N, CAP = 50_000, 65_536
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    for c in range(3):
        img[..., c] = gaussian_filter(img[..., c], 8)
    img = (img - img.min()) / (img.max() - img.min())
    depth = (2 + img[..., 0]).astype(np.float32)
    intr = np.asarray([500.0, 500.0, W / 2, H / 2], np.float32)
    extr = np.c_[np.eye(3), np.zeros(3)].astype(np.float32)

    params, n = init_params_from_image(img, depth, N, CAP, intr, extr, rng=rng)
    # fake a previous frame so the camera stage's mov/still machinery engages
    state = init_frame_state(CAP)._replace(
        n_alive=jnp.asarray(n, jnp.int32),
        last_num=jnp.asarray(n, jnp.int32),
        last_xyz=params.xyz,
        last_uv=jnp.zeros((CAP, 2)) + jnp.asarray([W / 2.0, H / 2.0]),
        still_mask=jnp.ones((CAP,), bool),
    )
    targets = Targets(
        image=jnp.asarray(img), depth=jnp.asarray(depth)[..., None],
        flow=jnp.zeros((H, W, 2)), move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.zeros((H, W), bool))
    weights = LossWeights.make(rgb=1.0, depth=0.1, var=50.0, flow=0.01)
    intr_j = jnp.asarray(intr)
    rcfg = RenderConfig()

    def make_body(camera_only, lr_camera):
        cfg = StageConfig(W=W, H=H, iterations=150, camera_only=camera_only,
                          render=rcfg)
        fp = flow_prior_terms(state, targets, camera_only, W, H)
        lr_c = jnp.asarray(lr_camera, jnp.float32)

        def body(i, carry):
            p, o = carry
            def loss_fn(pp):
                return _forward(pp, state.n_alive, state, targets, intr_j,
                                weights, cfg, flow_prior=fp)
            (_, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            grads = _gate_grads(grads, state, state.n_alive, camera_only)
            return adam_update(p, grads, o, jnp.asarray(1e-3), lr_c,
                               jnp.asarray(1e-3))
        return body

    o0 = init_opt_state(params)
    timeit("full iter (camera_only=False, lr_cam=0)",
           make_body(False, 0.0), (params, o0))
    timeit("camera iter (camera_only=True, lr_cam=1e-3)",
           make_body(True, 1e-3), (params, o0))
    timeit("full iter + lr_cam=1e-3 (pose grads on)",
           make_body(False, 1e-3), (params, o0))

    # ablation: camera forward WITHOUT the coverage kernel — monkeypatch
    import gflow_tpu.opt.train as trainmod
    import gflow_tpu.ops.pallas_raster as pr
    orig = pr.composite_with_coverage_pallas

    def no_cov(tile_lists, uv, conic, opacity, features, mov, bg, W_, H_,
               n_tx, n_ty, tile_counts=None):
        img = pr.composite_tiles_pallas(
            tile_lists, uv, conic, opacity, features, bg, W_, H_, n_tx, n_ty,
            tile_counts=tile_counts)
        return img, jnp.zeros((H_, W_, 1))

    pr.composite_with_coverage_pallas = no_cov
    try:
        timeit("camera iter, coverage kernel stubbed out",
               make_body(True, 1e-3), (params, o0))
    finally:
        pr.composite_with_coverage_pallas = orig


if __name__ == "__main__":
    main()
