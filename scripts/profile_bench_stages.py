"""Break down bench.py's per-frame cost: camera stage vs full stage vs
losses/adam glue, at the exact bench configuration."""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from gflow_tpu.opt import (LossWeights, StageConfig, StageDynamics, Targets,
                           init_frame_state, train_stage)
from gflow_tpu.opt.initialize import init_params_from_image
from gflow_tpu.ops.render import RenderConfig


def main():
    W, H = 854, 480
    N, CAP = 50_000, 51_200
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
    state = init_frame_state(CAP)._replace(n_alive=jnp.asarray(n, jnp.int32))
    targets = Targets(
        image=jnp.asarray(img), depth=jnp.asarray(depth)[..., None],
        flow=jnp.zeros((H, W, 2)), move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.zeros((H, W), bool))
    rcfg = RenderConfig.for_scene(W, H, N)
    weights = LossWeights.make(rgb=1.0, depth=0.1, var=50.0, flow=0.01)
    intr_j = jnp.asarray(intr)
    key = jax.random.PRNGKey(0)

    def time_stage(name, iters, camera_only, weights=weights):
        cfg = StageConfig(W=W, H=H, iterations=iters,
                          camera_only=camera_only, render=rcfg)
        dyn = StageDynamics.make(
            lr=1e-2 if camera_only else 1e-3,
            lr_camera=1e-3 if camera_only else 0.0,
            weights=weights, num_points=N)
        f = jax.jit(functools.partial(train_stage, cfg=cfg, dyn=dyn))
        p, s, _ = f(params, state, targets, intr_j, key)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            p, s, _ = f(params, state, targets, intr_j, key)
        jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:44s} {dt*1e3/iters:8.3f} ms/iter  ({dt:.2f}s total)")

    time_stage("camera stage (150 it)", 150, True)
    time_stage("full stage (300 it)", 300, False)
    # ablations on the full stage
    time_stage("full, rgb-only weights", 300, False,
               LossWeights.make(rgb=1.0))
    time_stage("full, rgb no-ssim proxy (w=0 all)", 300, False,
               LossWeights.make(rgb=0.0))


if __name__ == "__main__":
    main()
