"""K-sensitivity probe: single-frame 480p/50k fit at max_per_tile in
{128, 96, 64} — PSNR after the same iteration budget + per-iter time.
Informs whether the per-tile cap can shrink (kernel/gather/scatter scale
~linearly with K) without quality loss."""
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

    params0, n = init_params_from_image(img, depth, N, CAP, intr, extr,
                                        rng=rng)
    state0 = init_frame_state(CAP)._replace(n_alive=jnp.asarray(n, jnp.int32))
    targets = Targets(
        image=jnp.asarray(img), depth=jnp.asarray(depth)[..., None],
        flow=jnp.zeros((H, W, 2)), move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.zeros((H, W), bool))
    weights = LossWeights.make(rgb=1.0, depth=0.1, var=50.0, flow=0.01)
    intr_j = jnp.asarray(intr)

    for K in (128, 96, 64):
        rcfg = RenderConfig(max_per_tile=K)
        cfg = StageConfig(W=W, H=H, iterations=300, render=rcfg)
        dyn = StageDynamics.make(lr=1e-2, weights=weights, num_points=N)
        f = jax.jit(functools.partial(train_stage, cfg=cfg, dyn=dyn))
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / 300 * 1e3
        psnr = -10 * np.log10(
            np.mean((np.asarray(info["rgb"]) - img) ** 2) + 1e-12)
        print(f"K={K:4d}  psnr={psnr:6.2f} dB  {dt:6.2f} ms/iter  "
              f"overflow={float(info['tile_overflow']):.3f}")


if __name__ == "__main__":
    main()
