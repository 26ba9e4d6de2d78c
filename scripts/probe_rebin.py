"""Rebin-amortization probe: is the per-iteration tile binning (sort of
capacity*M packed keys + rank/scatter pack) worth amortizing?

Fits the canonical 854x480/50k scene (the bench.py scene) at
rebin_every in {1, 2, 4} with the canonical densify schedule and reports
ms/iter + PSNR vs GT + final rgb loss. Decision rule: adopt a default > 1
only if ms/iter drops materially AND PSNR is within noise of rebin=1.
Writes REBIN_PROBE.json.

Measurement per the rig rules (see memory/perf findings): one jitted
multi-hundred-iteration stage per timing, block_until_ready, second call
timed (first is compile).
"""
import functools
import json
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

    params0, n = init_params_from_image(img, depth, N, CAP, intr, extr,
                                        rng=rng)
    state0 = init_frame_state(CAP)._replace(n_alive=jnp.asarray(n, jnp.int32))
    occ = np.zeros((H, W), bool)
    occ[100:200, 100:300] = True
    targets = Targets(
        image=jnp.asarray(img), depth=jnp.asarray(depth)[..., None],
        flow=jnp.zeros((H, W, 2)), move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.asarray(occ))
    weights = LossWeights.make(rgb=1.0, depth=0.1, var=50.0, flow=0.01)
    intr_j = jnp.asarray(intr)
    rcfg = RenderConfig.for_scene(W, H, N)
    psnr = lambda a, b: float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    iters = 300
    out = {"platform": jax.default_backend(),
           "config": f"854x480/50k M={rcfg.max_tiles_per_gaussian} "
                     f"K={rcfg.max_per_tile}, {iters} iters, densify occ+100x2"}
    res = {}
    for rebin in (1, 2, 4):
        cfg = StageConfig(W=W, H=H, iterations=iters, render=rcfg,
                          densify_occ=True, densify_interval=100,
                          densify_times=2, max_densify=8192,
                          rebin_every=rebin)
        dyn = StageDynamics.make(lr=1e-2, weights=weights, num_points=N,
                                 densify_occ_percent=0.5)
        f = jax.jit(functools.partial(train_stage, cfg=cfg, dyn=dyn))
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / iters * 1e3
        res[str(rebin)] = {
            "ms_per_iter": round(dt, 3),
            "psnr_vs_gt": round(psnr(np.asarray(info["rgb"]), img), 3),
            "final_rgb_loss": round(float(info["metrics"]["rgb"]), 6),
            "n_alive": int(s.n_alive),
        }
        print(f"[rebin] {rebin}: {res[str(rebin)]}", flush=True)
    out["by_rebin"] = res
    with open("REBIN_PROBE.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
