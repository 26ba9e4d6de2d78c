"""K-sensitivity probe (VERDICT r2 item 3): bound the nearest-K per-tile
truncation error at canonical scale (480p, 50k pts).

Two measurements, decoupled:
1. TRUNCATION BOUND: fit once at canonical K=128, then re-render the SAME
   fitted scene at K in {512(oracle), 256, 128, 96, 64} and report
   PSNR(render_K vs render_512) — isolates what the cap drops from fit
   stochasticity — plus residual-transmittance stats on overflowing tiles
   (T_final bounds the weight the dropped splats could have carried).
2. END-TO-END: fit at K in {128, 96, 64} with the same budget and report
   PSNR vs GT + ms/iter (the perf-quality tradeoff actually on the table).

Writes K_QUALITY.json at the repo root.
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
from gflow_tpu.opt.train import _forward
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
    psnr = lambda a, b: float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    out = {"platform": jax.default_backend(),
           "config": "854x480, 50k pts, 300 iters, canonical losses"}

    # ---- 2. end-to-end fits (also yields the K=128 params for part 1) ----
    fitted128 = None
    e2e = {}
    for K in (128, 96, 64):
        rcfg = RenderConfig(max_per_tile=K)
        cfg = StageConfig(W=W, H=H, iterations=300, render=rcfg,
                          telemetry_t_final=True)
        dyn = StageDynamics.make(lr=1e-2, weights=weights, num_points=N)
        f = jax.jit(functools.partial(train_stage, cfg=cfg, dyn=dyn))
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / 300 * 1e3
        if K == 128:
            fitted128 = (p, s)
        e2e[str(K)] = {
            "psnr_vs_gt": round(psnr(np.asarray(info["rgb"]), img), 3),
            "ms_per_iter": round(dt, 3),
            "tile_overflow": round(float(info["tile_overflow"]), 4),
            "t_final_overflow_mean": round(
                float(info["t_final_overflow_mean"]), 5),
            "t_final_overflow_max": round(
                float(info["t_final_overflow_max"]), 5),
        }
        print(f"[e2e] K={K:4d} {e2e[str(K)]}", flush=True)
    out["end_to_end_fit"] = e2e

    # ---- 1. truncation bound on the fixed K=128-fitted scene ----
    p128, s128 = fitted128
    n_alive = s128.n_alive

    def render_at(K):
        rcfg = RenderConfig(max_per_tile=K)
        cfg = StageConfig(W=W, H=H, iterations=1, render=rcfg,
                          telemetry_t_final=True)

        @jax.jit
        def go(p):
            _, aux = _forward(p, n_alive, s128, targets, intr_j, weights,
                              cfg, diag_t_final=True)
            return (aux["rgb"], aux["tile_overflow"],
                    aux["t_final_overflow_mean"], aux["t_final_overflow_max"])

        rgb, ov, tfm, tfx = go(p128)
        return (np.asarray(rgb), float(ov), float(tfm), float(tfx))

    oracle, _, _, _ = render_at(512)
    trunc = {}
    for K in (256, 128, 96, 64):
        r, ov, tfm, tfx = render_at(K)
        trunc[str(K)] = {
            "psnr_vs_oracle512": round(psnr(r, oracle), 3),
            "tile_overflow": round(ov, 4),
            "t_final_overflow_mean": round(tfm, 5),
            "t_final_overflow_max": round(tfx, 5),
        }
        print(f"[trunc] K={K:4d} {trunc[str(K)]}", flush=True)
    out["truncation_vs_oracle"] = trunc

    with open("K_QUALITY.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
