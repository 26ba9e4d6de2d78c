"""M-sensitivity probe: can max_tiles_per_gaussian shrink below 16?

The binning sort stream is L = capacity * M keys, so M is a direct lever on
the per-iteration binning cost — but the static candidate grid also clamps
the largest supported 3-sigma radius (projection.supported_max_radius:
M=16 -> 24 px, M=12 -> 16 px, M=8 -> 8 px), shrinking oversized splats.
Fit the same 480p/50k scene at each M with the canonical budget and report
PSNR vs GT + ms/iter + the fraction of visible splats hitting the radius
clamp. Writes M_QUALITY.json.
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
from gflow_tpu.ops.projection import (project_gaussians,
                                      supported_max_radius)
from gflow_tpu.ops.render import RenderConfig
from gflow_tpu.core.camera import pose_to_extr


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
    targets = Targets(
        image=jnp.asarray(img), depth=jnp.asarray(depth)[..., None],
        flow=jnp.zeros((H, W, 2)), move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.zeros((H, W), bool))
    weights = LossWeights.make(rgb=1.0, depth=0.1, var=50.0, flow=0.01)
    intr_j = jnp.asarray(intr)
    psnr = lambda a, b: float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))

    out = {"platform": jax.default_backend(),
           "config": "854x480, 50k pts, 300 iters, K=128, canonical losses"}
    res = {}
    for M in (16, 12, 8):
        rcfg = RenderConfig(max_per_tile=128, max_tiles_per_gaussian=M)
        cfg = StageConfig(W=W, H=H, iterations=300, render=rcfg)
        dyn = StageDynamics.make(lr=1e-2, weights=weights, num_points=N)
        f = jax.jit(functools.partial(train_stage, cfg=cfg, dyn=dyn))
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0))
        jax.block_until_ready(p)
        dt = (time.perf_counter() - t0) / 300 * 1e3

        # radius-clamp saturation on the fitted scene: how many visible
        # splats would exceed the supported radius without the clamp?
        from gflow_tpu.core.scene import activate

        @jax.jit
        def clamp_frac(p):
            proj = project_gaussians(
                p.xyz, activate("scale", p.scale),
                activate("rotate", p.rotate), intr_j,
                pose_to_extr(p.pose), W, H, max_radius=None)
            vis = proj["visible"] & (jnp.arange(CAP) < s.n_alive)
            rmax = supported_max_radius(M)
            return (jnp.sum((proj["radius"] > rmax) & vis)
                    / jnp.maximum(jnp.sum(vis), 1))

        res[str(M)] = {
            "psnr_vs_gt": round(psnr(np.asarray(info["rgb"]), img), 3),
            "ms_per_iter": round(dt, 3),
            "supported_radius_px": supported_max_radius(M),
            "clamped_frac": round(float(clamp_frac(p)), 5),
            "tile_overflow": round(float(info["tile_overflow"]), 4),
        }
        print(f"[M] {M:3d} {res[str(M)]}", flush=True)
    out["by_M"] = res

    with open("M_QUALITY.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
