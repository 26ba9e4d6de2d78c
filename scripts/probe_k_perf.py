"""Measure the K-escalation guardrail's device cost: full-stage ms/iter at
the canonical bench config (854x480, 50k pts, 300-iter full stage with
densify) across max_per_tile in {96, 128, 160, 192}.

Context: the trainer escalates K when the residual transmittance on
overflowing tiles exceeds 0.01 (pipeline/trainer.py K-escalation guardrail;
msplat has no truncation at all). QUALITY_r04's warm phase split showed the
escalated stages (K=192) running ~4x the K=96 bench rate — this probe pins
the device-side stage cost as a function of K so the guardrail's speed/
correctness trade is a measured number, not an inference from mixed phases.

Writes K_PERF.json. Run on the real chip.
"""
import dataclasses
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
    iters = 300
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
    base = RenderConfig.for_scene(W, H, N, image=img)
    weights = LossWeights.make(rgb=1.0, depth=0.1, var=50.0, flow=0.01)
    dyn = StageDynamics.make(lr=1e-3, lr_camera=0.0, weights=weights,
                             num_points=N, densify_occ_percent=0.5,
                             densify_err_thre=1e-2, densify_err_percent=1.0)
    intr_j = jnp.asarray(intr)

    rows = []
    for k in (96, 128, 160, 192):
        rcfg = dataclasses.replace(base, max_per_tile=k)
        cfg = StageConfig(W=W, H=H, iterations=iters, render=rcfg,
                          densify_occ=False, densify_interval=100,
                          densify_times=2, max_densify=min(CAP, 16384))
        # jit closes over cfg ONLY; dyn passes as a traced runtime argument
        # exactly like the trainer's dispatch (pipeline/trainer.py
        # _compiled_stage) — baking dyn in lets XLA constant-fold lr/loss
        # weights into a different executable than production pays
        f = jax.jit(functools.partial(train_stage, cfg=cfg))
        p, s, _ = f(params, state, targets, intr_j, jax.random.PRNGKey(0),
                    dyn=dyn)
        jax.block_until_ready(p)
        t0 = time.time()
        reps = 3
        for i in range(reps):
            # chain reps: each runs from the previous rep's densified/evolved
            # point set — the state the guardrail actually pays in production
            p, s, _ = f(p, s, targets, intr_j, jax.random.PRNGKey(i + 1),
                        dyn=dyn)
        jax.block_until_ready(p)
        sec = (time.time() - t0) / reps
        rows.append({"max_per_tile": k, "stage_sec": round(sec, 3),
                     "ms_per_iter": round(sec / iters * 1e3, 3)})
        print(rows[-1])

    out = {"config": {"W": W, "H": H, "N": N, "iters": iters,
                      "max_tiles_per_gaussian": base.max_tiles_per_gaussian},
           "platform": jax.default_backend(),
           "rows": rows,
           "note": "full train_stage (render fwd+bwd, 6 losses, grouped "
                   "Adam, error-densify segments) as jitted for bench.py; "
                   "K is the per-tile depth-sorted capacity the escalation "
                   "guardrail raises"}
    with open("K_PERF.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
