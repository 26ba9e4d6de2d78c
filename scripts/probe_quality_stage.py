"""Reconcile the quality scene's per-iteration stage cost against the lean
bench scene (VERDICT r4 item 6).

QUALITY_r05 steady state: camera_stage 5.40 s/150 it = 36.0 ms/iter,
full_stage 8.82 s/300 it = 29.4 ms/iter — vs bench.py's ~8.9 ms/iter
blended at its scene's M=8/K=96 policy pick. This probe measures the same
train_stage executable on the QUALITY scene's frame 0 across the
(max_tiles_per_gaussian, max_per_tile) grid so the gap decomposes into
its two knobs (plus the camera stage's extra moving-subset render).

Writes STAGE_COST_r05.json at the repo root.

Usage: python scripts/probe_quality_stage.py
"""
import dataclasses
import functools
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    os.environ.setdefault("GFLOW_COMPILE_CACHE", "/tmp/gflow_probe_xla_cache")
    import numpy as np
    import jax
    import jax.numpy as jnp

    from synth import make_sequence
    from gflow_tpu.core import io as gio
    from gflow_tpu.opt import (LossWeights, StageConfig, StageDynamics,
                               Targets, init_frame_state, train_stage)
    from gflow_tpu.opt.initialize import init_params_from_image
    from gflow_tpu.ops.render import RenderConfig

    W, H, N = 854, 480, 50_000
    # the trainer's capacity rule (pipeline/trainer.py): 1.5x rounded to 1024
    CAP = max(1024, -(-int(N * 1.5) // 1024) * 1024)
    tmp = tempfile.mkdtemp(prefix="gflow_stageprobe_")
    seq = make_sequence(tmp, n_frames=2, W=W, H=H, seed=0, texture_octaves=3,
                        moving_camera=True, occlusion_queries=True)
    img_paths = sorted(str(p) for p in (seq).glob("*.png"))
    img = np.asarray(gio.load_image(img_paths[0]), np.float32)
    import glob as _g
    depth_files = sorted(_g.glob(str(seq) + "_depth_mast3r_s2/*.npy"))
    depth = np.asarray(gio.read_depth(depth_files[0]), np.float32)

    # the scene's real camera (fit_video reads mean focal + rounded pp)
    cam_files = sorted(_g.glob(str(seq) + "_camera_mast3r_s2/*.json"))
    focal, pp, _ = gio.read_camera(cam_files[:1])
    intr = np.asarray([focal, focal, pp[0], pp[1]], np.float32)
    extr = np.c_[np.eye(3), np.zeros(3)].astype(np.float32)
    rng = np.random.default_rng(0)
    params, n = init_params_from_image(img, depth, N, CAP, intr, extr, rng=rng)
    state = init_frame_state(CAP)._replace(n_alive=jnp.asarray(n, jnp.int32))
    targets = Targets(
        image=jnp.asarray(img), depth=jnp.asarray(depth)[..., None],
        flow=jnp.zeros((H, W, 2)), move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.zeros((H, W), bool))
    weights = LossWeights.make(rgb=1.0, depth=0.1, var=50.0, flow=0.01)
    intr_j = jnp.asarray(intr)
    key = jax.random.PRNGKey(0)

    policy = RenderConfig.for_scene(W, H, N, image=img)
    print(f"policy pick for the quality scene: M={policy.max_tiles_per_gaussian}"
          f" K={policy.max_per_tile} smallM={policy.small_tiles_per_gaussian}"
          f" large_frac={policy.large_frac}")

    def time_variant(label, rcfg, camera_only=False, iters=300):
        cfg = StageConfig(W=W, H=H, iterations=iters,
                          camera_only=camera_only, render=rcfg,
                          telemetry_t_final=not camera_only)
        dyn = StageDynamics.make(
            lr=1e-2 if camera_only else 1e-3,
            lr_camera=1e-3 if camera_only else 0.0,
            weights=weights, num_points=N)
        f = jax.jit(functools.partial(train_stage, cfg=cfg))
        p, s, _ = f(params, state, targets, intr_j, key, dyn=dyn)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            p, s, _ = f(params, state, targets, intr_j, key, dyn=dyn)
        jax.block_until_ready(p)
        ms = (time.perf_counter() - t0) / reps / iters * 1e3
        print(f"{label:46s} {ms:8.2f} ms/iter")
        return round(ms, 3)

    res = {"scene": "QUALITY synth frame 0 (moving camera, 3-octave texture)",
           "W": W, "H": H, "N": N, "capacity": CAP,
           "policy": {"M": policy.max_tiles_per_gaussian,
                      "K": policy.max_per_tile},
           "ms_per_iter": {}}
    grid = [
        ("full policyM K192 (production steady)", dataclasses.replace(
            policy, max_per_tile=192), False),
        ("full policyM K96", dataclasses.replace(
            policy, max_per_tile=96), False),
        ("full M8 K192", dataclasses.replace(
            policy, max_tiles_per_gaussian=8, max_per_tile=192), False),
        ("full M8 K96 (bench-scene-like)", dataclasses.replace(
            policy, max_tiles_per_gaussian=8, max_per_tile=96), False),
        ("camera policyM K192 (production steady)", dataclasses.replace(
            policy, max_per_tile=192), True),
        ("camera M8 K96", dataclasses.replace(
            policy, max_tiles_per_gaussian=8, max_per_tile=96), True),
    ]
    for label, rcfg, cam in grid:
        res["ms_per_iter"][label] = time_variant(label, rcfg,
                                                 camera_only=cam,
                                                 iters=150 if cam else 300)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "STAGE_COST_r05.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
