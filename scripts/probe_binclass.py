"""Two-class binning calibration: ms/iter + PSNR + large-class telemetry
across large_frac, on the scenes where RenderConfig.for_scene picks a wide
candidate grid (M=48) — the configs whose binning cost dominated the round-4
quality run (full_stage ~86 ms/iter vs the M=8 bench's ~8.9; VERDICT r4
weak #3 / next #2).

Variants per scene:
  single:      the r4 behavior — every splat emits the full M=48 grid
  two@f:       small grid 4x2 (M=8) for all, full grid for the top
               f * capacity largest-rect splats

Reports: full-stage ms/iter (canonical 300-iter stage), PSNR vs GT,
fraction of splats classed large on the fitted state, large_clamped count
(large splats beyond the cap, clamped to the small grid).

Writes BINCLASS.json. Run on the real chip.
"""
import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np
import jax
import jax.numpy as jnp

from gflow_tpu.opt import (LossWeights, StageConfig, StageDynamics, Targets,
                           init_frame_state, train_stage)
from gflow_tpu.opt.initialize import init_params_from_image
from gflow_tpu.ops.render import RenderConfig
from gflow_tpu.ops.binning import bin_gaussians, _rect_grid_dims
from gflow_tpu.ops.projection import project_gaussians, supported_max_radius
from gflow_tpu.core.camera import pose_to_extr

W, H = 854, 480


def scene_flat(rng):
    img = np.zeros((H, W, 3), np.float32)
    sky_h = int(0.4 * H)
    t = np.linspace(0, 1, sky_h, dtype=np.float32)[:, None, None]
    img[:sky_h] = (1 - t) * np.asarray([0.45, 0.62, 0.95]) + t * np.asarray(
        [0.80, 0.88, 1.00])
    colors = [(0.55, 0.45, 0.35), (0.70, 0.68, 0.62), (0.35, 0.40, 0.45),
              (0.62, 0.30, 0.25)]
    xs = np.linspace(0, W, len(colors) + 1).astype(int)
    for i, c in enumerate(colors):
        img[sky_h:, xs[i]:xs[i + 1]] = c
    return img


def scene_quality(rng):
    """Frame-0 image of the QUALITY benchmark scene (tests/synth.py with
    texture_octaves=3) — the scene whose adaptive M=48 pick produced the
    7-10x per-iteration gap."""
    import tempfile

    from synth import make_sequence

    tmp = tempfile.mkdtemp(prefix="binclass_")
    seq = make_sequence(tmp, n_frames=1, W=W, H=H, seed=0, texture_octaves=3,
                        moving_camera=True, occlusion_queries=True)
    import imageio.v2 as imageio

    frames = sorted(os.listdir(seq))
    img = imageio.imread(os.path.join(seq, frames[0])).astype(np.float32) / 255
    return img


def fit_one(img, N, rcfg, label):
    CAP = max(1024, -(-int(N * 1.5) // 1024) * 1024)
    rng = np.random.default_rng(0)
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
    cfg = StageConfig(W=W, H=H, iterations=300, render=rcfg)
    dyn = StageDynamics.make(lr=1e-2, weights=weights, num_points=N)
    f = jax.jit(functools.partial(train_stage, cfg=cfg))
    p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0),
                   dyn=dyn)
    jax.block_until_ready(p)
    t0 = time.perf_counter()
    p, s, info = f(params0, state0, targets, intr_j, jax.random.PRNGKey(0),
                   dyn=dyn)
    jax.block_until_ready(p)
    dt = (time.perf_counter() - t0) / 300 * 1e3

    # class mix + clamp telemetry on the FITTED state
    from gflow_tpu.core.scene import activate

    @jax.jit
    def classinfo(p, s):
        proj = project_gaussians(
            p.xyz, activate("scale", p.scale), activate("rotate", p.rotate),
            intr_j, pose_to_extr(p.pose), W, H,
            max_radius=supported_max_radius(rcfg.max_tiles_per_gaussian))
        bins = bin_gaussians(
            proj["uv"], proj["depth"], proj["radius"], W, H,
            max_per_tile=rcfg.max_per_tile,
            max_tiles_per_gaussian=rcfg.max_tiles_per_gaussian,
            small_tiles_per_gaussian=rcfg.small_tiles_per_gaussian,
            large_frac=rcfg.large_frac)
        vis = proj["depth"][:, 0] > 0
        mxs, mys = _rect_grid_dims(max(rcfg.small_tiles_per_gaussian, 8))
        from gflow_tpu.ops.reference import _tile_rect
        from gflow_tpu.ops.binning import tile_grid

        ntx, nty = tile_grid(W, H)
        rminx, rmaxx, rminy, rmaxy = _tile_rect(
            proj["uv"], proj["radius"], ntx, nty)
        is_large = vis & (((rmaxx - rminx) > mxs) | ((rmaxy - rminy) > mys))
        return (jnp.sum(is_large) / jnp.maximum(jnp.sum(vis), 1),
                bins.large_clamped)

    lf, lc = classinfo(p, s)
    psnr = lambda a, b: float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))
    row = {
        "variant": label,
        "ms_per_iter": round(dt, 3),
        "psnr_vs_gt": round(psnr(np.asarray(info["rgb"]), img), 3),
        "tile_overflow": round(float(info["tile_overflow"]), 4),
        "large_frac_fitted": round(float(lf), 4),
        "large_clamped": int(lc),
    }
    print(row, flush=True)
    return row


def main():
    out = {"platform": jax.default_backend(),
           "config": "854x480, 300-iter full stage, canonical losses"}
    scenes = {}
    for name, make, N in (("quality_f0", scene_quality, 50_000),
                          ("flat", scene_flat, 50_000),
                          ("sparse10k", scene_flat, 10_000)):
        img = make(np.random.default_rng(0))
        base = RenderConfig.for_scene(W, H, N, image=img)
        rows = []
        single = dataclasses.replace(base, small_tiles_per_gaussian=0)
        rows.append(fit_one(img, N, single,
                            f"single M={base.max_tiles_per_gaussian}"))
        if base.max_tiles_per_gaussian > 8:
            for frac in (1 / 16, 1 / 8, 1 / 4):
                two = dataclasses.replace(
                    base, small_tiles_per_gaussian=8, large_frac=frac)
                rows.append(fit_one(img, N, two, f"two@{frac:.4f}"))
        scenes[name] = {
            "num_points": N,
            "for_scene": {"M": base.max_tiles_per_gaussian,
                          "K": base.max_per_tile,
                          "small": base.small_tiles_per_gaussian,
                          "large_frac": base.large_frac},
            "rows": rows,
        }
    out["scenes"] = scenes
    with open("BINCLASS.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
