"""Capture a device trace of one full-stage iteration burst and print the
per-op time breakdown (reads the jax.profiler perfetto trace directly —
no tensorboard in this environment)."""
import functools
import glob
import gzip
import json
import os
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


def main():
    camera_only = len(sys.argv) > 1 and sys.argv[1] == "camera"
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

    params, n = init_params_from_image(img, depth, N, CAP, intr, extr,
                                       rng=rng)
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
    cfg = StageConfig(W=W, H=H, iterations=30, camera_only=camera_only,
                      render=RenderConfig())
    fp = flow_prior_terms(state, targets, camera_only, W, H)

    def body(i, carry):
        p, o = carry
        def loss_fn(pp):
            return _forward(pp, state.n_alive, state, targets, intr_j,
                            weights, cfg, flow_prior=fp)
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        grads = _gate_grads(grads, state, state.n_alive, camera_only)
        return adam_update(p, grads, o, jnp.asarray(1e-3),
                           jnp.asarray(1e-3 if camera_only else 0.0),
                           jnp.asarray(1e-3))

    f = jax.jit(lambda c: jax.lax.fori_loop(0, 30, body, c))
    c0 = (params, init_opt_state(params))
    c = f(c0)
    jax.block_until_ready(c)

    trace_dir = "/tmp/jax_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        c = f(c)
        jax.block_until_ready(c)

    # parse the perfetto trace: aggregate device-track event durations
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace produced:", os.listdir(trace_dir))
        return
    with gzip.open(paths[0], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # device tracks: pid names containing TPU / device
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    agg = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e["pid"], "")
        tname = tid_names.get((e["pid"], e["tid"]), "")
        if "TPU" not in pname and "TPU" not in tname and \
           "/device" not in pname.lower():
            continue
        if "step" in tname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] = agg.get(name, 0.0) + dur
        total += dur
    items = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"mode={'camera' if camera_only else 'full'}  "
          f"30 iterations; total device op time {total:.2f} ms "
          f"({total/30:.3f} ms/iter)")
    for name, dur in items:
        print(f"{dur/30:9.4f} ms/iter  {name[:110]}")


if __name__ == "__main__":
    main()
