"""Released-scale prior-model probe (VERDICT r2 items 2 + 8): instantiate
the REAL model graphs at the sizes the reference runs them —

- AsymmetricMASt3R ViT-Large (enc 1024/24, dec 768/12, catmlp+dpt head),
  two-view forward at 512x384 (reference: utility/depth_mast3r.py:46-48,83
  loads images at 512),
- GMFlow-scale2-regrefine6 (128ch, 6 layers, 6 refine iters) at DAVIS
  480p padded to the model's padding_factor 32 => 864x480 (reference:
  scripts/flow_unimatch.sh:48-62),
- the two-stage global alignment (0.07x500 + 0.014x200 —
  utility/depth_mast3r.py:34-43) on a 200-frame logwin-3 chunk
  (~1.2k edges), synthetic pointmaps,

with random init weights (the environment ships no checkpoints; weights
change values, not shapes/memory/time). Records sec/pair + peak device
memory into MODEL_SCALE.json.

Timing: repeated identical calls through the axon tunnel get memoized, so
each model is timed as a jitted lax.fori_loop whose every iteration
perturbs the input with the previous output's mean (data dependence defeats
memoization; scalar carry avoids carry artifacts).
"""
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def device_mem():
    """Device-memory evidence. memory_stats() is unsupported on the
    tunneled axon device (returns None / raises) — fall back to summing the
    live device buffers, which captures resident weights + activations kept
    alive (an under-estimate of transient peak, labeled as such)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return {k: int(v) for k, v in stats.items()
                    if "bytes" in k and isinstance(v, (int, float))}
    except Exception:
        pass
    try:
        live = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                   for x in jax.live_arrays())
        return {"live_device_bytes (resident lower bound)": live}
    except Exception:
        return None


def timed_chain(apply_fn, params, n: int):
    """apply_fn(params, eps_scalar) -> scalar; returns sec/call via a jitted
    chain of n data-dependent calls. params MUST be an explicit argument:
    closing over the weight pytree bakes it into the lowered module as
    constants (2.3GB for ViT-L), which the tunnel then ships with the
    executable — as an argument the already-device-resident buffers are
    passed by reference."""

    @jax.jit
    def chain(p, e0):
        return jax.lax.fori_loop(0, n, lambda i, e: apply_fn(p, e * 1e-6),
                                 e0)

    chain(params, jnp.float32(0.0)).block_until_ready()  # compile
    t0 = time.perf_counter()
    chain(params, jnp.float32(1.0)).block_until_ready()
    return (time.perf_counter() - t0) / n


def probe_mast3r():
    from gflow_tpu.models.mast3r import Mast3rModel, Mast3rConfig

    H, W = 384, 512
    cfg = Mast3rConfig(head="catmlp+dpt")
    model = Mast3rModel(cfg)
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)
    jax.block_until_ready(params)
    t_init = time.perf_counter() - t0
    n_params = sum(x.size for x in jax.tree.leaves(params))

    def one(p, eps):
        o1, o2 = model.apply(p, img0 + eps, img1 - eps)
        return jnp.mean(o1["pts3d"]) + jnp.mean(o2["conf"])

    sec_per_pair = timed_chain(one, params, 4)
    return {
        "config": "ViT-L 1024/24 + dec 768/12, catmlp+dpt, two-view 512x384",
        "n_params_M": round(n_params / 1e6, 1),
        "init_seconds": round(t_init, 2),
        "sec_per_pair": round(sec_per_pair, 4),
        "device_mem_after": device_mem(),
    }


def probe_gmflow():
    from gflow_tpu.models.unimatch import GMFlow, GMFlowConfig

    H, W = 480, 864  # 854 padded to padding_factor 32
    model = GMFlow(GMFlowConfig())
    rng = np.random.default_rng(1)
    img0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)
    jax.block_until_ready(params)
    t_init = time.perf_counter() - t0
    n_params = sum(x.size for x in jax.tree.leaves(params))

    def one(p, eps):
        return jnp.mean(model.apply(p, img0 + eps, img1 - eps))

    sec_per_pair = timed_chain(one, params, 4)
    return {
        "config": "GMFlow scale2-regrefine6 128ch/6L, 864x480",
        "n_params_M": round(n_params / 1e6, 1),
        "init_seconds": round(t_init, 2),
        "sec_per_pair": round(sec_per_pair, 4),
        "device_mem_after": device_mem(),
    }


def probe_alignment():
    sys.path.insert(0, "tests")
    from test_mast3r import _make_scene_pointmaps, _edge_preds_from_scene
    from gflow_tpu.models.mast3r import global_align, make_pairs_logwin

    # 200-frame chunk (reference seg_size, depth_mast3r.py:69-73), logwin-3
    # symmetric graph; per-edge pointmaps at 128x72 (the refinement samples
    # n_sample pixels per edge — resolution changes host memory, not the
    # device-side optimization size)
    n_frames = 200
    canon, poses, (H, W) = _make_scene_pointmaps(n_frames=n_frames, H=72,
                                                 W=128, f=100.0)
    edge_preds = {}
    rng = np.random.default_rng(0)
    conf = np.ones((H, W, 1), np.float32)
    for (i, j) in make_pairs_logwin(n_frames, 3, symmetric=True):
        rel = np.linalg.inv(poses[i]) @ poses[j]
        pts = canon[j].reshape(-1, 3) @ rel[:3, :3].T + rel[:3, 3]
        pts = pts + rng.normal(0, 0.003, pts.shape)
        edge_preds[(i, j)] = (
            {"pts3d": canon[i], "conf": conf},
            {"pts3d": pts.reshape(H, W, 3).astype(np.float32), "conf": conf})

    t0 = time.perf_counter()
    res = global_align(edge_preds, n_frames, (H, W), n_sample=1024,
                       lr1=0.07, steps1=500, lr2=0.014, steps2=200,
                       collect_timings=True)
    wall = time.perf_counter() - t0
    # collect_timings re-runs stage 1 once purely as a compile-vs-steady
    # diagnostic; exclude it so sec_per_chunk measures what the PIPELINE
    # pays (host assembly + compile + 500+200 refinement steps)
    rerun = res.get("timings", {}).get("stage1_steady_rerun_sec") or 0.0
    sec = wall - rerun

    # convergence: relative-pose translation error vs GT over the chain.
    # The DUSt3R-style alignment optimizes normalized (gauge-fixed) scale,
    # so fit one global scale to the GT first — the reference's evo eval is
    # scale-aligned the same way (depth_mast3r poses -> evo -s).
    est = res["poses_c2w"]
    est_t, gt_t = [], []
    for i in range(n_frames - 1):
        gt_rel = np.linalg.inv(poses[i]) @ poses[i + 1]
        est_rel = np.linalg.inv(est[i]) @ est[i + 1]
        gt_t.append(gt_rel[:3, 3])
        est_t.append(est_rel[:3, 3])
    est_t, gt_t = np.stack(est_t), np.stack(gt_t)
    s = float(np.sum(est_t * gt_t) / max(np.sum(est_t * est_t), 1e-12))
    errs = np.linalg.norm(s * est_t - gt_t, axis=1)
    gt_norm = float(np.mean(np.linalg.norm(gt_t, axis=1)))
    return {
        "config": "200 frames, logwin-3 symmetric (%d edges), 2-stage "
                  "500+200 iters, n_sample 1024" % len(edge_preds),
        "sec_per_chunk": round(sec, 2),
        "wall_incl_diag_rerun": round(wall, 2),
        "timings": res.get("timings"),
        "scale_fit": round(s, 4),
        "gt_mean_step": round(gt_norm, 5),
        "mean_rel_trans_err": round(float(np.mean(errs)), 5),
        "p90_rel_trans_err": round(float(np.percentile(errs, 90)), 5),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {"platform": jax.default_backend()}
    if which in ("all", "gmflow"):
        out["gmflow_released_scale"] = probe_gmflow()
        print("[gmflow]", json.dumps(out["gmflow_released_scale"]), flush=True)
    if which in ("all", "mast3r"):
        out["mast3r_released_scale"] = probe_mast3r()
        print("[mast3r]", json.dumps(out["mast3r_released_scale"]), flush=True)
    if which in ("all", "align"):
        out["alignment_200frame_chunk"] = probe_alignment()
        print("[align]", json.dumps(out["alignment_200frame_chunk"]),
              flush=True)
    path = "MODEL_SCALE.json"
    try:  # merge with an existing partial artifact
        with open(path) as f:
            prev = json.load(f)
        prev.update(out)
        out = prev
    except Exception:
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
