"""Multi-chip training (scaling-book style — annotate shardings, let GSPMD
place collectives; SURVEY 2.3):

THE PRODUCT MODE — tile-sharded single-sequence fitting (`dryrun_stage`
here; `fit_video --shard-devices N` end to end): the unmodified
opt.train.train_stage runs under an ambient `jax.set_mesh` mesh and the
rasterizer's tile axis is sharded across all chips inside the SAME
ops/composite.composite_tiles code the single-chip XLA path uses
(shard_axes param; wired through RenderConfig.tile_shard_axes and the
ambient-mesh hook ops/render.ambient_tile_axes). Forward compositing is
embarrassingly parallel over tiles; the backward's per-Gaussian gradient
scatter-add becomes an XLA all-reduce over ICI. No separate multi-chip
compositor, no divergent numerics: the full stage loop — densify events,
finalize, diagnostics — is one GSPMD-partitioned program.

ALSO HERE — a batched B-frames harness (`sharded_train_step`/`dryrun_step`):
B independent frame fits sharded on axis "data" with the flattened (B*T)
tile axis over the whole mesh. This is scale-out *evidence* machinery (the
full-scale memory artifact MULTICHIP_FULLSCALE.json; the 8==1 invariance
test), not a user-facing fitting mode — GFlow's per-sequence fits are
temporally sequential, so the product-level batch axis is scenes
(parallel/scene_sweep.py), not frames. Its compositor is the same math as
ops/composite.py but fully vectorized (no lax.map chunking — a scan would
serialize under GSPMD; sharding the tile axis already bounds per-device
memory to B*T/D * K * P).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import pose_to_extr
from ..opt.losses import compute_losses
from ..opt.state import Params, adam_update, init_opt_state  # noqa: F401 (init_opt_state used by dryrun)
from ..opt.train import StageConfig, StageDynamics, _activate, _gate_grads
from ..ops.binning import bin_gaussians, tile_grid
from ..ops.projection import project_gaussians, supported_max_radius, TILE


def composite_tiles_batched(tile_lists, uv, conic, opacity, features, bg,
                            W, H, n_tx, n_ty, constrain=None):
    """Batched tile compositing: tile_lists (B,T,K), point arrays (B,N,.).
    Returns (B, H, W, F). The blend is the SAME
    ops/composite.blend_tile_block every XLA path shares; only the
    batched gather + (B*T) flattening for the whole-mesh tile sharding is
    specific to this harness."""
    from ..ops.composite import blend_tile_block

    B, T, K = tile_lists.shape
    F = features.shape[-1]
    bg = jnp.broadcast_to(jnp.asarray(bg, jnp.float32), (F,))

    valid = tile_lists >= 0
    safe = jnp.where(valid, tile_lists, 0)
    gather = jax.vmap(lambda arr, idx: arr[idx])
    g_uv = gather(uv, safe)            # (B, T, K, 2)
    g_conic = gather(conic, safe)
    g_op = jnp.where(valid[..., None], gather(opacity, safe), 0.0)
    g_feat = gather(features, safe)

    Pn = TILE * TILE
    tids = jnp.arange(T, dtype=jnp.int32)
    off = jnp.arange(Pn, dtype=jnp.float32)
    px = ((tids % n_tx) * TILE)[:, None].astype(jnp.float32) + off[None, :] % TILE
    py = ((tids // n_tx) * TILE)[:, None].astype(jnp.float32) + off[None, :] // TILE
    px = jnp.broadcast_to(px[None], (B, T, Pn)).reshape(B * T, Pn)
    py = jnp.broadcast_to(py[None], (B, T, Pn)).reshape(B * T, Pn)

    def flat(x):
        x = x.reshape((B * T,) + x.shape[2:])
        return constrain(x) if constrain is not None else x

    g_uv, g_conic, g_op, g_feat = map(flat, (g_uv, g_conic, g_op, g_feat))
    px, py = map(lambda x: constrain(x) if constrain else x, (px, py))

    out = blend_tile_block(g_uv, g_conic, g_op, g_feat, px, py, bg)

    img = (
        out.reshape(B, n_ty, n_tx, TILE, TILE, F)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(B, n_ty * TILE, n_tx * TILE, F)
    )
    return img[:, :H, :W]


def batched_forward(bparams: Params, bstate, btargets, intr, cfg: StageConfig,
                    weights, constrain=None):
    """One batched render + loss. Returns (mean loss, aux)."""
    extr = jax.vmap(pose_to_extr)(bparams.pose)
    act = jax.vmap(_activate)(bparams, bstate.n_alive)
    scale, rotate, opacity, rgb = act
    mr = supported_max_radius(cfg.render.max_tiles_per_gaussian)
    proj = jax.vmap(
        lambda x, s, r, e: project_gaussians(
            x, s, r, intr, e, cfg.W, cfg.H, max_radius=mr
        )
    )(bparams.xyz, scale, rotate, extr)
    uv, depth, conic, radius = proj["uv"], proj["depth"], proj["conic"], proj["radius"]
    bins = jax.vmap(
        lambda u, d, r: bin_gaussians(
            u, d, r, cfg.W, cfg.H,
            max_per_tile=cfg.render.max_per_tile,
            max_tiles_per_gaussian=cfg.render.max_tiles_per_gaussian,
            small_tiles_per_gaussian=cfg.render.small_tiles_per_gaussian,
            large_frac=cfg.render.large_frac,
        )
    )(uv, depth, radius)
    n_tx, n_ty = tile_grid(cfg.W, cfg.H)
    feats = jnp.concatenate([rgb, depth], axis=-1)
    img = composite_tiles_batched(
        bins.tile_lists, uv, conic, opacity, feats, cfg.bg,
        cfg.W, cfg.H, n_tx, n_ty, constrain=constrain,
    )
    rendered_rgb, rendered_depth = img[..., :3], img[..., 3:4]

    def frame_loss(r_rgb, r_d, u, d, sc, xyz, dab, tgt, st):
        total, metrics, _ = compute_losses(
            r_rgb, r_d, u, d, sc, xyz, dab, tgt, st,
            weights, cfg.camera_only, cfg.W, cfg.H,
        )
        return total, metrics

    totals, metrics = jax.vmap(frame_loss)(
        rendered_rgb, rendered_depth, uv, depth, scale, bparams.xyz,
        bparams.depth_ab, btargets, bstate,
    )
    return jnp.mean(totals), {"metrics": metrics, "rgb": rendered_rgb}


def sharded_train_step(mesh: Mesh, cfg: StageConfig, dyn: StageDynamics):
    """Returns a jitted one-step training function over a frame batch with
    real data+tile shardings. Inputs: batched Params/FrameState/Targets
    (leading axis B divisible by the 'data' axis), shared intr."""
    constrain = _flat_tile_constraint(mesh)

    def data_shard(tree):
        def leaf(x):
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.tree.map(leaf, tree)

    @functools.partial(jax.jit)
    def step(bparams, bopt, bstate, btargets, intr):
        def loss_fn(bp):
            return batched_forward(bp, bstate, btargets, intr, cfg,
                                   dyn.weights, constrain=constrain)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(bparams)
        grads = jax.vmap(
            lambda g, st, n: _gate_grads(g, st, n, cfg.camera_only)
        )(grads, bstate, bstate.n_alive)
        bparams2, bopt2 = adam_update(
            bparams, grads, bopt, dyn.lr, dyn.lr_camera, dyn.lr
        )
        return bparams2, bopt2, loss, aux["rgb"]

    return step, data_shard


def _flat_tile_constraint(mesh: Mesh):
    def constrain(x):
        spec = P(("data", "tile"), *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))

    return constrain


def dryrun_stage(mesh: Mesh, iterations: int = 12, W: int = 64, H: int = 48,
                 capacity: int = 512, seed: int = 0,
                 backend: str = "auto"):
    """The PRODUCT multi-chip fitting mode, dryrun-sized: run the full
    single-frame `opt.train.train_stage` (iterations + occ/err densify
    events + finalize) under `jax.set_mesh(mesh)` with the rasterizer's
    tile axis sharded over the whole mesh (P(('data','tile')) — see
    ops/composite.composite_tiles shard_axes). This is the SAME compiled
    code path `fit_video --shard-devices N` runs; no separate multi-chip
    compositor. Returns (final total loss, n_alive)."""
    import numpy as np

    from ..opt.losses import LossWeights
    from ..opt.state import Targets, init_frame_state
    from ..opt.train import train_stage
    from ..ops.render import RenderConfig, ambient_tile_axes

    rng = np.random.default_rng(seed)
    params = Params(
        xyz=jnp.asarray(np.c_[rng.uniform(-1, 1, (capacity, 2)),
                              rng.uniform(1.5, 4.0, (capacity, 1))],
                        jnp.float32),
        scale=jnp.asarray(rng.uniform(0.01, 0.05, (capacity, 3)), jnp.float32),
        rotate=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (capacity, 1)),
        opacity=jnp.full((capacity, 1), 0.3),
        rgb=jnp.asarray(rng.normal(0, 1, (capacity, 3)), jnp.float32),
        pose=jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32),
        depth_ab=jnp.asarray([1.0, 0.0]),
    )
    state = init_frame_state(capacity)._replace(
        n_alive=jnp.asarray(capacity - 64, jnp.int32))
    targets = Targets(
        image=jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32),
        depth=jnp.full((H, W, 1), 2.0),
        flow=jnp.zeros((H, W, 2)),
        move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.asarray(rng.random((H, W)) < 0.1),
    )
    dyn = StageDynamics.make(lr=1e-2, lr_camera=1e-3,
                             weights=LossWeights.make(rgb=1.0, depth=0.1),
                             num_points=capacity // 2,
                             densify_occ_percent=0.5)
    with jax.set_mesh(mesh):
        axes = ambient_tile_axes()
        assert axes, "mesh must have a 'tile' axis"
        cfg = StageConfig(
            W=W, H=H, iterations=iterations, densify_occ=True,
            densify_interval=max(2, iterations // 2), densify_times=1,
            max_densify=64,
            render=RenderConfig(max_per_tile=64, tile_shard_axes=axes,
                                backend=backend),
        )
        fn = jax.jit(functools.partial(train_stage, cfg=cfg))
        p2, s2, info = fn(params, state, targets, intr=jnp.asarray(
            [60.0, 60.0, W / 2, H / 2]), key=jax.random.PRNGKey(0), dyn=dyn)
        jax.block_until_ready(p2.xyz)
    import math

    total = float(info["metrics"]["total"])
    assert math.isfinite(total), "sharded stage produced non-finite loss"
    n_alive = int(s2.n_alive)
    assert n_alive > capacity - 64, "densify did not run in the sharded stage"
    return total, n_alive


def dryrun_step(mesh: Mesh, B: int = None, W: int = 64, H: int = 48,
                capacity: int = 512, seed: int = 0,
                max_per_tile: int = 64, max_tiles_per_gaussian: int = 16):
    """Build batched inputs, jit the full sharded training step over the
    mesh, run ONE step, and sanity-check the outputs. Used by
    __graft_entry__.dryrun_multichip (tiny shapes) and the full-scale
    memory-evidence run (854x480, 64k capacity — scripts/fullscale_multichip
    / tests/test_multichip.py::test_fullscale_step)."""
    import numpy as np

    from ..opt.losses import LossWeights
    from ..opt.state import FrameState, Targets, init_frame_state
    from ..ops.render import RenderConfig

    if B is None:
        B = mesh.shape["data"]
    rng = np.random.default_rng(seed)

    def one_params():
        return Params(
            xyz=np.c_[rng.uniform(-1, 1, (capacity, 2)),
                      rng.uniform(1.5, 4.0, (capacity, 1))].astype(np.float32),
            scale=rng.uniform(0.01, 0.05, (capacity, 3)).astype(np.float32),
            rotate=np.tile(np.asarray([1, 0, 0, 0], np.float32), (capacity, 1)),
            opacity=np.full((capacity, 1), 0.3, np.float32),
            rgb=rng.normal(0, 1, (capacity, 3)).astype(np.float32),
            pose=np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32),
            depth_ab=np.asarray([1, 0], np.float32),
        )

    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    bparams = stack([one_params() for _ in range(B)])
    st = init_frame_state(capacity)._replace(
        n_alive=jnp.asarray(capacity, jnp.int32)
    )
    bstate = stack([st for _ in range(B)])
    tgt = Targets(
        image=jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32),
        depth=jnp.full((H, W, 1), 2.0),
        flow=jnp.zeros((H, W, 2)),
        move_mask=jnp.zeros((H, W), bool),
        occ_mask=jnp.zeros((H, W), bool),
    )
    btargets = stack([tgt for _ in range(B)])

    cfg = StageConfig(
        W=W, H=H, iterations=1,
        render=RenderConfig(max_per_tile=max_per_tile,
                            max_tiles_per_gaussian=max_tiles_per_gaussian),
    )
    dyn = StageDynamics.make(lr=1e-2, lr_camera=1e-3,
                             weights=LossWeights.make(rgb=1.0, depth=0.1))
    step, data_shard = sharded_train_step(mesh, cfg, dyn)
    bparams = data_shard(bparams)
    bstate = data_shard(bstate)
    btargets = data_shard(btargets)
    bopt = init_opt_state(bparams)

    bparams2, bopt2, loss, rgb = step(bparams, bopt, bstate, btargets,
                                      jnp.asarray([60.0, 60.0, W / 2, H / 2]))
    jax.block_until_ready(bparams2)
    assert jnp.isfinite(loss), "multichip step produced non-finite loss"
    delta = jnp.abs(bparams2.xyz - bparams.xyz).max()
    assert float(delta) > 0, "multichip step did not update params"
    return float(loss)
