"""The jitted optimization stage — TPU-native replacement for
SimpleGaussian.train() (gflow/trainer.py:332-711).

Key departures from the reference (all behavior-preserving, all TPU-first):

- The whole stage (N iterations of render -> loss -> backward -> Adam ->
  densify) runs as ONE compiled `lax.fori_loop` — zero host round-trips,
  versus the reference's Python loop with ~20 kernel launches/iteration and
  per-iteration host syncs for the progress bar (trainer.py:387-582).
- The reference renders 6 output maps every iteration but optimizes with only
  rgb + depth_map (+ point uv/depth); the train step composites exactly one
  fused rgb+depth feature pass. Diagnostic maps render on demand only.
- Gradient "control" (zeroing in-place, trainer.py:535-551) becomes pure
  mask arithmetic on the grad pytree.
- Densification appends into preallocated capacity (densify.py) instead of
  rebuilding tensors + optimizer.
- The camera-only stage's moving-region mask re-render (trainer.py:427-451)
  reuses the SAME tile binning as the main pass (binning depends only on
  geometry, which is shared) — one extra composite, not a full extra
  pipeline.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import pose_to_extr, pix2world
from ..core.scene import OPACITY_SENSITIVITY
from ..ops.binning import bin_gaussians, tile_grid
from ..ops.composite import composite_tiles
from ..ops.render import _get_compositor
from ..ops.projection import TILE, project_gaussians, supported_max_radius
from ..ops.render import RenderConfig, DEFAULT_CONFIG
from .losses import LossWeights, compute_losses, flow_prior_terms
from .state import FrameState, OptState, Params, adam_update, init_opt_state
from .densify import densify_by_pixels, reset_opt_after_densify


@dataclass(frozen=True)
class StageConfig:
    W: int
    H: int
    iterations: int
    camera_only: bool = False
    propagate: bool = False        # flow warm-start of moving points (trainer.py:347-381)
    densify_interval: int = 0
    densify_times: int = 0
    densify_occ: bool = False      # iteration-0 occluded-region densify (trainer.py:562-564)
    max_densify: int = 8192
    bg: float = 0.0
    render: RenderConfig = field(default_factory=lambda: DEFAULT_CONFIG)
    snapshot_every: int = 0   # >0: collect rgb/depth/center every N iters
                              # (reference snapshots at 10, trainer.py:573-582)
    telemetry_t_final: bool = False  # compute residual-transmittance stats on
                                     # K-overflowing tiles (diagnostic forward
                                     # only — the hot loop is unaffected)
    rebin_every: int = 1      # >1: recompute tile binning (the per-iteration
                              # sort of capacity*M packed keys) every N
                              # iterations instead of every iteration,
                              # carrying the lists through the loop. Splats
                              # move <<1 px per step at the canonical lr, so
                              # stale-by-(N-1) tile membership is a bounded
                              # approximation (self-corrects at each rebin;
                              # gradients are exact for the gathered values —
                              # indices are integer data either way). msplat
                              # re-bins every iteration; default 1 preserves
                              # that exactly. Lean (non-snapshot) path only.


class StageDynamics(NamedTuple):
    lr: jax.Array
    lr_camera: jax.Array
    weights: LossWeights
    num_points: jax.Array          # configured base point count (densify sizing)
    densify_occ_percent: jax.Array
    densify_err_thre: jax.Array
    densify_err_percent: jax.Array

    @classmethod
    def make(cls, lr=1e-2, lr_camera=0.0, weights=None, num_points=10000,
             densify_occ_percent=1.0, densify_err_thre=1e-2,
             densify_err_percent=1.0):
        f = lambda x: jnp.asarray(x, jnp.float32)
        return cls(
            lr=f(lr), lr_camera=f(lr_camera),
            weights=weights if weights is not None else LossWeights.make(),
            num_points=f(num_points),
            densify_occ_percent=f(densify_occ_percent),
            densify_err_thre=f(densify_err_thre),
            densify_err_percent=f(densify_err_percent),
        )


def _activate(params: Params, n_alive):
    C = params.capacity
    alive = (jnp.arange(C) < n_alive)[:, None]
    scale = jnp.abs(params.scale)
    rotate = params.rotate / jnp.maximum(
        jnp.linalg.norm(params.rotate, axis=-1, keepdims=True), 1e-12
    )
    opacity = jax.nn.sigmoid(params.opacity * OPACITY_SENSITIVITY) * alive
    rgb = jax.nn.sigmoid(params.rgb)
    return scale, rotate, opacity, rgb


def _compute_bins(params: Params, n_alive, intr, cfg: StageConfig):
    """Tile binning from current geometry only (forward-only projection; the
    indices are integer data, so no gradient path exists either way). Used
    by the rebin_every>1 loop to refresh the carried lists."""
    extr = pose_to_extr(params.pose)
    scale, rotate, _, _ = _activate(params, n_alive)
    proj = project_gaussians(
        params.xyz, scale, rotate, intr, extr, cfg.W, cfg.H,
        max_radius=supported_max_radius(cfg.render.max_tiles_per_gaussian),
    )
    return bin_gaussians(
        proj["uv"], proj["depth"], proj["radius"], cfg.W, cfg.H,
        max_per_tile=cfg.render.max_per_tile,
        max_tiles_per_gaussian=cfg.render.max_tiles_per_gaussian,
        small_tiles_per_gaussian=cfg.render.small_tiles_per_gaussian,
        large_frac=cfg.render.large_frac,
    )


def _forward(params: Params, n_alive, state: FrameState, targets, intr,
             weights: LossWeights, cfg: StageConfig, flow_prior=None,
             diag_t_final: bool = False, bins=None):
    """Render + losses. Returns (total, aux).

    bins: precomputed (possibly stale-by-a-few-iterations) tile lists from
    the rebin_every>1 loop; None means bin fresh from this forward's own
    projection (the exact msplat-equivalent default).

    diag_t_final (static): append a ones feature channel whose composited
    value is the per-pixel accumulated opacity sum(alpha_i * T_i); the
    residual transmittance T_final = (1 - acc) / (1 - bg) then bounds what
    the nearest-K per-tile truncation can possibly contribute — the
    telemetry VERDICT r2 asked for next to tile_overflow. Only used on the
    post-loop diagnostic forward."""
    extr = pose_to_extr(params.pose)
    scale, rotate, opacity, rgb = _activate(params, n_alive)
    if cfg.camera_only:
        # Pose reaches the loss only through uv/conic/depth (projection);
        # per-gaussian opacity and rgb are pose-independent and their grads
        # are gated off anyway — stop_gradient here lets XLA drop their
        # columns from the compositor-backward gradient scatter-add (the
        # single most expensive per-iter op) in the 150-iteration camera
        # stage.
        opacity = jax.lax.stop_gradient(opacity)
        rgb = jax.lax.stop_gradient(rgb)
    proj = project_gaussians(
        params.xyz, scale, rotate, intr, extr, cfg.W, cfg.H,
        max_radius=supported_max_radius(cfg.render.max_tiles_per_gaussian),
    )
    uv, depth, conic, radius = proj["uv"], proj["depth"], proj["conic"], proj["radius"]
    # Fusion split: without this barrier XLA fuses the projection backward
    # into one giant per-gaussian elementwise fusion that it schedules with
    # a 64-element output window — 1024 serialized steps, 2.6 ms/iter
    # (traced; standalone the same math runs in 0.2 ms). The barrier's
    # transpose is also a barrier, so the backward splits identically.
    uv, depth, conic = jax.lax.optimization_barrier((uv, depth, conic))
    n_tx, n_ty = tile_grid(cfg.W, cfg.H)
    if bins is None:
        bins = bin_gaussians(
            uv, depth, radius, cfg.W, cfg.H,
            max_per_tile=cfg.render.max_per_tile,
            max_tiles_per_gaussian=cfg.render.max_tiles_per_gaussian,
            small_tiles_per_gaussian=cfg.render.small_tiles_per_gaussian,
            large_frac=cfg.render.large_frac,
        )
    from ..ops.render import resolve_backend

    compose = _get_compositor(cfg.render)
    feat_list = [rgb, depth]  # fused rgb + depth pass
    if diag_t_final:
        feat_list.append(jnp.ones_like(depth))  # composites to sum(alpha*T)
    feats = jnp.concatenate(feat_list, axis=1)
    move_mask = targets.move_mask
    if cfg.camera_only:
        # augment with the rendered moving-Gaussian coverage
        # (trainer.py:427-451); geometry is shared so tile bins are reused.
        mov = (
            (jnp.arange(params.capacity) < state.last_num)
            & ~state.still_mask_tentative
        )[:, None]
        if resolve_backend(cfg.render) == "pallas":
            # fast path: ONE gather feeds both the composite and a
            # max-alpha coverage kernel (no second full composite)
            if cfg.render.tile_shard_axes is not None:
                from ..ops.pallas_raster import (
                    composite_with_coverage_pallas_sharded)

                img, cov = composite_with_coverage_pallas_sharded(
                    bins.tile_lists, uv, conic, opacity, feats,
                    mov.astype(jnp.float32), cfg.bg, cfg.W, cfg.H,
                    n_tx, n_ty, shard_axes=cfg.render.tile_shard_axes,
                    tile_counts=bins.tile_counts,
                )
            else:
                from ..ops.pallas_raster import composite_with_coverage_pallas

                img, cov = composite_with_coverage_pallas(
                    bins.tile_lists, uv, conic, opacity, feats,
                    mov.astype(jnp.float32), cfg.bg, cfg.W, cfg.H, n_tx,
                    n_ty, tile_counts=bins.tile_counts,
                )
            move_mask = move_mask | (cov[..., 0] > 0)
        else:
            img = compose(
                bins.tile_lists, uv, conic, opacity, feats, cfg.bg,
                cfg.W, cfg.H, n_tx, n_ty, tile_counts=bins.tile_counts,
            )
            cov = compose(
                bins.tile_lists,
                jax.lax.stop_gradient(uv),
                jax.lax.stop_gradient(conic),
                jax.lax.stop_gradient(opacity) * mov,
                jnp.ones_like(depth),
                0.0,
                cfg.W, cfg.H, n_tx, n_ty, tile_counts=bins.tile_counts,
            )
            move_mask = move_mask | (cov[..., 0] > 0)
    else:
        img = compose(
            bins.tile_lists, uv, conic, opacity, feats, cfg.bg,
            cfg.W, cfg.H, n_tx, n_ty, tile_counts=bins.tile_counts,
        )
    rendered_rgb = img[..., :3]
    rendered_depth = img[..., 3:4]

    state_n = state._replace(n_alive=n_alive)
    total, metrics, loss_rgb_pixel = compute_losses(
        rendered_rgb, rendered_depth, uv, depth, scale, params.xyz,
        params.depth_ab, targets._replace(move_mask=move_mask), state_n,
        weights, cfg.camera_only, cfg.W, cfg.H, flow_prior=flow_prior,
    )
    aux = {
        "uv": uv,
        "depth": depth,
        "rgb": rendered_rgb,
        "depth_map": rendered_depth,
        "loss_rgb_pixel": loss_rgb_pixel,
        "metrics": metrics,
        # silent-truncation telemetry (depth-sorted per-tile lists keep the
        # NEAREST max_per_tile splats; report how often that cap bites)
        "tile_overflow": jnp.mean(
            (bins.tile_counts > cfg.render.max_per_tile).astype(jnp.float32)
        ),
    }
    if diag_t_final:
        # residual transmittance on K-overflowing tiles: the compositor's
        # nearest-K truncation can shift a pixel by at most T_final (the
        # weight the dropped farther splats would have shared)
        acc = img[..., feats.shape[1] - 1]
        t_final = jnp.clip(
            (1.0 - acc) / jnp.maximum(1.0 - cfg.bg, 1e-6), 0.0, 1.0)
        over = (bins.tile_counts > cfg.render.max_per_tile).reshape(
            n_ty, n_tx)
        overpix = jnp.repeat(jnp.repeat(over, TILE, 0), TILE, 1)[
            : cfg.H, : cfg.W]
        denom = jnp.maximum(jnp.sum(overpix), 1)
        aux["t_final_overflow_mean"] = jnp.sum(t_final * overpix) / denom
        aux["t_final_overflow_max"] = jnp.max(jnp.where(overpix, t_final, 0.0))
    return total, aux


def _gate_grads(grads: Params, state: FrameState, n_alive, camera_only: bool):
    """Gradient control (trainer.py:535-551) + non-finite sanitization.

    Rasterizer gradients legitimately reach ~1e9 on degenerate splats; XLA
    fusion re-association can push marginal intermediates over f32 max,
    and a single inf gradient permanently NaN-poisons Adam's moments.
    Zeroing non-finite entries keeps the optimization healthy (observed as a
    fusion-dependent heisenbug: adding any isfinite reduction changed the
    schedule and the NaN vanished)."""
    grads = jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
    )
    C = grads.capacity
    has_last = state.last_num > 0
    in_prev = jnp.arange(C) < state.last_num
    # rgb grads zeroed for frames >= 2
    rgb = jnp.where(has_last, 0.0, grads.rgb)
    # still points' xyz grads zeroed
    still_gate = (in_prev & state.still_mask)[:, None]
    xyz = jnp.where(still_gate, 0.0, grads.xyz)
    g = grads._replace(rgb=rgb, xyz=xyz)
    if camera_only:
        zero_attr = lambda x: jnp.zeros_like(x)
        g = g._replace(
            xyz=zero_attr(g.xyz), scale=zero_attr(g.scale),
            rotate=zero_attr(g.rotate), opacity=zero_attr(g.opacity),
            rgb=zero_attr(g.rgb),
        )
    return g


def propagate_moving_points(params: Params, state: FrameState, targets, intr,
                            W: int, H: int) -> Params:
    """Flow-prior warm start: overwrite moving points' xyz by unprojecting
    (last_uv + flow) at the current frame's depth (trainer.py:347-381)."""
    C = params.capacity
    extr = pose_to_extr(params.pose)
    lu = state.last_uv
    in_prev = jnp.arange(C) < state.last_num
    moving = in_prev & ~state.still_mask
    within = (
        (lu[:, 0] > 0) & (lu[:, 0] < W - 1) & (lu[:, 1] > 0) & (lu[:, 1] < H - 1)
    )
    xi = jnp.clip(lu[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(lu[:, 1].astype(jnp.int32), 0, H - 1)
    flow = targets.flow[yi, xi]  # (C, 2)
    uv_new = lu + flow
    xi2 = jnp.clip(uv_new[:, 0].astype(jnp.int32), 0, W - 1)
    yi2 = jnp.clip(uv_new[:, 1].astype(jnp.int32), 0, H - 1)
    d_new = targets.depth[yi2, xi2, 0]
    xyz_new = pix2world(uv_new, d_new, intr, extr)
    sel = (moving & within)[:, None]
    return params._replace(xyz=jnp.where(sel, xyz_new, params.xyz))


def finalize_stage(uv, depth, params: Params, state: FrameState, move_mask,
                   n_alive, W: int, H: int) -> FrameState:
    """Post-update bookkeeping (trainer.py:588-625): refresh still masks from
    the final render, preserve old points' assignment, cache last_*."""
    C = params.capacity
    alive = jnp.arange(C) < n_alive
    within = (
        (uv[:, 0] > 0) & (uv[:, 0] < W - 1) & (uv[:, 1] > 0) & (uv[:, 1] < H - 1)
    ) & alive
    xi = jnp.clip(uv[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(uv[:, 1].astype(jnp.int32), 0, H - 1)
    labels = ~move_mask[yi, xi]
    fresh = jnp.where(within, labels, True)
    had_last = state.last_num > 0
    in_prev = jnp.arange(C) < state.last_num
    still = jnp.where(had_last & in_prev, state.still_mask, fresh)
    return FrameState(
        n_alive=n_alive,
        still_mask=still,
        still_mask_tentative=fresh,
        last_uv=uv,
        last_depth=depth,
        last_xyz=params.xyz,
        last_num=n_alive,
    )


def train_stage(params: Params, state: FrameState, targets, intr,
                key: jax.Array, cfg: StageConfig, dyn: StageDynamics):
    """Run one full optimization stage (compiled; call under jit with cfg
    static). Returns (params, state, info dict)."""
    if cfg.propagate:
        params = propagate_moving_points(params, state, targets, intr, cfg.W, cfg.H)

    opt_state = init_opt_state(params)
    n_alive0 = state.n_alive
    C = params.capacity

    # In the fast path the carry holds only small per-point aux; carrying the
    # full-resolution render through the fori_loop costs ~3ms/iteration in
    # dynamic-update-slice + copy (profiled). The final images are recomputed
    # once after the loop (from post-final-update params — one extra forward
    # per stage, amortized over hundreds of iterations).
    lean = cfg.snapshot_every <= 0
    # the flow loss's gathers/masks depend only on last_uv (fixed per stage)
    flow_prior = flow_prior_terms(state, targets, cfg.camera_only, cfg.W, cfg.H)
    dummy_aux = {
        "uv": jnp.zeros((C, 2)),
        "depth": jnp.zeros((C, 1)),
        "metrics": {
            k: jnp.asarray(0.0)
            for k in ("rgb", "depth", "var", "scale", "still", "flow", "total")
        },
    }
    if not lean:
        dummy_aux.update(
            rgb=jnp.zeros((cfg.H, cfg.W, 3)),
            depth_map=jnp.zeros((cfg.H, cfg.W, 1)),
            loss_rgb_pixel=jnp.zeros((cfg.H, cfg.W)),
            tile_overflow=jnp.asarray(0.0),
        )

    # ---- static densify schedule ----
    # The schedule is fully static (iteration-0 occ + every-interval err,
    # reference trainer.py:560-571), so densify runs BETWEEN Python-level
    # fori segments rather than behind a lax.cond inside the hot loop: the
    # in-loop cond forced the (H, W) error map + a both-branches densify
    # expansion into every iteration (~1.5 ms/iter at 480p/50k measured).
    # Each (kind, e) means "densify after iteration e completes".
    events: list = []
    if not cfg.camera_only:
        if cfg.densify_occ:
            events.append(("occ", 0))
        if cfg.densify_interval > 0:
            for t in range(1, cfg.densify_times + 1):
                e = cfg.densify_interval * t - 1
                if e < cfg.iterations and ("occ", e) not in events:
                    events.append(("err", e))
    events.sort(key=lambda kv: kv[1])

    def _fwd_update(i, params, opt_state, n_alive, bins=None):
        """Shared per-iteration core: forward + gated grads + LinearLR Adam.
        LinearLR 1.0 -> 0.1 over `iterations` (trainer.py:384); frozen at
        constant attr lr after densify (see densify.py docstring)."""

        def loss_fn(p):
            return _forward(p, n_alive, state, targets, intr, dyn.weights,
                            cfg, flow_prior=flow_prior, bins=bins)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = _gate_grads(grads, state, n_alive, cfg.camera_only)
        factor = 1.0 - 0.9 * i.astype(jnp.float32) / cfg.iterations
        pd = opt_state.post_densify
        lr_attr = jnp.where(pd, dyn.lr, dyn.lr * factor)
        lr_pose = jnp.where(pd, 0.0, dyn.lr_camera * factor)
        lr_depth = jnp.where(pd, 0.0, dyn.lr * factor)
        params, opt_state = adam_update(
            params, grads, opt_state, lr_attr, lr_pose, lr_depth
        )
        return params, opt_state, aux

    def one_iter(i, carry):
        params, opt_state, n_alive, key, _ = carry
        params, opt_state, aux = _fwd_update(i, params, opt_state, n_alive)
        if lean:
            aux = {k: aux[k] for k in ("uv", "depth", "metrics")}
        return params, opt_state, n_alive, key, aux

    def one_iter_cond_densify(i, carry):
        """Snapshot-path variant: densify behind a lax.cond inside the loop
        (the snapshot scan's chunk boundaries don't align with the static
        event schedule; this path trades ~1.5 ms/iter for simplicity and is
        only used when save_videos collects training snapshots)."""
        params, opt_state, n_alive, key, _ = carry
        params, opt_state, aux = _fwd_update(i, params, opt_state, n_alive)

        if events:
            key, k1 = jax.random.split(key)
            occ_cond = (i == 0) if cfg.densify_occ else jnp.asarray(False)
            err_cond = jnp.asarray(False)
            if cfg.densify_interval > 0:
                err_cond = ((i + 1) % cfg.densify_interval == 0) & (
                    (i + 1) // cfg.densify_interval <= cfg.densify_times
                )

            def do_densify(args):
                params, opt_state, n_alive = args
                err_map = aux["loss_rgb_pixel"]
                use_occ = occ_cond
                emap = jnp.where(use_occ, jnp.ones_like(err_map), err_map)
                mask = jnp.where(
                    use_occ, targets.occ_mask, err_map > dyn.densify_err_thre
                )
                percent = jnp.where(
                    use_occ, dyn.densify_occ_percent, dyn.densify_err_percent
                )
                extr = pose_to_extr(params.pose)
                new_params, new_n, _ = densify_by_pixels(
                    params, n_alive, emap, mask, targets.image, targets.depth,
                    intr, extr, dyn.num_points, percent, k1, cfg.max_densify,
                )
                new_opt = reset_opt_after_densify(opt_state, new_params)
                return new_params, new_opt, new_n

            params, opt_state, n_alive = jax.lax.cond(
                occ_cond | err_cond,
                do_densify,
                lambda args: args,
                (params, opt_state, n_alive),
            )
        return params, opt_state, n_alive, key, aux

    def apply_densify(carry, kind: str):
        """Densify between loop segments. 'occ': uniform map over the occ
        mask; 'err': rgb error above threshold, from one extra forward at
        the current params (one optimizer step newer than the in-loop
        formulation's map — immaterial to the stochastic sampling)."""
        params, opt_state, n_alive, key, aux = carry
        key, k1 = jax.random.split(key)
        if kind == "err":
            _, auxf = _forward(params, n_alive, state, targets, intr,
                               dyn.weights, cfg, flow_prior=flow_prior)
            err_map = auxf["loss_rgb_pixel"]
            emap = err_map
            mask = err_map > dyn.densify_err_thre
            percent = dyn.densify_err_percent
        else:
            emap = jnp.ones((cfg.H, cfg.W), jnp.float32)
            mask = targets.occ_mask
            percent = dyn.densify_occ_percent
        extr = pose_to_extr(params.pose)
        params, n_alive, _ = densify_by_pixels(
            params, n_alive, emap, mask, targets.image, targets.depth,
            intr, extr, dyn.num_points, percent, k1, cfg.max_densify,
        )
        opt_state = reset_opt_after_densify(opt_state, params)
        return params, opt_state, n_alive, key, aux

    init_carry = (params, opt_state, n_alive0, key, dummy_aux)
    snapshots = None
    if cfg.snapshot_every <= 0 and cfg.rebin_every > 1:
        # ---- amortized-rebinning loop ----
        # Tile lists ride the carry and refresh every rebin_every
        # iterations (and unconditionally after densify — new points must
        # enter the lists immediately). The rebin_every == 1 branch below
        # keeps the original bins-inside-the-grad structure bit-for-bit.
        from ..ops.binning import TileBins

        n_tx, n_ty = tile_grid(cfg.W, cfg.H)
        dummy_bins = TileBins(
            tile_lists=jnp.full(
                (n_tx * n_ty, cfg.render.max_per_tile), -1, jnp.int32),
            tile_counts=jnp.zeros((n_tx * n_ty,), jnp.int32),
            large_clamped=jnp.zeros((), jnp.int32),
        )

        def one_iter_rebin(i, carry):
            params, opt_state, n_alive, key, bins, _ = carry
            bins = jax.lax.cond(
                i % cfg.rebin_every == 0,
                lambda b: _compute_bins(params, n_alive, intr, cfg),
                lambda b: b,
                bins,
            )
            params, opt_state, aux = _fwd_update(i, params, opt_state,
                                                 n_alive, bins=bins)
            aux = {k: aux[k] for k in ("uv", "depth", "metrics")}
            return params, opt_state, n_alive, key, bins, aux

        carry = (params, opt_state, n_alive0, key, dummy_bins, dummy_aux)
        prev = 0
        for kind, e in events:
            carry = jax.lax.fori_loop(prev, e + 1, one_iter_rebin, carry)
            p_, o_, n_, k_, _, a_ = carry
            p_, o_, n_, k_, a_ = apply_densify((p_, o_, n_, k_, a_), kind)
            carry = (p_, o_, n_, k_, _compute_bins(p_, n_, intr, cfg), a_)
            prev = e + 1
        carry = jax.lax.fori_loop(prev, cfg.iterations, one_iter_rebin, carry)
        params, opt_state, n_alive, key, _, aux = carry
    elif cfg.snapshot_every <= 0:
        carry = init_carry
        prev = 0
        for kind, e in events:
            carry = jax.lax.fori_loop(prev, e + 1, one_iter, carry)
            carry = apply_densify(carry, kind)
            prev = e + 1
        carry = jax.lax.fori_loop(prev, cfg.iterations, one_iter, carry)
        params, opt_state, n_alive, key, aux = carry
    else:
        every = cfg.snapshot_every
        n_chunks = -(-cfg.iterations // every)

        def chunk(carry, c):
            start = c * every
            end = jnp.minimum(cfg.iterations, start + every)
            carry = jax.lax.fori_loop(start, end, one_iter_cond_densify,
                                      carry)
            p, _, n_alive_c, _, aux_c = carry
            # diagnostic "center" view: identity conic, opacity 1
            # (reference render.py:93-106)
            from ..ops.render import render as _render

            extr = pose_to_extr(p.pose)
            scale, rotate, opacity, rgb = _activate(p, n_alive_c)
            center = _render(
                p.xyz, scale, rotate, opacity, rgb, intr, extr, cfg.bg,
                cfg.W, cfg.H, ("center",), cfg.render,
            )["center"]
            # quantize + colormap ON DEVICE: snapshots leave the chip as
            # uint8 frames (4x less host transfer per stage — the videos
            # are 8-bit anyway), and the turbo depth colormap is pure jnp
            from ..viz.colormap import apply_float_colormap

            u8 = lambda x: (jnp.clip(x, 0.0, 1.0) * 255).astype(jnp.uint8)
            snap = {
                "rgb": u8(aux_c["rgb"]),
                "depth_map": u8(apply_float_colormap(
                    aux_c["depth_map"], colormap="turbo", non_zero=True)),
                "center": u8(center),
            }
            return carry, snap

        carry, snapshots = jax.lax.scan(
            chunk, init_carry, jnp.arange(n_chunks, dtype=jnp.int32)
        )
        params, opt_state, n_alive, key, aux = carry

    if lean:
        # one final forward (no grad) for the stage's output render + uv
        _, aux_full = _forward(params, n_alive, state, targets, intr,
                               dyn.weights, cfg, flow_prior=flow_prior,
                               diag_t_final=cfg.telemetry_t_final)
        aux = {**aux_full, "metrics": aux["metrics"]}

    if not cfg.camera_only:
        state = finalize_stage(
            aux["uv"], aux["depth"], params, state, targets.move_mask,
            n_alive, cfg.W, cfg.H,
        )
    else:
        state = state._replace(n_alive=n_alive)

    info = {
        "metrics": aux["metrics"],
        "rgb": aux["rgb"],
        "depth_map": aux["depth_map"],
        "uv": aux["uv"],
        "depth": aux["depth"],
        "n_alive": n_alive,
        "tile_overflow": aux.get("tile_overflow", jnp.asarray(0.0)),
    }
    for k in ("t_final_overflow_mean", "t_final_overflow_max"):
        if k in aux:
            info[k] = aux[k]
    if snapshots is not None:
        info["snapshots"] = snapshots
    if cfg.render.tile_shard_axes is not None:
        # Multi-chip mode: pin every output to replicated. Left to GSPMD,
        # stage outputs get committed shardings (e.g. a 4x2 device grid over
        # an image) that cannot be re-expressed on the ambient 1D mesh when
        # the arrays re-enter the next jitted call (parse_flatten_op_sharding
        # rejects split mesh axes). One all-gather per stage, amortized over
        # the iterations.
        from jax.sharding import PartitionSpec

        params, state, info = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, PartitionSpec()),
            (params, state, info),
        )
    return params, state, info
