"""Loss terms — exact formulas of the reference hot loop
(gflow/trainer.py:452-530).

All terms operate on fixed-capacity arrays with boolean masks; masked means
use sum(x*m)/max(sum(m),1) so dead slots contribute nothing.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp


class LossWeights(NamedTuple):
    rgb: jax.Array
    depth: jax.Array
    var: jax.Array
    scale: jax.Array
    still: jax.Array
    flow: jax.Array

    @classmethod
    def make(cls, rgb=1.0, depth=0.0, var=0.0, scale=0.0, still=0.0, flow=0.0):
        f = lambda x: jnp.asarray(x, jnp.float32)
        return cls(f(rgb), f(depth), f(var), f(scale), f(still), f(flow))


# ---------------------------------------------------------------------------
# SSIM (window 11, sigma 1.5, zero padding — gflow/utils/pytorch_ssim.py)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _ssim_window(window_size: int = 11, sigma: float = 1.5):
    xs = [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    import numpy as np

    g = np.asarray(xs, np.float32)
    return g / g.sum()


def _separable_blur(x, w1d):
    """(H, W, C) -> same-size separable blur with zero padding, as k-tap
    shifted multiply-adds (pure VPU elementwise; TPU lowers depthwise convs
    ~15x slower than this form — measured 3.7ms -> ~0.6ms at 480p)."""
    k = len(w1d)
    r = k // 2
    H, W = x.shape[:2]

    def pass_axis(v, axis):
        pad = [(0, 0)] * v.ndim
        pad[axis] = (r, r)
        vp = jnp.pad(v, pad)
        out = None
        for i, wi in enumerate(w1d):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(i, i + v.shape[axis])
            term = float(wi) * vp[tuple(sl)]
            out = term if out is None else out + term
        return out

    return pass_axis(pass_axis(x, 0), 1)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Mean SSIM of two (H, W, C) images in [0, 1] (window 11, sigma 1.5,
    zero-padded — matches gflow/utils/pytorch_ssim.py numerics).

    All five blurred maps (x, y, x^2, y^2, xy) are computed in ONE stacked
    separable pass."""
    w1d = _ssim_window(window_size)
    x, y = img1, img2
    stack = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    C = x.shape[-1]
    b = _separable_blur(stack, w1d)
    mu1, mu2 = b[..., :C], b[..., C : 2 * C]
    e_x2, e_y2, e_xy = b[..., 2 * C : 3 * C], b[..., 3 * C : 4 * C], b[..., 4 * C :]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = e_x2 - mu1_sq
    sigma2_sq = e_y2 - mu2_sq
    sigma12 = e_xy - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# Masked helpers
# ---------------------------------------------------------------------------


def masked_mean(x, mask, axis=None):
    mask = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return jnp.sum(x * mask, axis=axis) / denom


def _safe_norm(x, axis, eps=1e-12):
    """L2 norm with a finite gradient at 0 (plain norm has NaN grad there,
    which poisons masked-out padding slots through 0*NaN)."""
    return jnp.sqrt(jnp.sum(x * x, axis=axis) + eps)


def _std_unbiased(x, axis):
    """torch.std default (correction=1) — the reference's var loss uses it
    over the 3 scale axes (gflow/trainer.py:491)."""
    n = x.shape[axis]
    mean = jnp.mean(x, axis=axis, keepdims=True)
    return jnp.sqrt(jnp.sum((x - mean) ** 2, axis=axis) / max(n - 1, 1) + 1e-12)


# ---------------------------------------------------------------------------
# Full loss (one iteration)
# ---------------------------------------------------------------------------


def compute_losses(
    rendered_rgb,       # (H, W, 3)
    rendered_depth_map, # (H, W, 1)
    uv,                 # (C, 2)
    point_depth,        # (C, 1) 0 = culled
    scale_act,          # (C, 3)
    xyz,                # (C, 3)
    depth_ab,           # (2,)
    targets,            # Targets
    state,              # FrameState
    weights: LossWeights,
    camera_only: bool,
    W: int,
    H: int,
    flow_prior=None,
):
    """Returns (total_loss, metrics dict, loss_rgb_pixel (H, W)).

    flow_prior: optional precomputed (gt_flow_pts (C,2), and_mask (C,)) —
    both depend only on last_uv/targets, constant across a stage's
    iterations, so callers hoist the (C,)-sized gathers out of the loop."""
    C = uv.shape[0]
    slot = jnp.arange(C)
    alive = slot < state.n_alive
    in_prev = slot < state.last_num  # slots that existed at last frame

    metrics = {}
    total = jnp.asarray(0.0, jnp.float32)
    has_last = state.last_num > 0

    move_mask = targets.move_mask  # (H, W) bool
    not_move = ~move_mask

    # ---- rgb: per-pixel MSE + (1 - SSIM) (trainer.py:452-464) ----
    if camera_only:
        r = rendered_rgb * not_move[..., None]
        g = targets.image * not_move[..., None]
    else:
        r, g = rendered_rgb, targets.image
    loss_rgb_pixel = jnp.mean((r - g) ** 2, axis=-1)  # (H, W)
    loss_rgb = jnp.mean(loss_rgb_pixel) + (1.0 - ssim(r, g))
    total = total + weights.rgb * loss_rgb
    metrics["rgb"] = loss_rgb

    # ---- in-bounds mask, filtered by still/move exactly like the reference
    # (trainer.py:424-425,467-471: the filtered mask aliases within_index) ----
    within = (
        (uv[:, 0] > 0) & (uv[:, 0] < W - 1) & (uv[:, 1] > 0) & (uv[:, 1] < H - 1)
    ) & alive
    if camera_only:
        part = jnp.where(in_prev, state.still_mask, True)
    else:
        part = jnp.where(in_prev, ~state.still_mask, True)
    valid = jnp.where(has_last, within & part, within)

    # ---- depth: scale/shift-invariant relative L2 on the depth MAP
    # (trainer.py:476-488) ----
    d_norm = depth_ab[0] * rendered_depth_map + depth_ab[1]
    gt_d = targets.depth
    # POSITIVE denominator floor. The reference divides by (d_norm + gt) raw
    # (trainer.py:482); if the learned scale/shift drives it negative the
    # loss becomes negative and the optimizer maximizes depth error to -inf
    # (observed divergence->NaN on sparse-coverage frames). Identical in the
    # healthy regime, a barrier otherwise.
    denom = jnp.maximum(d_norm + gt_d, 1e-3)
    loss_depth_map = (d_norm - gt_d) ** 2 / denom
    if camera_only:
        loss_depth_map = loss_depth_map * not_move[..., None]
    loss_depth = jnp.mean(loss_depth_map)
    total = total + weights.depth * loss_depth
    metrics["depth"] = loss_depth

    # ---- var: mean unbiased std of the 3 scale axes (trainer.py:490-493) ----
    loss_var = masked_mean(_std_unbiased(scale_act, axis=1), alive)
    total = total + weights.var * loss_var
    metrics["var"] = loss_var

    # ---- scale: ||scale|| / point_depth over in-view points
    # (trainer.py:495-502) ----
    safe_d = jnp.where(point_depth[:, 0] > 0, point_depth[:, 0], 1.0)
    loss_scale = masked_mean(_safe_norm(scale_act, axis=1) / safe_d, valid)
    total = total + weights.scale * loss_scale
    metrics["scale"] = loss_scale

    # ---- still: anchor still points to last frame (trainer.py:505-509) ----
    still_sel = in_prev & state.still_mask & alive
    dist = _safe_norm(xyz - state.last_xyz, axis=1)
    loss_still = masked_mean(dist, still_sel)
    loss_still = jnp.where(has_last, loss_still, 0.0)
    total = total + weights.still * loss_still
    metrics["still"] = loss_still

    # ---- flow: local flow consistency (trainer.py:511-530) ----
    lu = state.last_uv
    if flow_prior is not None:
        gt_flow_pts, and_mask = flow_prior
    else:
        gt_flow_pts, and_mask = flow_prior_terms(
            state, targets, camera_only, W, H
        )
    pred_flow = uv - lu
    flow_err = jnp.mean((pred_flow - gt_flow_pts) ** 2, axis=1)
    loss_flow = masked_mean(flow_err, and_mask)
    loss_flow = jnp.where(has_last, loss_flow, 0.0)
    total = total + weights.flow * loss_flow
    metrics["flow"] = loss_flow

    metrics["total"] = total
    return total, metrics, loss_rgb_pixel


def flow_prior_terms(state, targets, camera_only: bool, W: int, H: int):
    """The flow loss's per-stage constants: gt flow sampled at last_uv and
    the participation mask (trainer.py:511-525)."""
    C = state.last_uv.shape[0]
    in_prev = jnp.arange(C) < state.last_num
    lu = state.last_uv
    and_mask = (
        (lu[:, 0] > 0) & (lu[:, 0] < W - 1) & (lu[:, 1] > 0) & (lu[:, 1] < H - 1)
    ) & in_prev
    if camera_only:
        and_mask = and_mask & state.still_mask
    else:
        and_mask = and_mask & ~state.still_mask
    xi = jnp.clip(lu[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(lu[:, 1].astype(jnp.int32), 0, H - 1)
    return targets.flow[yi, xi], and_mask
