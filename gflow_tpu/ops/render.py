"""High-level multi-output render — TPU-native `render_multiple`.

Mirrors the output surface of the reference render wrapper
(gflow/utils/render.py:6-108): rgb, uv, depth, depth_map, depth_map_color,
center — with one deliberate improvement: the reference re-runs the full
alpha_blending kernel once *per requested map*; here all feature maps that
share the standard conic/opacity (rgb + depth + colormapped depth) are
composited in a **single fused pass** over concatenated feature channels.
The "center" visualization (identity conic, opacity 1 — reference:
render.py:93-106) reuses the same tile lists with overridden per-Gaussian
inputs, exactly like the CUDA path reuses its sorted ID lists.

Images are returned channels-last (H, W, C) — the natural TPU layout —
rather than the reference's (C, H, W).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import functools

import jax
import jax.numpy as jnp

from .binning import bin_gaussians, tile_grid
from .composite import composite_tiles
from .projection import project_gaussians, supported_max_radius
from ..viz.colormap import apply_float_colormap


@dataclass(frozen=True)
class RenderConfig:
    # Depth-sorted truncation keeps the NEAREST K per tile, so modest K
    # loses only splats already hidden behind ~full transmittance.
    max_per_tile: int = 128
    max_tiles_per_gaussian: int = 16
    # two-class binning (ops/binning.bin_gaussians): >0 = splats whose
    # tile-rect fits this smaller grid emit it instead of the full
    # max_tiles_per_gaussian grid; at most large_frac*N splats get the full
    # grid (largest-area first). 0 = single-class (every splat pays the
    # worst splat's footprint in the sort stream).
    small_tiles_per_gaussian: int = 0
    large_frac: float = 0.125
    tile_chunk: int = 64
    center_scale: float = 10.0  # matches render_multiple's default (render.py:8)
    backend: str = "auto"  # "auto" | "xla" | "pallas"
    # Multi-chip: mesh axis name(s) the compositor's tile dimension is
    # sharded over (requires an ambient jax.set_mesh; see
    # parallel/multichip.py). On TPU the Pallas kernel runs per-chip on its
    # band of tile rows via shard_map (pallas_raster.*_sharded); with
    # backend="xla" GSPMD partitions the XLA compositor instead. Either
    # way the backward's per-Gaussian gradient reduction rides ICI.
    tile_shard_axes: tuple | None = None

    @classmethod
    def for_scene(cls, W: int, H: int, num_points: int,
                  image=None) -> "RenderConfig":
        """Scene-adaptive caps (the GFlowTrainer default).

        max_tiles_per_gaussian sets both the binning sort-stream length
        (capacity * M keys) and the radius clamp
        (projection.supported_max_radius: M=8 -> 8 px, 12 -> 16, 16 -> 24):
        pick the smallest M whose supported radius still covers ~2.5x the
        expected splat spacing.

        Spacing: points are placed by gradient-importance sampling
        (core.sampling, reference complex_texture_sampling.py:4-46), so the
        *typical pixel's* distance to its nearest splat is
        1/sqrt(N * median(p)) — the median per-pixel sample density under
        the actual init distribution — not sqrt(W*H/N), which assumes
        uniform placement. With `image` given, the policy uses the measured
        statistic (for uniform p the two coincide exactly); without it, the
        uniform estimate.

        Calibration (M_QUALITY.json, 4 scenes at 854x480): on densely
        covered content (smoothed noise, high-freq texture; q50 spacing
        ~3 px) the tight M=8 clamp *improves* PSNR (50.4 vs 42.4 dB — it
        regularizes oversized splats) and cuts tile overflow 0.99 -> 0.26;
        on content where samples concentrate on edges and flat regions need
        few BIG splats (wall+sky: q50 6.7 px; the same scene at 10k points:
        14.9 px) the clamp craters PSNR (M=8 loses 6.7 / 27.8 dB vs the
        best M) — exactly what this statistic detects.

        In the dense regime the overflow drop also makes K=96 safe:
        M=8/K=96 fits to 43.3 dB vs 42.4 at M=16/K=128 while 17% faster
        (probe in the M_QUALITY commit); K=64 loses 10 dB — not taken.
        Sparser scenes keep K=128 (K_QUALITY.json: at high overflow, K=96
        costs 3.9 dB)."""
        import math

        spacing = math.sqrt(W * H / max(num_points, 1))
        if image is not None:
            import numpy as np

            from ..core.sampling import gradient_probability_map

            p_med = float(np.median(gradient_probability_map(
                np.asarray(image, np.float32))))
            spacing = 1.0 / math.sqrt(max(num_points * p_med, 1e-12))
        need = 2.5 * spacing
        shard = ambient_tile_axes()
        for m in (8, 12, 16, 48):
            if supported_max_radius(m) >= need:
                # m > 8: two-class emission — the wide grid exists for the
                # (few) big flat-region splats; typical splats are small, so
                # paying the wide grid for every splat multiplied the sort
                # stream 5x+ on sparse scenes (the r4 bench-vs-quality
                # per-iter gap). BINCLASS probe calibrates large_frac.
                return cls(max_per_tile=96 if m == 8 else 128,
                           max_tiles_per_gaussian=m,
                           small_tiles_per_gaussian=0 if m == 8 else 8,
                           tile_shard_axes=shard)
        return cls(max_per_tile=128, max_tiles_per_gaussian=64,
                   small_tiles_per_gaussian=8, tile_shard_axes=shard)


DEFAULT_CONFIG = RenderConfig()


def ambient_tile_axes() -> tuple | None:
    """Mesh axes to shard the compositor's tile dimension over, inferred
    from the ambient `jax.set_mesh` mesh: any axis named "tile" plus a
    leading "data" axis if present (a ('data', 'tile') mesh flattens onto
    the tile dimension of a single-frame fit). None outside a mesh context
    — the single-chip default. This is how the whole pipeline (trainer,
    fit_video, diagnostics) turns multi-chip: wrap the run in
    `jax.set_mesh(parallel.mesh.fitting_mesh(n))` and every
    RenderConfig.for_scene-configured stage shards its rasterizer."""
    m = jax.sharding.get_abstract_mesh()
    if m is None or m.empty or "tile" not in m.axis_names:
        return None
    return tuple(ax for ax in m.axis_names if ax in ("data", "tile"))


@functools.lru_cache(maxsize=64)
def _compiled_render(bg: float, W: int, H: int, outputs: tuple,
                     config: RenderConfig, as_uint8: bool):
    return jax.jit(functools.partial(render, bg=bg, W=W, H=H,
                                     outputs=outputs, config=config,
                                     as_uint8=as_uint8))


def render_jit(xyz, scale, rotate, opacity, rgb, intr, extr, bg, W, H,
               outputs=("rgb", "uv", "depth", "depth_map", "depth_map_color",
                        "center"),
               config: RenderConfig = DEFAULT_CONFIG, as_uint8: bool = False):
    """Jit-cached render for HOST callers (diagnostic/eval/viewer paths).

    Plain render() executes eagerly — fine while tracing inside a larger
    jit, but from host code every op dispatches individually through the
    device tunnel (measured ~17 s per diagnostic still/move render pair at
    480p vs milliseconds compiled). Cache key: the static call shape.

    as_uint8 quantizes image-type outputs inside the compiled graph — one
    dispatch total, versus render2img's eager clip/mul/cast chain per image
    (3 tunnel round-trips each on this rig)."""
    return _compiled_render(float(bg), int(W), int(H), tuple(outputs),
                            config, bool(as_uint8))(
                                xyz, scale, rotate, opacity, rgb, intr, extr)


def render(
    xyz: jax.Array,
    scale: jax.Array,
    rotate: jax.Array,
    opacity: jax.Array,
    rgb: jax.Array,
    intr: jax.Array,
    extr: jax.Array,
    bg,
    W: int,
    H: int,
    outputs: Sequence[str] = ("rgb", "uv", "depth", "depth_map", "depth_map_color", "center"),
    config: RenderConfig = DEFAULT_CONFIG,
    as_uint8: bool = False,
):
    """All array inputs are *activated* values. Returns a dict of requested
    outputs: rgb/depth_map/depth_map_color/center are (H, W, C); uv is (N, 2);
    depth is (N, 1) with 0 == culled. as_uint8 (static) quantizes the
    image-type outputs (rgb/depth_map_color/center/acc — not uv/depth/
    depth_map, which are data) to uint8 on device."""
    proj = project_gaussians(
        xyz, scale, rotate, intr, extr, W, H,
        max_radius=supported_max_radius(config.max_tiles_per_gaussian),
    )
    uv, depth, conic, radius = proj["uv"], proj["depth"], proj["conic"], proj["radius"]

    out = {}
    if "uv" in outputs:
        out["uv"] = uv
    if "depth" in outputs:
        out["depth"] = depth

    need_main = any(k in outputs for k in ("rgb", "depth_map", "depth_map_color"))
    need_center = "center" in outputs
    if not (need_main or need_center):
        return out

    n_tx, n_ty = tile_grid(W, H)
    bins = bin_gaussians(
        uv,
        depth,
        radius,
        W,
        H,
        max_per_tile=config.max_per_tile,
        max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        small_tiles_per_gaussian=config.small_tiles_per_gaussian,
        large_frac=config.large_frac,
    )

    compose = _get_compositor(config)

    if need_main:
        feats = []
        slices = {}
        cursor = 0

        def add(name, f):
            nonlocal cursor
            feats.append(f)
            slices[name] = (cursor, cursor + f.shape[1])
            cursor += f.shape[1]

        if "rgb" in outputs:
            add("rgb", rgb)
        if "depth_map" in outputs:
            add("depth_map", depth)
        if "depth_map_color" in outputs:
            depth_color = apply_float_colormap(depth, colormap="turbo", non_zero=True)
            add("depth_map_color", depth_color)
        if "acc" in outputs:
            # accumulated alpha sum(alpha_i * T_i) per pixel: a ones feature
            # channel composites to exactly that (used to alpha-normalize the
            # blended depth map — see eval/benchmark.eval_tracking)
            add("acc", jnp.ones_like(depth))

        # per-channel background: the acc channel gets bg 0 so it reads
        # sum(alpha_i * T_i) directly — un-mixing a scalar bg afterwards is
        # ill-conditioned at bg=1 (white), where the bg term saturates the
        # channel to exactly 1 and destroys the information
        F_total = cursor
        bg_vec = jnp.full((F_total,), jnp.asarray(bg, jnp.float32))
        if "acc" in slices:
            bg_vec = bg_vec.at[slices["acc"][0]].set(0.0)
        img = compose(
            bins.tile_lists, uv, conic, opacity, jnp.concatenate(feats, axis=1),
            bg_vec, W, H, n_tx, n_ty, tile_counts=bins.tile_counts,
        )
        for name, (s, e) in slices.items():
            out[name] = img[..., s:e]
        if "acc" in out:
            out["acc"] = jnp.clip(out["acc"], 0.0, 1.0)

    if need_center:
        # identity conic + opacity 1 point-cloud view (reference render.py:93-106).
        # Opacity-masked points (dead capacity slots; still/move subset
        # renders, which mask via opacity where the reference slices the
        # arrays) must stay invisible here too — the reference's opacity-1
        # override only ever sees points that exist in its sliced tensors.
        center_conic = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 1.0], jnp.float32), conic.shape
        )
        center_op = jnp.where((depth > 0) & (opacity > 0), 1.0, 0.0)
        out["center"] = compose(
            bins.tile_lists, uv, center_conic, center_op, rgb,
            bg, W, H, n_tx, n_ty, tile_counts=bins.tile_counts,
        )

    if as_uint8:
        for name in ("rgb", "depth_map_color", "center", "acc"):
            if name in out:
                out[name] = (jnp.clip(out[name], 0.0, 1.0) * 255).astype(
                    jnp.uint8)
    return out


def render_scene(scene, camera, bg, W, H, outputs, config: RenderConfig = DEFAULT_CONFIG):
    """Render a GaussianScene with a Camera (activations applied here)."""
    xyz, scale, rotate, opacity, rgb = scene.activated()
    return render(
        xyz, scale, rotate, opacity, rgb, camera.intr, camera.extr, bg, W, H,
        outputs, config,
    )


def render_traj(
    xyz, scale, rotate, opacity, rgb, intr, extr, bg, W, H,
    point_num: int,
    line_scale: float = 1.0,
    point_scale: float = 2.0,
    config: RenderConfig = DEFAULT_CONFIG,
    n_actual=None,
):
    """Trajectory line-set rendering: conic overridden to scaled identity,
    larger for the line body than the head points (reference:
    gflow/utils/render.py:110-156 — note the reference scales the *first*
    len-point_num entries by point_scale; we mirror that exactly).

    n_actual: logical point count when the arrays are padded to a fixed
    capacity (padding slots carry opacity 0); keeps the point/line split at
    the right boundary while callers reuse one compiled shape."""
    proj = project_gaussians(xyz, scale, rotate, intr, extr, W, H)
    uv, depth, conic, radius = proj["uv"], proj["depth"], proj["conic"], proj["radius"]
    n_tx, n_ty = tile_grid(W, H)
    bins = bin_gaussians(
        uv, depth, radius, W, H,
        max_per_tile=config.max_per_tile,
        max_tiles_per_gaussian=config.max_tiles_per_gaussian,
        small_tiles_per_gaussian=config.small_tiles_per_gaussian,
        large_frac=config.large_frac,
    )
    n = xyz.shape[0]
    cutoff = (n if n_actual is None else n_actual) - point_num
    ident = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    scale_per_pt = jnp.where(
        jnp.arange(n) < cutoff, point_scale, line_scale
    )[:, None]
    traj_conic = jnp.broadcast_to(ident, conic.shape) * scale_per_pt
    compose = _get_compositor(config)
    return compose(
        bins.tile_lists, uv, traj_conic, opacity, rgb, bg, W, H, n_tx, n_ty,
        tile_counts=bins.tile_counts,
    )


@functools.lru_cache(maxsize=32)
def _compiled_render_traj(bg, W, H, point_num, line_scale, point_scale,
                          config, as_uint8):
    def go(xyz, scale, rotate, opacity, rgb, intr, extr, n_actual):
        img = render_traj(xyz, scale, rotate, opacity, rgb, intr, extr,
                          bg, W, H, point_num, line_scale, point_scale,
                          config, n_actual)
        if as_uint8:
            img = (jnp.clip(img, 0.0, 1.0) * 255).astype(jnp.uint8)
        return img

    return jax.jit(go)


def render_traj_jit(xyz, scale, rotate, opacity, rgb, intr, extr, bg, W, H,
                    point_num, line_scale=1.0, point_scale=2.0,
                    config: RenderConfig = DEFAULT_CONFIG, n_actual=None,
                    as_uint8: bool = False):
    """Jit-cached render_traj for host callers (see render_jit). n_actual is
    a traced scalar so per-frame point counts reuse one compile."""
    if n_actual is None:
        n_actual = xyz.shape[0]
    return _compiled_render_traj(
        float(bg), int(W), int(H), int(point_num), float(line_scale),
        float(point_scale), config, bool(as_uint8),
    )(xyz, scale, rotate, opacity, rgb, intr, extr,
      jnp.asarray(n_actual, jnp.int32))


def resolve_backend(config: RenderConfig) -> str:
    """Compositor implementation choice. Sharded mode (tile_shard_axes set)
    no longer forces XLA: on TPU the multi-chip fitting mode stays on the
    Pallas kernel via the shard_map band wrapper
    (pallas_raster.composite_tiles_pallas_sharded); the XLA compositor
    remains the GSPMD-partitioned fallback (backend="xla")."""
    if config.backend != "auto":
        return config.backend
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _get_compositor(config: RenderConfig):
    if resolve_backend(config) == "pallas":
        if config.tile_shard_axes is not None:
            from .pallas_raster import composite_tiles_pallas_sharded

            def compose(tile_lists, uv, conic, opacity, features, bg, W, H,
                        n_tx, n_ty, tile_counts=None):
                return composite_tiles_pallas_sharded(
                    tile_lists, uv, conic, opacity, features, bg, W, H,
                    n_tx, n_ty, shard_axes=config.tile_shard_axes,
                    tile_counts=tile_counts,
                )

            return compose

        from .pallas_raster import composite_tiles_pallas

        def compose(tile_lists, uv, conic, opacity, features, bg, W, H,
                    n_tx, n_ty, tile_counts=None):
            return composite_tiles_pallas(
                tile_lists, uv, conic, opacity, features, bg, W, H,
                n_tx, n_ty, tile_counts=tile_counts,
            )

        return compose

    def compose(tile_lists, uv, conic, opacity, features, bg, W, H,
                n_tx, n_ty, tile_counts=None):
        # the XLA fallback masks empty slots itself; counts are unused
        return composite_tiles(
            tile_lists, uv, conic, opacity, features, bg, W, H, n_tx, n_ty,
            tile_chunk=config.tile_chunk,
            shard_axes=config.tile_shard_axes,
        )

    return compose


_quantize_u8 = jax.jit(lambda x: (jnp.clip(x, 0.0, 1.0) * 255).astype(jnp.uint8))


def render2img(rendered: jax.Array):
    """(H, W, C) float -> uint8 numpy image (reference: render.py:158-165).

    Quantizes ON DEVICE before the host transfer: full-res f32 maps are 4x
    the bytes of the uint8 image actually consumed, and device->host
    bandwidth is the bottleneck of the per-frame diagnostic/render IO.
    Quantization runs under jit (not eagerly): in the multi-chip fitting
    mode stage outputs arrive with GSPMD-committed shardings that eager ops
    cannot re-map onto the ambient mesh; jit inserts the resharding."""
    import numpy as np

    if getattr(rendered, "dtype", None) == jnp.uint8:
        return np.asarray(rendered)
    return np.asarray(_quantize_u8(rendered))


def render2img_async(rendered: jax.Array):
    """render2img that does NOT block: quantizes on device, starts the
    D2H copy, and returns the device uint8 array. Consumers materialize
    with np.asarray wherever the image is actually used — by then the
    copy has streamed behind other work (per-frame diagnostic images are
    only consumed by the background PNG writer / end-of-run video mux)."""
    if getattr(rendered, "dtype", None) != jnp.uint8:
        rendered = _quantize_u8(rendered)
    if hasattr(rendered, "copy_to_host_async"):
        rendered.copy_to_host_async()
    return rendered
