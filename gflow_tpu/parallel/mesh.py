"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY 2.3: no
torch.distributed/NCCL anywhere); parallelism here is designed TPU-first:

- axis "data": scene/frame-level data parallelism (one DAVIS sequence or
  frame batch per chip — the `benchmark_multi` sweep mode),
- axis "tile": spatial sharding of the rasterizer inside one scene — tiles
  are embarrassingly parallel in the forward pass; the backward's
  scatter-add of Gaussian gradients becomes an XLA all-reduce over the tile
  axis, riding ICI.

Sharding is expressed with `jax.lax.with_sharding_constraint` and GSPMD
propagation (annotate, let XLA insert collectives) rather than hand-written
collectives.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_parallel: int | None = None,
              platform: str | None = None):
    """Build a ('data', 'tile') mesh over the first n_devices devices.

    platform: restrict to devices of this backend (e.g. "cpu" for the
    virtual-device dryrun/test path — the bench host also has a TPU backend
    registered, and `jax.devices()` would initialize it)."""
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if data_parallel is None:
        data_parallel = 2 if n % 2 == 0 and n >= 4 else 1
    tile = n // data_parallel
    arr = np.asarray(devs[: data_parallel * tile]).reshape(data_parallel, tile)
    return Mesh(arr, ("data", "tile"))


def fitting_mesh(n_devices: int | None = None, platform: str | None = None
                 ) -> Mesh:
    """1D ("tile",) mesh for the multi-chip *fitting* mode: wrap a fit in
    `jax.set_mesh(fitting_mesh(n))` and every RenderConfig.for_scene stage
    shards its rasterizer's tile axis across the chips (see
    ops/render.ambient_tile_axes). The per-Gaussian attribute arrays stay
    replicated (50k points is small); the per-tile compositing — the
    dominant compute — splits T/n per chip, and GSPMD turns the backward's
    gradient scatter-add into an all-reduce over ICI."""
    devs = jax.devices(platform) if platform else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"fitting_mesh: {n_devices} devices requested but only "
                f"{len(devs)} visible — refusing to silently run the "
                "unchunked sharded compositor on fewer chips (its "
                "per-device working set assumes the requested split)"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), ("tile",))


def sharded_batch_apply(fn, mesh: Mesh, axis: str = "data"):
    """Wrap a batched pure function (params, *batched_args) -> batched_out
    so the batch axis is sharded across `axis` of the mesh and params are
    replicated — the SPMD form for prior-model inference (GMFlow frame
    pairs / MASt3R edges) across chips. Batch sizes must be divisible by
    the axis size; callers pad and crop."""
    batch_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    jitted = jax.jit(fn)

    def apply(params, *batched):
        params = jax.device_put(params, repl)
        batched = tuple(
            jax.device_put(x, NamedSharding(mesh, P(axis, *[None] * (x.ndim - 1))))
            for x in batched
        )
        return jitted(params, *batched)

    apply.batch_sharding = batch_sharding
    return apply
