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


def tile_sharded_composite_constraint(mesh: Mesh, batched: bool):
    """Returns a constraint fn applied to (T, ...) per-tile arrays inside the
    compositor: shards the tile axis across the 'tile' mesh axis (and the
    leading batch axis across 'data' when batched)."""
    def constrain(x):
        if batched:
            spec = P("data", "tile")
        else:
            spec = P("tile")
        ndim_extra = x.ndim - len(spec)
        full = P(*spec, *([None] * ndim_extra))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, full))

    return constrain
