"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_shape():
    from gflow_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"data": 2, "tile": 4}


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_step_matches_unsharded():
    """The sharded batched step must compute the same update as a 1-device
    mesh run (determinism of the tile-sharded einsum path)."""
    from gflow_tpu.parallel import make_mesh
    from gflow_tpu.parallel.multichip import dryrun_step

    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    l8 = dryrun_step(mesh8, B=2, seed=3)
    l1 = dryrun_step(mesh1, B=2, seed=3)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
