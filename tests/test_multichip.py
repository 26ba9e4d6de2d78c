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


@pytest.mark.slow
def test_fullscale_step(tmp_path):
    """The batched sharded step at the REAL canonical shape (854x480, 64k
    capacity, K=128, B=2): proves the batched compositor's memory story at
    the true tile count (T=1620/frame) and records peak RSS. Slow on the
    1-core virtual mesh — opt in with GFLOW_FULLSCALE=1."""
    import json
    import os
    import resource

    if os.environ.get("GFLOW_FULLSCALE", "0") != "1":
        pytest.skip("set GFLOW_FULLSCALE=1 to run the full-scale step")

    from gflow_tpu.parallel import make_mesh
    from gflow_tpu.parallel.multichip import dryrun_step

    mesh = make_mesh(8, data_parallel=2, platform="cpu")
    loss = dryrun_step(mesh, B=2, W=854, H=480, capacity=65536,
                       max_per_tile=128, max_tiles_per_gaussian=16)
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {"loss": float(loss), "peak_rss_gb": round(peak_gb, 2),
           "shape": "B=2 854x480 cap=65536 K=128 on 2x4 mesh"}
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "MULTICHIP_FULLSCALE.json"), "w") as f:
        json.dump(out, f)
    assert peak_gb < 100, f"peak RSS {peak_gb} GB exceeds bound"
