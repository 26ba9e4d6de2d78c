"""Released-scale smoke tests for the prior-model graphs (VERDICT r2 item 2).

The canonical sizes the reference runs: AsymmetricMASt3R ViT-Large at 512px
(utility/depth_mast3r.py:46-48,83) and GMFlow scale2-regrefine6 at DAVIS
480p (scripts/flow_unimatch.sh:48-62). These instantiate the REAL graphs
with random init weights (no checkpoints ship here; weights change values,
not shapes/memory) and run one forward — proving the graphs compile and fit
in device memory at the shapes prep_depth/prep_flow use.

Heavyweight (ViT-L init is ~660M params): opt in with GFLOW_RELEASED_SCALE=1
— the driver-side evidence lives in MODEL_SCALE.json
(scripts/probe_released_scale.py).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if os.environ.get("GFLOW_RELEASED_SCALE", "0") != "1":
    pytest.skip("set GFLOW_RELEASED_SCALE=1 to run released-scale smokes",
                allow_module_level=True)


@pytest.mark.slow
def test_gmflow_released_scale_forward():
    from gflow_tpu.models.unimatch import GMFlow, GMFlowConfig

    H, W = 480, 864  # 854 padded to padding_factor 32
    model = GMFlow(GMFlowConfig())
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)
    flow = jax.jit(model.apply)(params, img0, img1)
    assert flow.shape == (1, H, W, 2)
    assert bool(jnp.all(jnp.isfinite(flow)))


@pytest.mark.slow
def test_mast3r_released_scale_forward():
    from gflow_tpu.models.mast3r import Mast3rModel, Mast3rConfig

    H, W = 384, 512
    model = Mast3rModel(Mast3rConfig(head="catmlp+dpt"))
    rng = np.random.default_rng(1)
    img0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, img1)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert n_params > 400e6  # ViT-L 1024/24 + dec 768/12 + DPT heads
    o1, o2 = jax.jit(model.apply)(params, img0, img1)
    assert o1["pts3d"].shape == (1, H, W, 3)
    assert o2["conf"].shape == (1, H, W, 1)
    assert bool(jnp.all(jnp.isfinite(o1["pts3d"])))
