"""Sharded prior-model inference (SURVEY 2.3(i)): GMFlow frame pairs and
MASt3R logwin edges batched across the mesh data axis, validated for
equality with the unsharded path on the virtual CPU mesh."""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if len(jax.devices()) < 4:
    pytest.skip("needs >= 4 (virtual) devices", allow_module_level=True)


def _write_frames(d, n=4, H=48, W=64, seed=0):
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    base = rng.uniform(0, 255, (H, W + 8, 3)).astype(np.uint8)
    for t in range(n):
        imageio.imwrite(os.path.join(d, f"{t:05d}.png"),
                        base[:, t * 2 : t * 2 + W])


def test_prep_flow_sharded_matches_single(tmp_path):
    from gflow_tpu.core.io import read_flow
    from gflow_tpu.models.unimatch import GMFlow, GMFlowConfig
    from gflow_tpu.pipeline import prep_flow

    cfg = GMFlowConfig(feature_channels=32, num_transformer_layers=1,
                       num_reg_refine=1, attn_splits_list=(2, 4))
    model = GMFlow(cfg)
    a = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), a, a)

    d1 = str(tmp_path / "seq1")
    d2 = str(tmp_path / "seq2")
    _write_frames(d1)
    _write_frames(d2)

    prep_flow.main(d1, model=model, params=params, mesh_devices=0)
    prep_flow.main(d2, model=model, params=params, mesh_devices=4)

    flos = sorted(os.path.basename(p)
                  for p in glob.glob(d1 + "_flow_unimatch/*.flo"))
    assert len(flos) == 6  # 3 pairs x fwd/bwd
    for f in flos:
        f1 = read_flow(d1 + "_flow_unimatch/" + f)
        f2 = read_flow(d2 + "_flow_unimatch/" + f)
        np.testing.assert_allclose(f2, f1, atol=2e-4)


def test_prep_depth_sharded_matches_single(tmp_path):
    from gflow_tpu.models.mast3r import Mast3rModel, Mast3rConfig
    from gflow_tpu.pipeline import prep_depth

    cfg = Mast3rConfig(patch_size=8, enc_dim=32, enc_depth=1, enc_heads=4,
                       dec_dim=16, dec_depth=1, dec_heads=4, with_desc=False)
    model = Mast3rModel(cfg)
    a = jnp.zeros((1, 48, 64, 3))
    params = model.init(jax.random.PRNGKey(0), a, a)

    d1 = str(tmp_path / "seqA")
    d2 = str(tmp_path / "seqB")
    _write_frames(d1, n=5)
    _write_frames(d2, n=5)

    prep_depth.main(d1, model=model, params=params, mesh_devices=0,
                    inference_size=48, winsize=2)
    prep_depth.main(d2, model=model, params=params, mesh_devices=4,
                    inference_size=48, winsize=2)

    deps = sorted(os.path.basename(p)
                  for p in glob.glob(d1 + "_depth_mast3r_s2/*.npy"))
    assert len(deps) == 5
    for f in deps:
        a1 = np.load(d1 + "_depth_mast3r_s2/" + f)
        a2 = np.load(d2 + "_depth_mast3r_s2/" + f)
        # alignment is an iterative optimization downstream of identical
        # pair predictions; tolerate tiny numeric drift
        np.testing.assert_allclose(a2, a1, rtol=2e-3, atol=2e-3)
