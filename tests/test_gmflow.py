"""GMFlow model tests: shapes, jit-compile, and a functional sanity check —
with random weights the network can still be *trained briefly* on a tiny
synthetic shift to verify gradients flow end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gflow_tpu.models.unimatch import (GMFlow, GMFlowConfig,
                                       forward_backward_consistency)

CFG = GMFlowConfig(
    feature_channels=32,
    num_transformer_layers=2,
    num_reg_refine=2,
    attn_splits_list=(2, 4),
)


def test_forward_shapes_and_jit():
    H, W = 64, 96
    model = GMFlow(CFG)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), a, b)
    flow = jax.jit(model.apply)(params, a, b)
    assert flow.shape == (1, H, W, 2)
    assert bool(jnp.all(jnp.isfinite(flow)))


def test_fwd_bwd_consistency_shapes():
    B, H, W = 1, 32, 48
    f = jnp.zeros((B, H, W, 2))
    occ_f, occ_b = forward_backward_consistency(f, f)
    assert occ_f.shape == (B, H, W)
    assert float(occ_f.sum()) == 0.0  # consistent zero flow -> no occlusion
    # inconsistent flows -> occluded
    f2 = jnp.full((B, H, W, 2), 5.0)
    occ_f, _ = forward_backward_consistency(f2, f2)
    assert float(occ_f.mean()) > 0.5


@pytest.mark.slow
def test_trainable_on_known_shift():
    """Overfit a 2px horizontal shift on one tiny pair: the flow loss should
    drop substantially — validates the full graph is differentiable and the
    output head actually controls the flow."""
    import optax

    H, W = 32, 32
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 1, (H, W + 4, 3)).astype(np.float32)
    img0 = base[:, 2 : 2 + W]
    img1 = base[:, 0:W]  # content shifted right by 2 px => flow x = +2
    a = jnp.asarray(img0)[None]
    b = jnp.asarray(img1)[None]
    target = jnp.zeros((1, H, W, 2)).at[..., 0].set(2.0)

    model = GMFlow(CFG)
    params = model.init(jax.random.PRNGKey(0), a, b)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return jnp.mean(jnp.abs(model.apply(p, a, b) - target))

        l, g = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, l

    # Upstream-faithful flow.detach() before propagation/refinement means
    # only the last refine iteration's delta-flow head gets direct gradient
    # (upstream trains with intermediate supervision we don't replicate
    # here), so this contrived single-pair overfit oscillates — assert on
    # the best loss over 90 steps, not whichever peak step N lands on
    # (the trajectory is also sensitive to XLA reduction order, e.g. the
    # 8-virtual-device CPU config conftest forces).
    losses = []
    for i in range(90):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert min(losses) < losses[0] * 0.7, losses[::5]
    assert losses[-1] < losses[0] * 0.8, losses[::5]


def test_convert_load_forward(tmp_path):
    """Full weight path: torch state dict with the released
    gmflow-scale2-regrefine6 key names/shapes -> convert -> npz ->
    prep_flow.load_params -> model.apply, with NO unmatched keys in either
    direction and structural equality with model.init."""
    from gflow_tpu.models.unimatch.convert import (convert_state_dict,
                                                   expected_torch_keys,
                                                   save_npz)
    from gflow_tpu.pipeline.prep_flow import load_params

    manifest = expected_torch_keys()
    rng = np.random.default_rng(0)
    sd = {k: (rng.normal(0, 0.02, s) / (1 + np.prod(s) ** 0.25)).astype(
        np.float32) for k, s in manifest.items()}
    flat = convert_state_dict(sd)
    p = tmp_path / "unimatch.npz"
    save_npz(flat, str(p))
    params = load_params(str(p))

    model = GMFlow(GMFlowConfig())  # released config (scale2-regrefine6)
    a = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 64, 96, 3)),
                    jnp.float32)
    ref = model.init(jax.random.PRNGKey(0), a, a)
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert {tuple(k) for k, _ in ref_flat} == {tuple(k) for k, _ in got_flat}
    for (kp, vref), (_, vgot) in zip(ref_flat, got_flat):
        assert vref.shape == vgot.shape, (kp, vref.shape, vgot.shape)

    flow = model.apply(params, a, a)
    assert flow.shape == (1, 64, 96, 2)
    assert np.isfinite(np.asarray(flow)).all()

    # missing/renamed keys must fail loudly
    bad = dict(sd)
    del bad["refine.gru.convz1.weight"]
    with pytest.raises(KeyError):
        convert_state_dict(bad)
