"""MASt3R catmlp+dpt head: numerics vs a torch replica of the released
topology, and the full convert -> load -> apply path.

The torch replica in this file re-states the DPT stack exactly as the
released checkpoints structure it (conv/convT/interpolate align_corners):
agreement proves the flax modules + converter transforms reproduce torch
semantics (channel orders, transposes, pixel shuffle, bilinear mode) — the
failure modes shape-only tests cannot catch."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn
import torch.nn.functional as tF

import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from gflow_tpu.models.mast3r.dpt_head import (
    DptCore, bilinear_resize_ac, pixel_shuffle_tokens, reg_dense_pts3d)


def test_bilinear_align_corners_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    out = bilinear_resize_ac(jnp.asarray(x), 10, 14)
    ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(1)
    B, h, w, C, p = 2, 3, 4, 5, 4
    tok = rng.normal(size=(B, h * w, C * p * p)).astype(np.float32)
    out = pixel_shuffle_tokens(jnp.asarray(tok), h, w, C, p)
    t = torch.from_numpy(tok).transpose(-1, -2).reshape(B, C * p * p, h, w)
    ref = tF.pixel_shuffle(t, p).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_reg_dense_pts3d_matches_torch():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(4, 6, 3)).astype(np.float32) * 2
    t = torch.from_numpy(xyz)
    d = t.norm(dim=-1, keepdim=True)
    ref = (t / d.clip(min=1e-8) * torch.expm1(d)).numpy()
    np.testing.assert_allclose(np.asarray(reg_dense_pts3d(jnp.asarray(xyz))),
                               ref, atol=1e-5, rtol=1e-5)


# --------------------------------------------------------------------------
# torch replica of the released DPT stack
# --------------------------------------------------------------------------


class _RCU(tn.Module):
    def __init__(self, f):
        super().__init__()
        self.conv1 = tn.Conv2d(f, f, 3, 1, 1)
        self.conv2 = tn.Conv2d(f, f, 3, 1, 1)

    def forward(self, x):
        out = self.conv2(torch.relu(self.conv1(torch.relu(x))))
        return out + x


class _Fusion(tn.Module):
    def __init__(self, f):
        super().__init__()
        self.out_conv = tn.Conv2d(f, f, 1)
        self.resConfUnit1 = _RCU(f)
        self.resConfUnit2 = _RCU(f)

    def forward(self, x, res=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        x = tF.interpolate(x, scale_factor=2, mode="bilinear",
                           align_corners=True)
        return self.out_conv(x)


class _TorchDpt(tn.Module):
    def __init__(self, dims, ld, f, last, out):
        super().__init__()
        self.act_postprocess = tn.ModuleList([
            tn.Sequential(tn.Conv2d(dims[0], ld[0], 1),
                          tn.ConvTranspose2d(ld[0], ld[0], 4, 4)),
            tn.Sequential(tn.Conv2d(dims[1], ld[1], 1),
                          tn.ConvTranspose2d(ld[1], ld[1], 2, 2)),
            tn.Sequential(tn.Conv2d(dims[2], ld[2], 1)),
            tn.Sequential(tn.Conv2d(dims[3], ld[3], 1),
                          tn.Conv2d(ld[3], ld[3], 3, 2, 1)),
        ])
        self.layer_rn = tn.ModuleList(
            [tn.Conv2d(ld[i], f, 3, 1, 1, bias=False) for i in range(4)])
        self.refinenet = tn.ModuleList([_Fusion(f) for _ in range(4)])
        self.head = tn.Sequential(
            tn.Conv2d(f, last, 3, 1, 1),
            tn.Upsample(scale_factor=2, mode="bilinear", align_corners=True),
            tn.Conv2d(last, last, 3, 1, 1), tn.ReLU(),
            tn.Conv2d(last, out, 1))

    def forward(self, toks, hw):
        h, w = hw
        layers = [t.transpose(-1, -2).reshape(t.shape[0], -1, h, w)
                  for t in toks]
        layers = [self.act_postprocess[i](l) for i, l in enumerate(layers)]
        layers = [self.layer_rn[i](l) for i, l in enumerate(layers)]
        p4 = self.refinenet[3](layers[3])[
            :, :, : layers[2].shape[2], : layers[2].shape[3]]
        p3 = self.refinenet[2](p4, layers[2])[
            :, :, : layers[1].shape[2], : layers[1].shape[3]]
        p2 = self.refinenet[1](p3, layers[1])[
            :, :, : layers[0].shape[2], : layers[0].shape[3]]
        p1 = self.refinenet[0](p2, layers[0])
        return self.head(p1)


def _conv_p(m):  # torch Conv2d -> flax {kernel, bias}
    p = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        p["bias"] = m.bias.detach().numpy()
    return p


def _convT_p(m):  # torch ConvTranspose2d -> flax {kernel, bias}
    return {"kernel": m.weight.detach().numpy().transpose(2, 3, 0, 1),
            "bias": m.bias.detach().numpy()}


def test_dpt_core_matches_torch_replica():
    torch.manual_seed(0)
    dims, ld, f, last, out = (16, 12, 12, 12), (8, 12, 16, 24), 16, 8, 4
    h = w = 4
    ref = _TorchDpt(dims, ld, f, last, out).eval()

    params = {
        "act_0_0": _conv_p(ref.act_postprocess[0][0]),
        "act_0_1": _convT_p(ref.act_postprocess[0][1]),
        "act_1_0": _conv_p(ref.act_postprocess[1][0]),
        "act_1_1": _convT_p(ref.act_postprocess[1][1]),
        "act_2_0": _conv_p(ref.act_postprocess[2][0]),
        "act_3_0": _conv_p(ref.act_postprocess[3][0]),
        "act_3_1": _conv_p(ref.act_postprocess[3][1]),
        "head_0": _conv_p(ref.head[0]),
        "head_2": _conv_p(ref.head[2]),
        "head_4": _conv_p(ref.head[4]),
    }
    for n in range(1, 5):
        params[f"layer{n}_rn"] = _conv_p(ref.layer_rn[n - 1])
        fu = ref.refinenet[n - 1]
        blk = {"out_conv": _conv_p(fu.out_conv)}
        units = (2,) if n == 4 else (1, 2)
        for u in units:
            rcu = fu.resConfUnit1 if u == 1 else fu.resConfUnit2
            blk[f"resConfUnit{u}"] = {"conv1": _conv_p(rcu.conv1),
                                      "conv2": _conv_p(rcu.conv2)}
        params[f"refinenet{n}"] = blk

    rng = np.random.default_rng(3)
    toks = [rng.normal(size=(2, h * w, d)).astype(np.float32) for d in dims]
    mod = DptCore(dim_tokens=dims, num_channels=out, feature_dim=f,
                  last_dim=last, layer_dims=ld)
    got = mod.apply({"params": params},
                    [jnp.asarray(t) for t in toks], (h, w))
    want = ref([torch.from_numpy(t) for t in toks], (h, w))
    want = want.permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_catmlpdpt_convert_load_apply():
    """Released-layout synthetic state dict -> convert -> load -> apply:
    every key maps, the flax tree matches, the forward runs and returns all
    four MASt3R outputs at image resolution."""
    from gflow_tpu.models.mast3r import Mast3rModel, Mast3rConfig
    from gflow_tpu.models.mast3r.convert import (convert_state_dict,
                                                 expected_torch_keys,
                                                 detect_head)

    cfg = Mast3rConfig(enc_dim=32, enc_depth=2, enc_heads=2, dec_dim=24,
                       dec_depth=2, dec_heads=2, desc_dim=6,
                       head="catmlp+dpt")
    manifest = expected_torch_keys(enc_depth=2, dec_depth=2, enc_dim=32,
                                   dec_dim=24, patch_size=16,
                                   head="catmlp+dpt", desc_dim=6)
    rng = np.random.default_rng(0)
    sd = {k: (rng.normal(size=s) * 0.02).astype(np.float32)
          for k, s in manifest.items()}
    assert detect_head(sd) == "catmlp+dpt"
    flat = convert_state_dict(sd, enc_depth=2, dec_depth=2)
    params = {"params": unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})}

    model = Mast3rModel(cfg)
    H = W = 32
    img = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)
    # loading must be exact: init the tree and diff the key sets
    import jax
    ref_tree = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), img, img))["params"]
    from flax.traverse_util import flatten_dict
    got_keys = set(flatten_dict(params["params"]).keys())
    want_keys = set(flatten_dict(ref_tree).keys())
    assert got_keys == want_keys, (
        f"missing={sorted(want_keys - got_keys)[:5]} "
        f"extra={sorted(got_keys - want_keys)[:5]}")
    for k, v in flatten_dict(params["params"]).items():
        assert v.shape == flatten_dict(ref_tree)[k].shape, k

    o1, o2 = model.apply(params, img, img)
    for o in (o1, o2):
        assert o["pts3d"].shape == (1, H, W, 3)
        assert o["conf"].shape == (1, H, W, 1)
        assert o["desc"].shape == (1, H, W, 6)
        assert o["desc_conf"].shape == (1, H, W, 1)
        assert np.isfinite(np.asarray(o["pts3d"])).all()
        # unit-normalized descriptors
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(o["desc"]), axis=-1), 1.0, atol=1e-4)


def test_prep_depth_head_detection():
    """prep_depth picks the right head family from a converted tree."""
    from gflow_tpu.pipeline.prep_depth import model_for_params

    m = model_for_params({"params": {"downstream_head1": {"dpt": {}}}})
    assert m.config.head == "catmlp+dpt"
    m = model_for_params({"params": {"downstream_head1": {"proj": {}}}})
    assert m.config.head == "linear" and not m.config.with_desc
    m = model_for_params(
        {"params": {"downstream_head1": {"proj": {}, "desc_proj": {}}}})
    assert m.config.head == "linear" and m.config.with_desc
