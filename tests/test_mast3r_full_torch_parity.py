"""Full two-view MASt3R model vs a tiny torch replica of the DUSt3R/CroCo
composition: patch embed, RoPE encoder stack, shared decoder_embed, the
interleaved dec_blocks/dec_blocks2 cross-attention schedule (both sides
read the PREVIOUS iteration's opposite tokens), dec_norm, hook indices
[0, 2l/4, 3l/4, l], and the catmlp+dpt heads — with weights routed through
convert_state_dict, locking converter + graph end-to-end."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn
import torch.nn.functional as tF

import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from gflow_tpu.models.mast3r import Mast3rModel, Mast3rConfig
from gflow_tpu.models.mast3r.convert import convert_state_dict
from tests.test_mast3r_torch_parity import (TEncBlock, TDecBlock)
from tests.test_dpt import _TorchDpt


ENC_DIM, DEC_DIM, HEADS, DEPTH = 32, 24, 2, 2
PATCH = 16
DESC = 6


class TorchMast3r(tn.Module):
    def __init__(self):
        super().__init__()
        self.patch = tn.Conv2d(3, ENC_DIM, PATCH, PATCH)
        self.enc = tn.ModuleList(
            [TEncBlock(ENC_DIM, HEADS) for _ in range(DEPTH)])
        self.enc_norm = tn.LayerNorm(ENC_DIM, eps=1e-6)
        self.embed = tn.Linear(ENC_DIM, DEC_DIM)
        self.dec1 = tn.ModuleList(
            [TDecBlock(DEC_DIM, HEADS) for _ in range(DEPTH)])
        self.dec2 = tn.ModuleList(
            [TDecBlock(DEC_DIM, HEADS) for _ in range(DEPTH)])
        self.dec_norm = tn.LayerNorm(DEC_DIM, eps=1e-6)
        # catmlp+dpt heads: hooks (0, l*2//4, l*3//4, l) over
        # [enc_out, dec1_out, ..., decN_out(normed)]
        hooks = (0, DEPTH * 2 // 4, DEPTH * 3 // 4, DEPTH)
        dims = tuple(ENC_DIM if h == 0 else DEC_DIM for h in hooks)
        self.hooks = hooks
        ld, f, last = (96, 192, 384, 768), 256, 128
        self.dpt1 = _TorchDpt(dims, ld, f, last, 4)
        self.dpt2 = _TorchDpt(dims, ld, f, last, 4)
        idim = ENC_DIM + DEC_DIM
        mk_lf = lambda: tn.Sequential(
            tn.Linear(idim, 4 * idim), tn.GELU(),
            tn.Linear(4 * idim, (DESC + 1) * PATCH * PATCH))
        self.lf1, self.lf2 = mk_lf(), mk_lf()

    def encode(self, img, pos):
        x = self.patch(img.permute(0, 3, 1, 2) * 2 - 1)
        B, C, h, w = x.shape
        x = x.flatten(2).transpose(1, 2)  # (B, N, C)
        for blk in self.enc:
            x = blk(x, pos)
        return self.enc_norm(x), (h, w)

    def forward(self, img1, img2, pos):
        t1, hw = self.encode(img1, pos)
        t2, _ = self.encode(img2, pos)
        x1, x2 = self.embed(t1), self.embed(t2)
        outs1, outs2 = [t1], [t2]
        for b1, b2 in zip(self.dec1, self.dec2):
            x1, x2 = (b1(x1, x2, pos, pos), b2(x2, x1, pos, pos))
            outs1.append(x1)
            outs2.append(x2)
        outs1[-1] = self.dec_norm(outs1[-1])
        outs2[-1] = self.dec_norm(outs2[-1])

        def head(outs, dpt, lf, enc_out):
            toks = [outs[h] for h in self.hooks]
            fmap = dpt(toks, hw)  # (B, 4, H, W)
            xyz = fmap[:, :3]
            d = xyz.norm(dim=1, keepdim=True)
            pts = xyz / d.clip(min=1e-8) * torch.expm1(d)
            conf = 1.0 + fmap[:, 3:4].exp()
            cat = torch.cat([enc_out, outs[-1]], dim=-1)
            x = lf(cat)
            B, N, C = x.shape
            h, w = hw
            x = x.transpose(-1, -2).view(B, C, h, w)
            x = tF.pixel_shuffle(x, PATCH)  # (B, DESC+1, H, W)
            desc = tF.normalize(x[:, :DESC], dim=1, eps=1e-8)
            desc_conf = x[:, DESC:].exp()
            return pts, conf, desc, desc_conf

        o1 = head(outs1, self.dpt1, self.lf1, t1)
        o2 = head(outs2, self.dpt2, self.lf2, t2)
        return o1, o2


def _sd(model):
    """Build the released-checkpoint key layout from the torch replica."""
    sd = {}

    def put(prefix, mod):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()

    sd["patch_embed.proj.weight"] = model.patch.weight.detach().numpy()
    sd["patch_embed.proj.bias"] = model.patch.bias.detach().numpy()
    sd["enc_norm.weight"] = model.enc_norm.weight.detach().numpy()
    sd["enc_norm.bias"] = model.enc_norm.bias.detach().numpy()
    sd["decoder_embed.weight"] = model.embed.weight.detach().numpy()
    sd["decoder_embed.bias"] = model.embed.bias.detach().numpy()
    sd["dec_norm.weight"] = model.dec_norm.weight.detach().numpy()
    sd["dec_norm.bias"] = model.dec_norm.bias.detach().numpy()

    def block_sd(prefix, blk, cross):
        put(f"{prefix}.norm1", blk.norm1)
        put(f"{prefix}.attn.qkv", blk.attn.qkv)
        put(f"{prefix}.attn.proj", blk.attn.proj)
        put(f"{prefix}.norm2", blk.norm2)
        put(f"{prefix}.mlp.fc1", blk.fc1)
        put(f"{prefix}.mlp.fc2", blk.fc2)
        if cross:
            put(f"{prefix}.norm3", blk.norm3)
            put(f"{prefix}.norm_y", blk.norm_y)
            for p in ("projq", "projk", "projv", "proj"):
                put(f"{prefix}.cross_attn.{p}",
                    getattr(blk.cross_attn, p))

    for i in range(DEPTH):
        block_sd(f"enc_blocks.{i}", model.enc[i], False)
        block_sd(f"dec_blocks.{i}", model.dec1[i], True)
        block_sd(f"dec_blocks2.{i}", model.dec2[i], True)

    def dpt_sd(prefix, dpt, lf):
        for j, seq in enumerate(dpt.act_postprocess):
            for k, layer in enumerate(seq):
                put(f"{prefix}.dpt.act_postprocess.{j}.{k}", layer)
        for n in range(1, 5):
            sd[f"{prefix}.dpt.scratch.layer{n}_rn.weight"] = (
                dpt.layer_rn[n - 1].weight.detach().numpy())
            rf = dpt.refinenet[n - 1]
            put(f"{prefix}.dpt.scratch.refinenet{n}.out_conv", rf.out_conv)
            put(f"{prefix}.dpt.scratch.refinenet{n}.resConfUnit1.conv1",
                rf.resConfUnit1.conv1)
            put(f"{prefix}.dpt.scratch.refinenet{n}.resConfUnit1.conv2",
                rf.resConfUnit1.conv2)
            put(f"{prefix}.dpt.scratch.refinenet{n}.resConfUnit2.conv1",
                rf.resConfUnit2.conv1)
            put(f"{prefix}.dpt.scratch.refinenet{n}.resConfUnit2.conv2",
                rf.resConfUnit2.conv2)
        for k in (0, 2, 4):
            put(f"{prefix}.dpt.head.{k}", dpt.head[k])
        put(f"{prefix}.head_local_features.fc1", lf[0])
        put(f"{prefix}.head_local_features.fc2", lf[2])

    dpt_sd("downstream_head1", model.dpt1, model.lf1)
    dpt_sd("downstream_head2", model.dpt2, model.lf2)
    return sd


def test_full_model_matches_torch_replica():
    torch.manual_seed(0)
    ref = TorchMast3r().eval()
    # tame random-init activations (exp/expm1 blow up otherwise)
    with torch.no_grad():
        for p in ref.parameters():
            p.mul_(0.3)
    sd = _sd(ref)

    flat = convert_state_dict(sd, enc_depth=DEPTH, dec_depth=DEPTH)
    params = {"params": unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})}

    cfg = Mast3rConfig(enc_dim=ENC_DIM, enc_depth=DEPTH, enc_heads=HEADS,
                       dec_dim=DEC_DIM, dec_depth=DEPTH, dec_heads=HEADS,
                       desc_dim=DESC, head="catmlp+dpt")
    model = Mast3rModel(cfg)

    H = W = 32
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    o1, o2 = model.apply(params, jnp.asarray(a), jnp.asarray(b))

    h, w = H // PATCH, W // PATCH
    ys = np.repeat(np.arange(h), w)
    xs = np.tile(np.arange(w), h)
    pos = torch.from_numpy(np.stack([ys, xs], 1).astype(np.int64))[None]
    (p1, c1, d1, dc1), (p2, c2, d2, dc2) = ref(
        torch.from_numpy(a), torch.from_numpy(b), pos)

    def chk(got, want_nchw, atol):
        want = want_nchw.permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=atol,
                                   rtol=1e-3)

    chk(o1["pts3d"], p1, 2e-4)
    chk(o1["conf"], c1, 2e-4)
    chk(o1["desc"], d1, 2e-4)
    chk(o1["desc_conf"], dc1, 2e-4)
    chk(o2["pts3d"], p2, 2e-4)
    chk(o2["conf"], c2, 2e-4)
