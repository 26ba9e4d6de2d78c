"""Full GMFlow-scale2-regrefine model vs a torch replica of the upstream
unimatch composition: CNN encoder + trident pyramid, 2-scale loop
(per-window sine pos-emb, swin-window LoFTR transformer, global/local
correlation softmax, self-attn flow propagation, align-corners inter-scale
upsampling + warping), RAFT regression refinement, convex upsampling —
with weights routed through models/unimatch/convert.py."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn
import torch.nn.functional as tF

import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from gflow_tpu.models.unimatch.gmflow import GMFlow, GMFlowConfig
from gflow_tpu.models.unimatch import convert as uconvert
from tests.test_gmflow_torch_parity import (
    TTransformerLayer, TResBlock, TMotionEncoder, TSepConvGRU,
    _t_split, _t_merge, _t_layer_shift)

FC = 32          # feature channels (tiny)
NLAYERS = 2
REFINE = 2
UPF = 4


class TorchCNNEncoder(tn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tn.Conv2d(3, 64, 7, 2, 3)
        self.norm1 = tn.InstanceNorm2d(64)
        self.layer1 = tn.ModuleList([TResBlock(64, 64, 1),
                                     TResBlock(64, 64, 1)])
        self.layer2 = tn.ModuleList([TResBlock(64, 96, 2),
                                     TResBlock(96, 96, 1)])
        self.layer3 = tn.ModuleList([TResBlock(96, 128, 1),
                                     TResBlock(128, 128, 1)])
        self.conv2 = tn.Conv2d(128, FC, 1)
        self.trident = tn.Conv2d(FC, FC, 3, 1, 1)

    def forward(self, x):
        x = torch.relu(self.norm1(self.conv1(x)))
        for blk in (*self.layer1, *self.layer2, *self.layer3):
            x = blk(x)
        x = self.conv2(x)
        f4 = self.trident(x)
        f8 = tF.conv2d(x, self.trident.weight, self.trident.bias,
                       stride=2, padding=1)
        return [f8, f4]  # coarse first


def _t_pos_embed(h, w, c):
    npf = c // 2
    mask = torch.ones(1, h, w)
    y = mask.cumsum(1) / (h + 1e-6) * (2 * np.pi)
    x = mask.cumsum(2) / (w + 1e-6) * (2 * np.pi)
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / npf)
    px = x[..., None] / dim_t
    py = y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()),
                     dim=4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()),
                     dim=4).flatten(3)
    return torch.cat((py, px), dim=3)  # (1, h, w, c)


def _t_coords(h, w):
    ys, xs = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing="ij")
    return torch.stack([xs, ys], -1)[None]  # (1, h, w, 2) xy


def _t_warp(img_nhwc, coords):
    B, H, W, C = img_nhwc.shape
    grid = torch.stack([2 * coords[..., 0] / (W - 1) - 1,
                        2 * coords[..., 1] / (H - 1) - 1], -1)
    out = tF.grid_sample(img_nhwc.permute(0, 3, 1, 2), grid,
                         mode="bilinear", padding_mode="zeros",
                         align_corners=True)
    return out.permute(0, 2, 3, 1)


class TorchGMFlow(tn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchCNNEncoder()
        # upstream: self_attn sublayers are no_ffn (no mlp/norm2 weights)
        self.self_attn = tn.ModuleList(
            [TTransformerLayer(FC, no_ffn=True) for _ in range(NLAYERS)])
        self.cross_attn = tn.ModuleList(
            [TTransformerLayer(FC) for _ in range(NLAYERS)])
        self.q_proj = tn.Linear(FC, FC)
        self.k_proj = tn.Linear(FC, FC)
        self.refine_proj = tn.Conv2d(FC, 256, 1)
        self.encoder = TMotionEncoder(81)
        self.gru = TSepConvGRU()
        self.fh1 = tn.Conv2d(128, 256, 3, 1, 1)
        self.fh2 = tn.Conv2d(256, 2, 3, 1, 1)
        self.mask0 = tn.Conv2d(128, 256, 3, 1, 1)
        self.mask2 = tn.Conv2d(256, UPF * UPF * 9, 1)

    def transformer(self, f0, f1, splits):
        for i, (sa, ca) in enumerate(zip(self.self_attn, self.cross_attn)):
            # upstream: with_shift for odd layer indices when splits > 1
            shift = splits > 1 and i % 2 == 1
            n0 = _t_layer_shift(
                ca, _t_layer_shift(sa, f0, f0, splits, shift), f1, splits,
                shift)
            n1 = _t_layer_shift(
                ca, _t_layer_shift(sa, f1, f1, splits, shift), f0, splits,
                shift)
            f0, f1 = n0, n1
        return f0, f1

    def forward(self, img0, img1, attn_splits_list=(2, 4),
                corr_radius_list=(-1, 4), prop_radius_list=(-1, 1)):
        # upstream normalize_img: ImageNet mean/std on [0, 1] inputs
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 1, 1, 3)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 1, 1, 3)
        n0 = ((img0 - mean) / std).permute(0, 3, 1, 2)
        n1 = ((img1 - mean) / std).permute(0, 3, 1, 2)
        feats0 = [f.permute(0, 2, 3, 1) for f in self.backbone(n0)]
        feats1 = [f.permute(0, 2, 3, 1) for f in self.backbone(n1)]
        flow = None
        for s in range(2):
            f0, f1 = feats0[s], feats1[s]
            h, w = f0.shape[1:3]
            if flow is not None:
                flow = tF.interpolate(flow.permute(0, 3, 1, 2),
                                      scale_factor=2, mode="bilinear",
                                      align_corners=True
                                      ).permute(0, 2, 3, 1) * 2.0
                f1 = _t_warp(f1, _t_coords(h, w) + flow)
            sp = attn_splits_list[s]
            pw = _t_pos_embed(h // sp, w // sp, FC)
            pos = pw.repeat(1, sp, sp, 1)
            f0t, f1t = self.transformer(f0 + pos, f1 + pos, sp)

            r = corr_radius_list[s]
            C = FC
            if r < 0:
                c0 = f0t.reshape(1, h * w, C)
                c1 = f1t.reshape(1, h * w, C)
                corr = c0 @ c1.transpose(-2, -1) / C ** 0.5
                prob = corr.softmax(dim=-1)
                grid = _t_coords(h, w).reshape(1, h * w, 2)
                delta = (prob @ grid - grid).reshape(1, h, w, 2)
            else:
                cs, os_, valid = [], [], []
                xs = torch.arange(w)[None, :]
                ys = torch.arange(h)[:, None]
                pad = tF.pad(f1t.permute(0, 3, 1, 2), (r, r, r, r)
                             ).permute(0, 2, 3, 1)
                for dy in range(-r, r + 1):
                    for dx in range(-r, r + 1):
                        cs.append((f0t * pad[:, r+dy:r+dy+h, r+dx:r+dx+w]
                                   ).sum(-1) / C ** 0.5)
                        os_.append((dx, dy))
                        valid.append(((xs+dx >= 0) & (xs+dx <= w-1)
                                      & (ys+dy >= 0) & (ys+dy <= h-1))
                                     .expand(h, w))
                corr = torch.stack(cs, -1)
                vmask = torch.stack(valid, -1)[None]
                corr = torch.where(vmask, corr, torch.tensor(-1e9))
                prob = corr.softmax(dim=-1)
                off = torch.tensor(os_, dtype=torch.float32)
                delta = prob @ off
            flow = delta if flow is None else flow + delta

            # SelfAttnPropagation
            pr = prop_radius_list[s]
            q = self.q_proj(f0t)
            k = self.k_proj(f0t)
            if pr < 0:
                qf = q.reshape(1, h * w, C)
                kf = k.reshape(1, h * w, C)
                att = (qf @ kf.transpose(-2, -1) / C ** 0.5).softmax(-1)
                flow = (att @ flow.reshape(1, h * w, 2)).reshape(1, h, w, 2)
            else:
                padk = tF.pad(k.permute(0, 3, 1, 2), (pr,)*4
                              ).permute(0, 2, 3, 1)
                padv = tF.pad(flow.permute(0, 3, 1, 2), (pr,)*4
                              ).permute(0, 2, 3, 1)
                ks_, vs_ = [], []
                for dy in range(-pr, pr + 1):
                    for dx in range(-pr, pr + 1):
                        ks_.append(padk[:, pr+dy:pr+dy+h, pr+dx:pr+dx+w])
                        vs_.append(padv[:, pr+dy:pr+dy+h, pr+dx:pr+dx+w])
                kk = torch.stack(ks_, 3)
                vv = torch.stack(vs_, 3)
                att = ((q[..., None, :] * kk).sum(-1) / C ** 0.5).softmax(-1)
                flow = (att[..., None] * vv).sum(3)

        # RAFT refinement at the finest scale — upstream correlates the
        # BACKBONE features (feature0_ori/feature1_ori, captured before
        # warp/pos-embed/transformer) at x + offset + flow(x) per tap
        # (local_correlation_with_flow via grid_sample)
        f0_ori, f1_ori = feats0[-1], feats1[-1]
        proj = self.refine_proj(f0t.permute(0, 3, 1, 2))
        net, inp = torch.chunk(proj, 2, dim=1)
        net, inp = torch.tanh(net), torch.relu(inp)
        up_mask = None
        rr = 4
        offs = torch.tensor(
            [(dx, dy) for dy in range(-rr, rr + 1)
             for dx in range(-rr, rr + 1)], dtype=torch.float32)
        b = f0_ori.shape[0]
        base = _t_coords(h, w).reshape(1, h * w, 2).repeat(b, 1, 1)
        for _ in range(REFINE):
            flow = flow.detach()
            sample = (base.unsqueeze(-2) + offs.view(1, 1, -1, 2)
                      + flow.reshape(b, h * w, 1, 2))
            sgrid = torch.stack([2 * sample[..., 0] / (w - 1) - 1,
                                 2 * sample[..., 1] / (h - 1) - 1], -1)
            wf = tF.grid_sample(f1_ori.permute(0, 3, 1, 2), sgrid,
                                mode="bilinear", padding_mode="zeros",
                                align_corners=True).permute(0, 2, 1, 3)
            corr = (f0_ori.reshape(b, h * w, 1, FC) @ wf).reshape(
                b, h, w, offs.shape[0]) / FC ** 0.5
            corr = corr.permute(0, 3, 1, 2)
            m = self.encoder(flow.permute(0, 3, 1, 2), corr)
            net = self.gru(net, torch.cat([inp, m], dim=1))
            dflow = self.fh2(torch.relu(self.fh1(net)))
            up_mask = self.mask2(torch.relu(self.mask0(net)))
            flow = flow + dflow.permute(0, 2, 3, 1)

        # convex upsampling
        b = flow.shape[0]
        mask = up_mask.view(b, 1, 9, UPF, UPF, h, w).softmax(dim=2)
        up = tF.unfold(UPF * flow.permute(0, 3, 1, 2), [3, 3], padding=1)
        up = up.view(b, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, UPF*h, UPF*w)
        return up.permute(0, 2, 3, 1)


def _sd(m):
    """Released-checkpoint key layout from the torch replica."""
    sd = {}

    def put(prefix, mod):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.numpy()

    bb = m.backbone
    put("backbone.conv1", bb.conv1)
    for li, layer in (("layer1", bb.layer1), ("layer2", bb.layer2),
                      ("layer3", bb.layer3)):
        for j, blk in enumerate(layer):
            put(f"backbone.{li}.{j}.conv1", blk.conv1)
            put(f"backbone.{li}.{j}.conv2", blk.conv2)
            if blk.downsample is not None:
                sd[f"backbone.{li}.{j}.downsample.0.weight"] = (
                    blk.downsample.weight.detach().numpy())
                sd[f"backbone.{li}.{j}.downsample.0.bias"] = (
                    blk.downsample.bias.detach().numpy())
    put("backbone.conv2", bb.conv2)
    sd["backbone.trident_conv.weight"] = bb.trident.weight.detach().numpy()
    sd["backbone.trident_conv.bias"] = bb.trident.bias.detach().numpy()

    def layer_sd(prefix, lyr):
        for p in ("q_proj", "k_proj", "v_proj", "merge"):
            sd[f"{prefix}.{p}.weight"] = getattr(
                lyr, p).weight.detach().numpy()
        put(f"{prefix}.norm1", lyr.norm1)
        if not lyr.no_ffn:  # self_attn carries no mlp/norm2 upstream
            put(f"{prefix}.norm2", lyr.norm2)
            sd[f"{prefix}.mlp.0.weight"] = lyr.mlp[0].weight.detach().numpy()
            sd[f"{prefix}.mlp.2.weight"] = lyr.mlp[2].weight.detach().numpy()

    for i in range(NLAYERS):
        layer_sd(f"transformer.layers.{i}.self_attn", m.self_attn[i])
        layer_sd(f"transformer.layers.{i}.cross_attn_ffn", m.cross_attn[i])

    sd["feature_flow_attn.q_proj.weight"] = m.q_proj.weight.detach().numpy()
    sd["feature_flow_attn.q_proj.bias"] = m.q_proj.bias.detach().numpy()
    sd["feature_flow_attn.k_proj.weight"] = m.k_proj.weight.detach().numpy()
    sd["feature_flow_attn.k_proj.bias"] = m.k_proj.bias.detach().numpy()

    put("refine_proj", m.refine_proj)
    put("refine.encoder.convc1", m.encoder.convc1)
    put("refine.encoder.convc2", m.encoder.convc2)
    put("refine.encoder.convf1", m.encoder.convf1)
    put("refine.encoder.convf2", m.encoder.convf2)
    put("refine.encoder.conv", m.encoder.conv)
    for p in ("convz1", "convr1", "convq1", "convz2", "convr2", "convq2"):
        put(f"refine.gru.{p}", getattr(m.gru, p))
    put("refine.flow_head.conv1", m.fh1)
    put("refine.flow_head.conv2", m.fh2)
    put("refine.mask.0", m.mask0)
    put("refine.mask.2", m.mask2)
    return sd


def test_full_gmflow_matches_torch_replica():
    torch.manual_seed(0)
    ref = TorchGMFlow().eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.mul_(0.5)
    sd = _sd(ref)

    cfg = GMFlowConfig(feature_channels=FC, num_transformer_layers=NLAYERS,
                       num_reg_refine=REFINE, attn_splits_list=(2, 4),
                       corr_radius_list=(-1, 4), prop_radius_list=(-1, 1),
                       upsample_factor=UPF)
    flat = uconvert.convert_state_dict(sd, num_layers=NLAYERS)
    params = {"params": unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})}

    rng = np.random.default_rng(2)
    H = W = 64
    a = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)

    got = GMFlow(cfg).apply(params, jnp.asarray(a), jnp.asarray(b))
    want = ref(torch.from_numpy(a), torch.from_numpy(b)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)
