"""GMFlow/UniMatch numerics vs torch replicas of the released semantics:
RAFT convex upsampling channel order, DETR sine embedding, masked local
correlation, grid_sample zero-padding, the LoFTR-form transformer layer,
and the instance-normed residual block. Shape tests pass with ANY of these
wrong; converted released weights only work if all match torch exactly."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn
import torch.nn.functional as tF

import jax.numpy as jnp

from gflow_tpu.models.unimatch.gmflow import (
    ResidualBlock, TransformerLayer, _bilinear_sample,
    local_correlation_softmax, position_embedding_sine,
    upsample_flow_with_mask)


def test_upsample_mask_matches_raft_unfold():
    rng = np.random.default_rng(0)
    B, H, W, f = 2, 4, 5, 4
    flow = rng.normal(size=(B, H, W, 2)).astype(np.float32)
    mask = rng.normal(size=(B, H, W, 9 * f * f)).astype(np.float32)

    got = upsample_flow_with_mask(jnp.asarray(flow), jnp.asarray(mask), f)

    # torch reference (unimatch utils.upsample_flow_with_mask)
    tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    tmask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    m = tmask.view(B, 1, 9, f, f, H, W)
    m = torch.softmax(m, dim=2)
    up = tF.unfold(f * tflow, [3, 3], padding=1)
    up = up.view(B, 2, 9, 1, 1, H, W)
    up = torch.sum(m * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(B, 2, f * H, f * W)
    want = up.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_position_embedding_sine_matches_torch():
    H, W, C = 6, 8, 32
    got = np.asarray(position_embedding_sine(H, W, C))

    # torch reference (unimatch position.PositionEmbeddingSine,
    # normalize=True, scale=2*pi, temperature=10000)
    npf = C // 2
    mask = torch.ones(1, H, W)
    y_embed = mask.cumsum(1)
    x_embed = mask.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * (torch.div(dim_t, 2, rounding_mode="floor"))
                        / npf)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()),
                        dim=4).flatten(3)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()),
                        dim=4).flatten(3)
    want = torch.cat((pos_y, pos_x), dim=3)[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilinear_sample_matches_grid_sample_zeros():
    rng = np.random.default_rng(1)
    B, H, W, C = 2, 6, 7, 3
    img = rng.normal(size=(B, H, W, C)).astype(np.float32)
    coords = rng.uniform(-2, np.array([W + 1, H + 1]),
                         size=(B, 5, 4, 2)).astype(np.float32)

    got = _bilinear_sample(jnp.asarray(img), jnp.asarray(coords))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    xy = torch.from_numpy(coords)
    grid = torch.stack(
        [2 * xy[..., 0] / (W - 1) - 1, 2 * xy[..., 1] / (H - 1) - 1], -1)
    want = tF.grid_sample(t_img, grid, mode="bilinear",
                          padding_mode="zeros", align_corners=True)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_local_correlation_softmax_masks_oob():
    rng = np.random.default_rng(2)
    B, H, W, C, r = 1, 5, 6, 8, 2
    f0 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    got = np.asarray(local_correlation_softmax(
        jnp.asarray(f0), jnp.asarray(f1), r))

    # dense torch-style reference with -1e9 OOB masking
    want = np.zeros((B, H, W, 2), np.float32)
    for y in range(H):
        for x in range(W):
            cs, os_ = [], []
            for dy in range(-r, r + 1):
                for dx in range(-r, r + 1):
                    xx, yy = x + dx, y + dy
                    if 0 <= xx < W and 0 <= yy < H:
                        cs.append(np.dot(f0[0, y, x], f1[0, yy, xx])
                                  / np.sqrt(C))
                    else:
                        cs.append(-1e9)
                    os_.append((dx, dy))
            p = np.exp(cs - np.max(cs))
            p /= p.sum()
            want[0, y, x] = (p[:, None] * np.asarray(os_)).sum(0)
    np.testing.assert_allclose(got, want, atol=1e-4)


class TTransformerLayer(tn.Module):
    """upstream unimatch TransformerLayer (nhead=1, ffn_dim_expansion=4).
    no_ffn=True is the self_attn sublayer form (no mlp/norm2 — the released
    checkpoints carry none for self_attn)."""

    def __init__(self, d, no_ffn=False):
        super().__init__()
        self.q_proj = tn.Linear(d, d, bias=False)
        self.k_proj = tn.Linear(d, d, bias=False)
        self.v_proj = tn.Linear(d, d, bias=False)
        self.merge = tn.Linear(d, d, bias=False)
        self.norm1 = tn.LayerNorm(d)
        self.no_ffn = no_ffn
        if not no_ffn:
            self.mlp = tn.Sequential(
                tn.Linear(d * 2, d * 2 * 4, bias=False), tn.GELU(),
                tn.Linear(d * 2 * 4, d, bias=False))
            self.norm2 = tn.LayerNorm(d)
        self.d = d

    def forward(self, source, target):
        # single global window (attn_splits=1 path)
        q = self.q_proj(source)
        k = self.k_proj(target)
        v = self.v_proj(target)
        attn = torch.softmax(
            q @ k.transpose(-2, -1) / self.d ** 0.5, dim=-1)
        msg = self.norm1(self.merge(attn @ v))
        if self.no_ffn:
            return source + msg
        msg = self.norm2(self.mlp(torch.cat([source, msg], dim=-1)))
        return source + msg


def test_transformer_layer_matches_torch():
    torch.manual_seed(0)
    d, H, W = 16, 4, 6
    ref = TTransformerLayer(d).eval()
    lin = lambda m: {"kernel": m.weight.detach().numpy().T}
    ln = lambda m: {"scale": m.weight.detach().numpy(),
                    "bias": m.bias.detach().numpy()}
    params = {
        "q_proj": lin(ref.q_proj), "k_proj": lin(ref.k_proj),
        "v_proj": lin(ref.v_proj), "merge": lin(ref.merge),
        "norm1": ln(ref.norm1), "norm2": ln(ref.norm2),
        "mlp_0": lin(ref.mlp[0]), "mlp_2": lin(ref.mlp[2]),
    }
    rng = np.random.default_rng(3)
    src = rng.normal(size=(1, H, W, d)).astype(np.float32)
    tgt = rng.normal(size=(1, H, W, d)).astype(np.float32)
    got = TransformerLayer(d).apply(
        {"params": params}, jnp.asarray(src), jnp.asarray(tgt), 1)
    want = ref(torch.from_numpy(src.reshape(1, H * W, d)),
               torch.from_numpy(tgt.reshape(1, H * W, d)))
    want = want.detach().numpy().reshape(1, H, W, d)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


class TResBlock(tn.Module):
    def __init__(self, cin, ch, stride):
        super().__init__()
        self.conv1 = tn.Conv2d(cin, ch, 3, stride, 1)
        self.conv2 = tn.Conv2d(ch, ch, 3, 1, 1)
        self.norm1 = tn.InstanceNorm2d(ch)
        self.norm2 = tn.InstanceNorm2d(ch)
        self.downsample = (tn.Conv2d(cin, ch, 1, stride)
                           if stride != 1 or cin != ch else None)
        self.norm3 = tn.InstanceNorm2d(ch)

    def forward(self, x):
        y = torch.relu(self.norm1(self.conv1(x)))
        y = torch.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.norm3(self.downsample(x))
        return torch.relu(x + y)


def test_residual_block_matches_torch():
    torch.manual_seed(2)
    cin, ch, stride = 8, 12, 2
    ref = TResBlock(cin, ch, stride).eval()
    conv = lambda m: {"kernel": m.weight.detach().numpy().transpose(
        2, 3, 1, 0), "bias": m.bias.detach().numpy()}
    params = {"conv1": conv(ref.conv1), "conv2": conv(ref.conv2),
              "downsample": conv(ref.downsample)}
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 10, cin)).astype(np.float32)
    got = ResidualBlock(ch, stride=stride).apply(
        {"params": params}, jnp.asarray(x))
    want = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    want = want.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


class TMotionEncoder(tn.Module):
    def __init__(self, corr_ch):
        super().__init__()
        self.convc1 = tn.Conv2d(corr_ch, 256, 1)
        self.convc2 = tn.Conv2d(256, 192, 3, 1, 1)
        self.convf1 = tn.Conv2d(2, 128, 7, 1, 3)
        self.convf2 = tn.Conv2d(128, 64, 3, 1, 1)
        self.conv = tn.Conv2d(192 + 64, 126, 3, 1, 1)

    def forward(self, flow, corr):
        c = torch.relu(self.convc2(torch.relu(self.convc1(corr))))
        f = torch.relu(self.convf2(torch.relu(self.convf1(flow))))
        out = torch.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class TSepConvGRU(tn.Module):
    def __init__(self, hidden=128, inp=128 + 128):
        super().__init__()
        self.convz1 = tn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convr1 = tn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convq1 = tn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convz2 = tn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
        self.convr2 = tn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
        self.convq2 = tn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz1(hx))
        r = torch.sigmoid(self.convr1(hx))
        q = torch.tanh(self.convq1(torch.cat([r * h, x], dim=1)))
        h = (1 - z) * h + z * q
        hx = torch.cat([h, x], dim=1)
        z = torch.sigmoid(self.convz2(hx))
        r = torch.sigmoid(self.convr2(hx))
        q = torch.tanh(self.convq2(torch.cat([r * h, x], dim=1)))
        return (1 - z) * h + z * q


def _convp(m):
    return {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": m.bias.detach().numpy()}


def test_motion_encoder_matches_torch():
    from gflow_tpu.models.unimatch.gmflow import BasicMotionEncoder

    torch.manual_seed(3)
    corr_ch = 81
    ref = TMotionEncoder(corr_ch).eval()
    params = {k: _convp(getattr(ref, k))
              for k in ("convc1", "convc2", "convf1", "convf2", "conv")}
    rng = np.random.default_rng(5)
    flow = rng.normal(size=(1, 6, 8, 2)).astype(np.float32)
    corr = rng.normal(size=(1, 6, 8, corr_ch)).astype(np.float32)
    got = BasicMotionEncoder(corr_ch).apply(
        {"params": params}, jnp.asarray(flow), jnp.asarray(corr))
    want = ref(torch.from_numpy(flow).permute(0, 3, 1, 2),
               torch.from_numpy(corr).permute(0, 3, 1, 2))
    want = want.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_sepconv_gru_matches_torch():
    from gflow_tpu.models.unimatch.gmflow import SepConvGRU

    torch.manual_seed(4)
    ref = TSepConvGRU().eval()
    params = {k: _convp(getattr(ref, k))
              for k in ("convz1", "convr1", "convq1",
                        "convz2", "convr2", "convq2")}
    rng = np.random.default_rng(6)
    h = rng.normal(size=(1, 6, 8, 128)).astype(np.float32)
    x = rng.normal(size=(1, 6, 8, 256)).astype(np.float32)
    got = SepConvGRU().apply({"params": params}, jnp.asarray(h),
                             jnp.asarray(x))
    want = ref(torch.from_numpy(h).permute(0, 3, 1, 2),
               torch.from_numpy(x).permute(0, 3, 1, 2))
    want = want.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def _t_split(feature, s):
    """upstream unimatch split_feature (channel_last=True)."""
    b, h, w, c = feature.size()
    return feature.view(b, s, h // s, s, w // s, c).permute(
        0, 1, 3, 2, 4, 5).reshape(b * s * s, h // s, w // s, c)


def _t_merge(splits, s, h, w):
    b = splits.size(0) // (s * s)
    c = splits.size(-1)
    return splits.view(b, s, s, h // s, w // s, c).permute(
        0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


def _t_shift_attn_mask(h, w, s):
    """upstream unimatch generate_shift_window_attn_mask (swin)."""
    wh, ww = h // s, w // s
    sh_, sw_ = wh // 2, ww // 2
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -sh_), slice(-sh_, None)):
        for ws in (slice(0, -ww), slice(-ww, -sw_), slice(-sw_, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    mw = _t_split(img, s).reshape(-1, wh * ww)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)


def _t_layer_shift(layer, src, tgt, splits, with_shift):
    """upstream TransformerLayer forward with the swin split-window path
    (single_head_split_window_attention: roll by half a window, mask
    cross-boundary attention, roll back)."""
    B, H, W, d = src.shape
    q, k, v = layer.q_proj(src), layer.k_proj(tgt), layer.v_proj(tgt)
    shifted = with_shift and splits > 1
    if shifted:
        sh_, sw_ = (H // splits) // 2, (W // splits) // 2
        q = torch.roll(q, shifts=(-sh_, -sw_), dims=(1, 2))
        k = torch.roll(k, shifts=(-sh_, -sw_), dims=(1, 2))
        v = torch.roll(v, shifts=(-sh_, -sw_), dims=(1, 2))
    qs = _t_split(q, splits).flatten(1, 2)
    ks = _t_split(k, splits).flatten(1, 2)
    vs = _t_split(v, splits).flatten(1, 2)
    scores = qs @ ks.transpose(-2, -1) / d ** 0.5
    if shifted:
        scores = scores + _t_shift_attn_mask(H, W, splits).repeat(B, 1, 1)
    attn = torch.softmax(scores, dim=-1)
    msg = (attn @ vs).view(B * splits * splits, H // splits, W // splits, d)
    msg = _t_merge(msg, splits, H, W)
    if shifted:
        msg = torch.roll(msg, shifts=(sh_, sw_), dims=(1, 2))
    msg = layer.norm1(layer.merge(msg))
    if layer.no_ffn:
        return src + msg
    msg = layer.norm2(layer.mlp(torch.cat([src, msg], dim=-1)))
    return src + msg


@pytest.mark.parametrize("no_ffn", [False, True])
def test_transformer_layer_shifted_window_matches_torch(no_ffn):
    """with_shift=True path (odd layers when attn_splits > 1): roll by half
    a window + swin cross-boundary mask + roll back, with and without the
    FFN (self_attn is no_ffn upstream)."""
    from gflow_tpu.models.unimatch.gmflow import TransformerLayer as JLayer

    torch.manual_seed(6)
    d, H, W, s = 16, 8, 12, 2
    ref = TTransformerLayer(d, no_ffn=no_ffn).eval()
    lin = lambda m: {"kernel": m.weight.detach().numpy().T}
    ln = lambda m: {"scale": m.weight.detach().numpy(),
                    "bias": m.bias.detach().numpy()}
    params = {
        "q_proj": lin(ref.q_proj), "k_proj": lin(ref.k_proj),
        "v_proj": lin(ref.v_proj), "merge": lin(ref.merge),
        "norm1": ln(ref.norm1),
    }
    if not no_ffn:
        params.update({"norm2": ln(ref.norm2), "mlp_0": lin(ref.mlp[0]),
                       "mlp_2": lin(ref.mlp[2])})
    rng = np.random.default_rng(8)
    src = rng.normal(size=(2, H, W, d)).astype(np.float32)
    tgt = rng.normal(size=(2, H, W, d)).astype(np.float32)
    got = JLayer(d, no_ffn=no_ffn).apply(
        {"params": params}, jnp.asarray(src), jnp.asarray(tgt), s,
        with_shift=True)
    want = _t_layer_shift(ref, torch.from_numpy(src), torch.from_numpy(tgt),
                          s, True).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("flow_kind", ["small", "huge_oob", "integer"])
def test_local_correlation_with_flow_matches_upstream_grid_sample(flow_kind):
    """Refinement correlation: upstream samples feature1 at
    x + offset + flow(x) per tap via grid_sample (NOT warp-then-shift).
    The TPU patch-gather formulation must stay exact for every padding
    regime: small fractional flows, flows throwing whole windows far out
    of bounds (the clipped-start fully-in-pad path), and exact-integer
    flows (frac = 0 corner weights)."""
    from gflow_tpu.models.unimatch.gmflow import local_correlation_with_flow

    rng = np.random.default_rng(9)
    B, H, W, C, r = 2, 6, 7, 8, 2
    f0 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f1 = rng.normal(size=(B, H, W, C)).astype(np.float32)
    if flow_kind == "small":
        flow = rng.normal(scale=1.5, size=(B, H, W, 2)).astype(np.float32)
    elif flow_kind == "huge_oob":
        flow = rng.normal(scale=40.0, size=(B, H, W, 2)).astype(np.float32)
    else:
        flow = rng.integers(-4, 5, size=(B, H, W, 2)).astype(np.float32)

    got = np.asarray(local_correlation_with_flow(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(flow), r))

    # upstream unimatch local_correlation_with_flow (matching.py)
    tf1 = torch.from_numpy(f1).permute(0, 3, 1, 2)
    ys, xs = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                            torch.arange(W, dtype=torch.float32),
                            indexing="ij")
    coords = torch.stack([xs, ys], -1).reshape(1, H * W, 2).repeat(B, 1, 1)
    offs = torch.tensor(
        [(dx, dy) for dy in range(-r, r + 1) for dx in range(-r, r + 1)],
        dtype=torch.float32)
    sample = (coords.unsqueeze(-2) + offs.view(1, 1, -1, 2)
              + torch.from_numpy(flow).reshape(B, H * W, 1, 2))
    grid = torch.stack([2 * sample[..., 0] / (W - 1) - 1,
                        2 * sample[..., 1] / (H - 1) - 1], -1)
    wf = tF.grid_sample(tf1, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=True).permute(0, 2, 1, 3)
    f0v = torch.from_numpy(f0).reshape(B, H * W, 1, C)
    want = (f0v @ wf).reshape(B, H, W, offs.shape[0]).numpy() / np.sqrt(C)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_transformer_layer_window_split_matches_torch():
    """splits=2 path: swin-style window attention must use upstream's
    window enumeration (split_feature/merge_splits ordering)."""
    torch.manual_seed(5)
    d, H, W, s = 16, 8, 12, 2
    ref = TTransformerLayer(d).eval()
    lin = lambda m: {"kernel": m.weight.detach().numpy().T}
    ln = lambda m: {"scale": m.weight.detach().numpy(),
                    "bias": m.bias.detach().numpy()}
    params = {
        "q_proj": lin(ref.q_proj), "k_proj": lin(ref.k_proj),
        "v_proj": lin(ref.v_proj), "merge": lin(ref.merge),
        "norm1": ln(ref.norm1), "norm2": ln(ref.norm2),
        "mlp_0": lin(ref.mlp[0]), "mlp_2": lin(ref.mlp[2]),
    }
    rng = np.random.default_rng(7)
    src = rng.normal(size=(1, H, W, d)).astype(np.float32)
    tgt = rng.normal(size=(1, H, W, d)).astype(np.float32)
    got = TransformerLayer(d).apply(
        {"params": params}, jnp.asarray(src), jnp.asarray(tgt), s)

    # torch reference with upstream windowing around the same layer math
    ts, tt = torch.from_numpy(src), torch.from_numpy(tgt)
    q = ref.q_proj(ts)
    k = ref.k_proj(tt)
    v = ref.v_proj(tt)
    qs = _t_split(q, s).flatten(1, 2)
    ks = _t_split(k, s).flatten(1, 2)
    vs = _t_split(v, s).flatten(1, 2)
    attn = torch.softmax(qs @ ks.transpose(-2, -1) / d ** 0.5, dim=-1)
    msg = (attn @ vs).view(s * s, H // s, W // s, d)
    msg = _t_merge(msg, s, H, W)
    msg = ref.norm1(ref.merge(msg))
    msg = ref.norm2(ref.mlp(torch.cat([ts, msg], dim=-1)))
    want = (ts + msg).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)
