"""GMFlow / UniMatch optical-flow network (JAX/flax) — the TPU replacement
for the UniMatch GMFlow-scale2-regrefine6 prior generator invoked by the
reference's prep pipeline (scripts/flow_unimatch.sh:48-62, consumed at
gflow/fit_video.py:85-88,247).

The module tree mirrors the released checkpoint's parameter layout
(autonomousvision/unimatch naming) so convert.py is a mechanical
rename+transpose:

  backbone.conv1 (7x7/2, paramless instance norms), layer{1,2,3}.{0,1}
  residual blocks (+1x1 downsample convs), conv2 (1x1), trident_conv
  (weight-shared 3x3 applied at strides 1 and 2 -> the 1/4 and 1/8
  pyramid for scale2 models);
  transformer.layers.{i}.{self_attn,cross_attn_ffn} LoFTR-style layers
  (q/k/v/merge linear; self_attn is no_ffn: message = norm1(merge(att));
  cross_attn_ffn adds norm2(mlp(cat(source, message))); both added back to
  source), swin window splits with shifted windows + attention mask on odd
  layers, per-window sine position embedding;
  parameter-free global/local correlation softmax matching;
  feature_flow_attn (SelfAttnPropagation, learned q/k projections,
  flow as value);
  upsampler (conv-relu-conv over cat(flow, feature) -> 9-way convex mask);
  refine_proj + refine (RAFT BasicUpdateBlock: BasicMotionEncoder,
  SepConvGRU, FlowHead, learned upsampling mask).

GELU is exact-erf, LayerNorm eps 1e-5 (torch defaults).
Pretrained UniMatch weights convert with convert.py (this environment
ships none — the prep CLI gates on a checkpoint path and the tests
exercise convert->load->apply with a synthetic released-layout state
dict, plus shapes/compile/trainability with random weights).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class GMFlowConfig:
    feature_channels: int = 128
    num_scales: int = 2                 # 1/8 + 1/4
    upsample_factor: int = 4            # at the finest scale
    num_transformer_layers: int = 6
    num_heads: int = 1
    attn_splits_list: tuple = (2, 8)
    corr_radius_list: tuple = (-1, 4)   # -1 = global
    prop_radius_list: tuple = (-1, 1)
    num_reg_refine: int = 6
    padding_factor: int = 32


def _gelu(x):
    return nn.gelu(x, approximate=False)


_LN = {"epsilon": 1e-5}  # torch nn.LayerNorm default


# ---------------------------------------------------------------------------
# Encoder (RAFT-style residual CNN + trident multi-stride output)
# ---------------------------------------------------------------------------


class ResidualBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        inorm = lambda name: nn.GroupNorm(num_groups=None, group_size=1,
                                          use_scale=False, use_bias=False,
                                          epsilon=1e-5,  # torch IN default
                                          name=name)
        # explicit symmetric padding: flax 'SAME' pads asymmetrically for
        # strided convs on even inputs — torch uses padding=1 both sides
        y = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, name="conv1")(x)
        y = nn.relu(inorm("norm1")(y))
        y = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(inorm("norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride, self.stride),
                        padding="VALID", name="downsample")(x)
            x = inorm("norm3")(x)
        return nn.relu(x + y)


class TridentConv(nn.Module):
    """Weight-shared 3x3 conv applied at multiple strides (upstream
    MultiScaleTridentConv)."""

    ch: int

    @nn.compact
    def __call__(self, x, stride: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.ch))
        bias = self.param("bias", nn.initializers.zeros, (self.ch,))
        y = jax.lax.conv_general_dilated(
            x, kernel, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class CNNEncoder(nn.Module):
    """Image -> [coarsest..finest] feature pyramid. For num_scales=2 the
    base runs to 1/4 and a weight-shared trident conv emits 1/4 and 1/8
    (upstream MultiScaleTridentConv)."""

    out_ch: int = 128
    num_scales: int = 2

    @nn.compact
    def __call__(self, x):
        inorm = nn.GroupNorm(num_groups=None, group_size=1, use_scale=False,
                             use_bias=False, epsilon=1e-5, name="norm1")
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                    name="conv1")(x)  # 1/2 (torch padding=3, symmetric)
        x = nn.relu(inorm(x))
        x = ResidualBlock(64, name="layer1_0")(x)
        x = ResidualBlock(64, name="layer1_1")(x)
        x = ResidualBlock(96, stride=2, name="layer2_0")(x)   # 1/4
        x = ResidualBlock(96, name="layer2_1")(x)
        s3 = 1 if self.num_scales > 1 else 2
        x = ResidualBlock(128, stride=s3, name="layer3_0")(x)
        x = ResidualBlock(128, name="layer3_1")(x)
        x = nn.Conv(self.out_ch, (1, 1), name="conv2")(x)
        if self.num_scales == 1:
            return [x]  # 1/8
        trident = TridentConv(self.out_ch, name="trident_conv")
        f4 = trident(x, 1)  # 1/4
        f8 = trident(x, 2)  # 1/8 (shared weights, stride 2)
        return [f8, f4]


# ---------------------------------------------------------------------------
# Position embedding (parameter-free sine, DETR-style as in unimatch)
# ---------------------------------------------------------------------------


def position_embedding_sine(H, W, dim):
    """(H, W, dim) DETR-style normalized sine embedding (num_pos_feats =
    dim/2 per axis)."""
    npf = dim // 2
    ys = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None]
    xs = jnp.arange(1, W + 1, dtype=jnp.float32)[None, :]
    eps, scale = 1e-6, 2 * math.pi
    ys = ys / (H + eps) * scale
    xs = xs / (W + eps) * scale
    dim_t = 10000.0 ** (2 * (jnp.arange(npf) // 2) / npf)
    py = ys[..., None] / dim_t        # (H, 1, npf)
    px = xs[..., None] / dim_t        # (1, W, npf)
    py = jnp.broadcast_to(py, (H, W, npf))
    px = jnp.broadcast_to(px, (H, W, npf))

    def interleave(p):
        sin = jnp.sin(p[..., 0::2])
        cos = jnp.cos(p[..., 1::2])
        return jnp.stack([sin, cos], axis=-1).reshape(H, W, -1)

    return jnp.concatenate([interleave(py), interleave(px)], axis=-1)


# ---------------------------------------------------------------------------
# Split (swin-style) LoFTR-form transformer
# ---------------------------------------------------------------------------


def _split_windows(x, splits):
    """(B, H, W, C) -> (B*splits^2, H/s * W/s, C)."""
    B, H, W, C = x.shape
    s = splits
    x = x.reshape(B, s, H // s, s, W // s, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * s * s, (H // s) * (W // s), C)


def _merge_windows(x, splits, H, W):
    B = x.shape[0] // (splits * splits)
    s = splits
    x = x.reshape(B, s, s, H // s, W // s, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def shift_window_attn_mask(H: int, W: int, splits: int):
    """(splits^2, L, L) additive attention mask for swin shifted windows
    (upstream unimatch generate_shift_window_attn_mask): after rolling by
    half a window, lanes that came from different pre-roll regions must not
    attend to each other (-100 additive). Static — built host-side."""
    import numpy as np

    s = splits
    wh, ww = H // s, W // s
    sh, sw = wh // 2, ww // 2
    img = np.zeros((H, W), np.float32)
    cnt = 0
    for hs in (slice(0, H - wh), slice(H - wh, H - sh), slice(H - sh, H)):
        for ws_ in (slice(0, W - ww), slice(W - ww, W - sw),
                    slice(W - sw, W)):
            img[hs, ws_] = cnt
            cnt += 1
    win = img.reshape(s, wh, s, ww).transpose(0, 2, 1, 3).reshape(
        s * s, wh * ww)
    diff = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


class TransformerLayer(nn.Module):
    """LoFTR-style message layer (upstream unimatch TransformerLayer):
    attention message -> merge -> norm1 [-> mlp(cat(source, message)) ->
    norm2 if not no_ffn] -> residual add. Upstream builds self-attention
    sublayers with no_ffn=True — only cross_attn_ffn carries the FFN (the
    released checkpoints have no self_attn.mlp/norm2 weights).

    with_shift (odd layers when splits > 1) rolls q/k/v by half a window
    before splitting, masks cross-boundary attention, and rolls the merged
    message back (upstream single_head_split_window_attention)."""

    dim: int
    no_ffn: bool = False

    @nn.compact
    def __call__(self, source, target, splits, with_shift: bool = False):
        H, W = source.shape[1:3]
        q = nn.Dense(self.dim, use_bias=False, name="q_proj")(source)
        k = nn.Dense(self.dim, use_bias=False, name="k_proj")(target)
        v = nn.Dense(self.dim, use_bias=False, name="v_proj")(target)
        shifted = with_shift and splits > 1
        if shifted:
            sh, sw = (H // splits) // 2, (W // splits) // 2
            q = jnp.roll(q, (-sh, -sw), axis=(1, 2))
            k = jnp.roll(k, (-sh, -sw), axis=(1, 2))
            v = jnp.roll(v, (-sh, -sw), axis=(1, 2))
        qs = _split_windows(q, splits)
        ks = _split_windows(k, splits)
        vs = _split_windows(v, splits)
        attn = jnp.einsum("bqc,bkc->bqk", qs, ks) / jnp.sqrt(self.dim)
        if shifted:
            B = source.shape[0]
            L = qs.shape[1]
            mask = shift_window_attn_mask(H, W, splits)
            attn = (attn.reshape(B, splits * splits, L, L)
                    + mask[None]).reshape(B * splits * splits, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        msg = jnp.einsum("bqk,bkc->bqc", attn, vs)
        msg = _merge_windows(msg, splits, H, W)
        if shifted:
            msg = jnp.roll(msg, (sh, sw), axis=(1, 2))
        msg = nn.Dense(self.dim, use_bias=False, name="merge")(msg)
        msg = nn.LayerNorm(name="norm1", **_LN)(msg)
        if self.no_ffn:
            return source + msg
        h = jnp.concatenate([source, msg], axis=-1)
        h = nn.Dense(self.dim * 2 * 4, use_bias=False, name="mlp_0")(h)
        h = nn.Dense(self.dim, use_bias=False, name="mlp_2")(_gelu(h))
        msg = nn.LayerNorm(name="norm2", **_LN)(h)
        return source + msg


class TransformerBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, source, target, splits, with_shift: bool = False):
        source = TransformerLayer(self.dim, no_ffn=True, name="self_attn")(
            source, source, splits, with_shift)
        source = TransformerLayer(self.dim, name="cross_attn_ffn")(
            source, target, splits, with_shift)
        return source


class FeatureTransformer(nn.Module):
    dim: int
    num_layers: int

    @nn.compact
    def __call__(self, feat0, feat1, splits):
        for i in range(self.num_layers):
            # upstream: with_shift=True for odd layer indices (swin)
            shift = splits > 1 and i % 2 == 1
            layer = TransformerBlock(self.dim, name=f"layers_{i}")
            new0 = layer(feat0, feat1, splits, shift)
            new1 = layer(feat1, feat0, splits, shift)
            feat0, feat1 = new0, new1
        return feat0, feat1


# ---------------------------------------------------------------------------
# Correlation matching (parameter-free)
# ---------------------------------------------------------------------------


def _coords_grid(B, H, W):
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return jnp.broadcast_to(jnp.stack([xs, ys], -1)[None], (B, H, W, 2))


def global_correlation_softmax(feat0, feat1):
    """Global matching: flow = softmax-weighted displacement
    (GMFlow eq. 2-3)."""
    B, H, W, C = feat0.shape
    f0 = feat0.reshape(B, H * W, C)
    f1 = feat1.reshape(B, H * W, C)
    corr = jnp.einsum("bic,bjc->bij", f0, f1) / jnp.sqrt(C)
    prob = jax.nn.softmax(corr, axis=-1)
    grid = _coords_grid(B, H, W).reshape(B, H * W, 2)
    match = jnp.einsum("bij,bjc->bic", prob, grid)
    flow = (match - grid).reshape(B, H, W, 2)
    return flow


def local_correlation_softmax(feat0, feat1, radius: int):
    """Windowed matching within +-radius (GMFlow local variant). Offsets
    that land outside the image are EXCLUDED from the softmax (upstream
    masks them to -1e9 — matching released-weight behavior; zero-padded
    correlations would otherwise steal exp(0) probability mass)."""
    B, H, W, C = feat0.shape
    r = radius
    pad = jnp.pad(feat1, ((0, 0), (r, r), (r, r), (0, 0)))
    xs = jnp.arange(W)[None, :]
    ys = jnp.arange(H)[:, None]
    shifts, offs, valids = [], [], []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifts.append(pad[:, r + dy : r + dy + H, r + dx : r + dx + W])
            offs.append((dx, dy))
            valids.append(
                jnp.broadcast_to(
                    (xs + dx >= 0) & (xs + dx <= W - 1)
                    & (ys + dy >= 0) & (ys + dy <= H - 1), (H, W)
                )
            )
    f1s = jnp.stack(shifts, axis=3)  # (B, H, W, d*d, C)
    valid = jnp.stack(valids, axis=-1)[None]  # (1, H, W, d*d)
    corr = jnp.einsum("bhwc,bhwkc->bhwk", feat0, f1s) / jnp.sqrt(C)
    corr = jnp.where(valid, corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)
    off = jnp.asarray(offs, jnp.float32)  # (d*d, 2) [dx, dy]
    flow = jnp.einsum("bhwk,kc->bhwc", prob, off)
    return flow


class SelfAttnPropagation(nn.Module):
    """Flow propagation by feature self-attention with learned q/k
    projections, flow as value (upstream feature_flow_attn).
    radius -1 = global; otherwise local window."""

    dim: int

    @nn.compact
    def __call__(self, feat0, flow, radius: int):
        B, H, W, C = feat0.shape
        q = nn.Dense(self.dim, name="q_proj")(feat0)
        k = nn.Dense(self.dim, name="k_proj")(feat0)
        if radius < 0:
            qf = q.reshape(B, H * W, C)
            kf = k.reshape(B, H * W, C)
            v = flow.reshape(B, H * W, 2)
            attn = jnp.einsum("bic,bjc->bij", qf, kf) / jnp.sqrt(C)
            prob = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bij,bjc->bic", prob, v)
            return out.reshape(B, H, W, 2)
        r = radius
        pad_k = jnp.pad(k, ((0, 0), (r, r), (r, r), (0, 0)))
        pad_v = jnp.pad(flow, ((0, 0), (r, r), (r, r), (0, 0)))
        ks, vs = [], []
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                ks.append(pad_k[:, r + dy : r + dy + H, r + dx : r + dx + W])
                vs.append(pad_v[:, r + dy : r + dy + H, r + dx : r + dx + W])
        kk = jnp.stack(ks, axis=3)
        vk = jnp.stack(vs, axis=3)
        attn = jnp.einsum("bhwc,bhwkc->bhwk", q, kk) / jnp.sqrt(C)
        prob = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("bhwk,bhwkc->bhwc", prob, vk)


# ---------------------------------------------------------------------------
# Refinement (RAFT BasicUpdateBlock) + upsampling
# ---------------------------------------------------------------------------


def _bilinear_sample(img, coords):
    """img (B, H, W, C), coords (B, H, W, 2) absolute xy -> sampled.
    Out-of-bounds corners contribute ZERO (torch grid_sample
    padding_mode='zeros', the mode upstream flow_warp uses)."""
    B, H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = ((xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1))
        xc = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
        yc = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
        v = jax.vmap(lambda im, yy, xx: im[yy, xx])(img, yc, xc)
        return v * inb[..., None].astype(img.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy + v11 * wx * wy
    )


def local_correlation_with_flow(feat0, feat1, flow, radius: int):
    """(B, H, W, (2r+1)^2) correlation of feat0[x] vs feat1 bilinearly
    sampled at x + offset + flow(x) for each window offset (upstream
    unimatch local_correlation_with_flow: grid_sample at
    coords + window_grid + flow, zero padding). NOTE this is NOT
    warp-then-shift — the flow displacement is evaluated at the center
    pixel x for every offset, so each of the (2r+1)^2 taps is its own
    fractional sample.

    TPU formulation: per-tap bilinear gathers are row-descriptor-bound
    (4*(2r+1)^2 gathers/pixel = 77 ms/call at 216x120/128ch — this op WAS
    the entire GMFlow runtime at 6 refine iterations). Because the window
    offsets are integers, every tap shares the center's fractional part,
    and because bilinear interpolation is linear it commutes with the
    channel contraction. So: ONE patch gather per pixel (the (2r+2)^2
    integer neighborhood of floor(x + flow), zero-padded), contract with
    feat0 over channels into a scalar dot grid, then assemble all taps as
    a 4-term bilinear combine of shifted views of that grid. Identical
    values, ~25x fewer gather descriptors."""
    B, H, W, C = feat0.shape
    r = radius
    P = 2 * r + 2  # taps span floor(base) + [-r, r+1] in each axis
    grid = _coords_grid(B, H, W)
    base = grid + flow
    fl = jnp.floor(base)
    fr = base - fl

    # zero-pad by P: tap index < 0 or >= W reads an exact zero (grid_sample
    # padding_mode='zeros'); clipping the patch start only activates when
    # the whole window is out of bounds, where it lands fully in the pad
    f1p = jnp.pad(feat1, ((0, 0), (P, P), (P, P), (0, 0)))
    sy = jnp.clip(fl[..., 1] - r + P, 0, H + P).astype(jnp.int32)
    sx = jnp.clip(fl[..., 0] - r + P, 0, W + P).astype(jnp.int32)

    def patches_one(img, sy1, sx1):
        starts = jnp.stack([sy1.reshape(-1), sx1.reshape(-1)], axis=1)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(img, starts, dn, slice_sizes=(P, P, C),
                              mode=jax.lax.GatherScatterMode.CLIP)

    patches = jax.vmap(patches_one)(f1p, sy, sx)  # (B, H*W, P, P, C)
    dots = jnp.einsum(
        "bnc,bnpqc->bnpq", feat0.reshape(B, H * W, C), patches
    ) / jnp.sqrt(C)
    k = 2 * r + 1
    d00 = dots[:, :, 0:k, 0:k]
    d01 = dots[:, :, 0:k, 1:k + 1]
    d10 = dots[:, :, 1:k + 1, 0:k]
    d11 = dots[:, :, 1:k + 1, 1:k + 1]
    wx = fr[..., 0].reshape(B, H * W)[:, :, None, None]
    wy = fr[..., 1].reshape(B, H * W)[:, :, None, None]
    corr = ((1 - wx) * (1 - wy) * d00 + wx * (1 - wy) * d01
            + (1 - wx) * wy * d10 + wx * wy * d11)
    # (dy, dx) row-major — matches upstream generate_window_grid ordering
    return corr.reshape(B, H, W, k * k)


class BasicMotionEncoder(nn.Module):
    corr_channels: int

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), name="convf2")(f))
        out = nn.relu(nn.Conv(126, (3, 3), name="conv")(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)  # 128


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (1, 5), name="convz1")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (1, 5), name="convr1")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, (1, 5), name="convq1")(
            jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(nn.Conv(self.hidden, (5, 1), name="convz2")(hx))
        r = jax.nn.sigmoid(nn.Conv(self.hidden, (5, 1), name="convr2")(hx))
        q = jnp.tanh(nn.Conv(self.hidden, (5, 1), name="convq2")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class FlowHead(nn.Module):
    @nn.compact
    def __call__(self, h):
        return nn.Conv(2, (3, 3), name="conv2")(
            nn.relu(nn.Conv(256, (3, 3), name="conv1")(h)))


class BasicUpdateBlock(nn.Module):
    corr_channels: int
    mask_ch: int  # upsample_factor**2 * 9

    def setup(self):
        # setup()-style children (attribute name == param name) so that both
        # __call__ and the nn.scan-lifted scan_step share one definition
        self.encoder = BasicMotionEncoder(self.corr_channels)
        self.gru = SepConvGRU()
        self.flow_head = FlowHead()
        self.mask_0 = nn.Conv(256, (3, 3))
        self.mask_2 = nn.Conv(self.mask_ch, (1, 1))

    def __call__(self, net, inp, corr, flow):
        m = self.encoder(flow, corr)
        net = self.gru(net, jnp.concatenate([inp, m], axis=-1))
        dflow = self.flow_head(net)
        mask = self.mask_2(nn.relu(self.mask_0(net)))
        return net, mask, dflow

    def scan_step(self, carry, _):
        """One regression-refinement iteration as a lax.scan body: the
        weights are shared across all 6 iterations (it is a GRU), so the
        XLA graph needs the body ONCE, not unrolled 6x — the unrolled loop
        dominated GMFlow's released-scale compile (MODEL_SCALE r4: 454 s
        cold init). Matches the unrolled upstream loop step for step:
        detach flow, flow-conditioned local correlation, update block,
        additive flow update."""
        net, inp, flow, up_mask, f0, f1 = carry
        flow = jax.lax.stop_gradient(flow)
        corr = local_correlation_with_flow(f0, f1, flow, radius=4)
        net, up_mask, dflow = self(net, inp, corr, flow)
        return (net, inp, flow + dflow, up_mask, f0, f1), None


def upsample_flow_with_mask(flow, mask, factor: int):
    """RAFT convex upsampling: mask (B, H, W, 9*f*f) softmaxed over the 3x3
    neighborhood of the (x factor scaled) coarse flow.

    Channel order follows torch's `mask.view(b, 1, 9, f, f, h, w)` (RAFT /
    unimatch upsample_flow_with_mask): the 9-neighborhood is the MAJOR
    axis, the f*f sub-pixel position minor — converted released weights
    depend on this."""
    B, H, W, _ = flow.shape
    f = factor
    mask = mask.reshape(B, H, W, 9, f * f)
    mask = jax.nn.softmax(mask, axis=3)
    pad = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [pad[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]
         for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
        axis=3,
    )  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwnk,bhwnc->bhwkc", mask, neigh) * f
    up = up.reshape(B, H, W, f, f, 2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * f, W * f, 2)
    return up


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


class GMFlow(nn.Module):
    config: GMFlowConfig = field(default_factory=GMFlowConfig)

    @nn.compact
    def __call__(self, img0, img1):
        """img0, img1: (B, H, W, 3) in [0, 1], H and W multiples of
        padding_factor. Returns full-resolution flow (B, H, W, 2)."""
        cfg = self.config
        B, H, W, _ = img0.shape
        # upstream normalize_img: ImageNet mean/std (the distribution the
        # released weights were trained on) — NOT 2x-1
        mean = jnp.asarray([0.485, 0.456, 0.406], img0.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], img0.dtype)
        enc = CNNEncoder(cfg.feature_channels, cfg.num_scales, name="backbone")
        feats0 = enc((img0 - mean) / std)
        feats1 = enc((img1 - mean) / std)

        tr = FeatureTransformer(
            cfg.feature_channels, cfg.num_transformer_layers,
            name="transformer",
        )
        prop = SelfAttnPropagation(cfg.feature_channels,
                                   name="feature_flow_attn")

        flow = None
        f0t = f1t = None
        for s in range(cfg.num_scales):
            f0, f1 = feats0[s], feats1[s]
            if flow is not None:
                # upstream upsamples inter-scale flow with
                # F.interpolate(align_corners=True), not half-pixel
                from ..mast3r.dpt_head import bilinear_resize_ac

                flow = bilinear_resize_ac(
                    flow, f0.shape[1], f0.shape[2]) * 2.0
                grid = _coords_grid(B, f0.shape[1], f0.shape[2])
                f1 = _bilinear_sample(f1, grid + flow)

            # upstream feature_add_position: with attn_splits > 1 the sine
            # embedding is computed PER WINDOW and added inside each split
            # (positions restart per window) — tile the window embedding
            sp = cfg.attn_splits_list[s]
            if sp > 1:
                pw = position_embedding_sine(
                    f0.shape[1] // sp, f0.shape[2] // sp,
                    cfg.feature_channels)
                pos = jnp.tile(pw, (sp, sp, 1))[None]
            else:
                pos = position_embedding_sine(
                    f0.shape[1], f0.shape[2], cfg.feature_channels)[None]
            f0t, f1t = tr(f0 + pos, f1 + pos, sp)

            radius = cfg.corr_radius_list[s]
            if radius < 0:
                delta = global_correlation_softmax(f0t, f1t)
            else:
                delta = local_correlation_softmax(f0t, f1t, radius)
            flow = delta if flow is None else flow + delta

            # upstream: feature_flow_attn receives flow.detach()
            flow = prop(f0t, jax.lax.stop_gradient(flow),
                        cfg.prop_radius_list[s])

        if cfg.num_reg_refine > 0:
            proj = nn.Conv(256, (1, 1), name="refine_proj")(f0t)
            net, inp = jnp.split(proj, 2, axis=-1)
            net = jnp.tanh(net)
            inp = nn.relu(inp)
            # nn.scan over the shared-weight update block: params stay
            # broadcast (unstacked, same tree as calling one instance in a
            # Python loop) so converted released weights are unaffected;
            # the body compiles once instead of num_reg_refine times
            refine = nn.scan(
                BasicUpdateBlock,
                variable_broadcast="params",
                split_rngs={"params": False},
                length=cfg.num_reg_refine,
                methods=["scan_step"],
            )(corr_channels=81, mask_ch=cfg.upsample_factor**2 * 9,
              name="refine")
            # upstream correlates the BACKBONE features captured at the
            # finest scale before warping/pos-embed/transformer
            # (feature0_ori/feature1_ori), not the transformer outputs
            f0_ori = feats0[cfg.num_scales - 1]
            f1_ori = feats1[cfg.num_scales - 1]
            hm, wm = f0_ori.shape[1], f0_ori.shape[2]
            up_mask0 = jnp.zeros((B, hm, wm, cfg.upsample_factor**2 * 9),
                                 flow.dtype)
            carry = (net, inp, flow, up_mask0, f0_ori, f1_ori)
            (net, inp, flow, up_mask, _, _), _ = refine.scan_step(carry, None)
            flow_full = upsample_flow_with_mask(flow, up_mask,
                                                cfg.upsample_factor)
        else:
            mask = nn.Conv(
                cfg.upsample_factor**2 * 9, (1, 1), name="upsampler_2")(
                nn.relu(nn.Conv(256, (3, 3), name="upsampler_0")(
                    jnp.concatenate([flow, feats0[-1]], axis=-1))))
            flow_full = upsample_flow_with_mask(flow, mask,
                                                cfg.upsample_factor)
        return flow_full


def forward_backward_consistency(flow_fwd, flow_bwd, alpha=0.01, beta=0.5):
    """Occlusion maps from forward/backward flow consistency (the check the
    reference enables with --fwd_bwd_check; occ maps consumed at
    gflow/fit_video.py:85-88). Returns (occ_fwd, occ_bwd) float 0/1 maps."""
    B, H, W, _ = flow_fwd.shape
    grid = _coords_grid(B, H, W)
    bwd_at_fwd = _bilinear_sample(flow_bwd, grid + flow_fwd)
    fwd_at_bwd = _bilinear_sample(flow_fwd, grid + flow_bwd)

    def occ(fa, fb_warp):
        diff = jnp.sum((fa + fb_warp) ** 2, axis=-1)
        bound = alpha * (
            jnp.sum(fa**2, axis=-1) + jnp.sum(fb_warp**2, axis=-1)
        ) + beta
        return (diff > bound).astype(jnp.float32)

    return occ(flow_fwd, bwd_at_fwd), occ(flow_bwd, fwd_at_bwd)
