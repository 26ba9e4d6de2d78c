"""DPT pixelwise head + MASt3R catMLP local-feature head (JAX/flax).

The reference's depth prep loads
`MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth`
(utility/depth_mast3r.py:46-48), whose downstream heads are the
`catmlp+dpt` family: a DPT regression head over four hooked transformer
layers for pts3d+confidence, plus an MLP over cat(encoder, decoder) tokens
for per-pixel local descriptors (MASt3R Cat_MLP_LocalFeatures_DPT_Pts3d).

This is a from-scratch flax implementation of that topology (CroCo
dpt_block DPTOutputAdapter + DPT scratch/refinenet stack):

- four hooked token sets -> spatial maps at strides 4/8/16/32
  (1x1 conv + {4x4-s4 convT, 2x2-s2 convT, identity, 3x3-s2 conv}),
- 3x3 no-bias projections to a shared 256-d feature space (layerN_rn),
- top-down refinement: residual conv units + x2 bilinear upsampling
  (align_corners=True, matching torch F.interpolate) per fusion block,
- head: 3x3 conv -> x2 upsample -> 3x3 conv -> ReLU -> 1x1 conv.

Activations: pts3d = unit(xyz) * expm1(|xyz|) ('exp' depth mode with no
bounds — dust3r postprocess), conf = 1 + exp, desc = L2-normalized,
desc_conf = exp (MASt3R metric-model modes). Module names mirror the
released checkpoint layout so convert.py stays a mechanical rename.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def bilinear_resize_ac(x, out_h: int, out_w: int):
    """Bilinear resize of (B, H, W, C) with torch align_corners=True
    semantics (src = dst * (in-1)/(out-1))."""
    B, H, W, C = x.shape
    if (H, W) == (out_h, out_w):
        return x

    def idx(out_n, in_n):
        if out_n == 1 or in_n == 1:
            z = jnp.zeros((out_n,), jnp.float32)
            zi = jnp.zeros((out_n,), jnp.int32)
            return z, zi, zi
        src = jnp.arange(out_n, dtype=jnp.float32) * (
            (in_n - 1) / (out_n - 1)
        )
        i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_n - 2)
        return src - i0.astype(jnp.float32), i0, i0 + 1

    fy, y0, y1 = idx(out_h, H)
    fx, x0, x1 = idx(out_w, W)
    rows0, rows1 = x[:, y0], x[:, y1]
    rows = rows0 * (1.0 - fy)[None, :, None, None] + rows1 * fy[None, :, None, None]
    cols0, cols1 = rows[:, :, x0], rows[:, :, x1]
    return cols0 * (1.0 - fx)[None, None, :, None] + cols1 * fx[None, None, :, None]


class ConvTransposeExpand(nn.Module):
    """ConvTranspose2d with kernel == stride (non-overlapping stamps):
    out[y*s+dy, x*s+dx, o] = sum_i in[y, x, i] w[dy, dx, i, o] + b[o] —
    exactly torch's ConvTranspose2d(I, O, s, s) semantics."""

    features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        B, H, W, I = x.shape
        s = self.stride
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (s, s, I, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum("bhwi,uvio->bhuwvo", x, w)
        return y.reshape(B, H * s, W * s, self.features) + b


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(out)
        return out + x


class FusionBlock(nn.Module):
    """DPT FeatureFusionBlock_custom (deconv=False, bn=False, expand=False,
    align_corners=True)."""

    features: int

    @nn.compact
    def __call__(self, x, res=None):
        out = x
        if res is not None:
            out = out + ResidualConvUnit(self.features,
                                         name="resConfUnit1")(res)
        out = ResidualConvUnit(self.features, name="resConfUnit2")(out)
        B, H, W, C = out.shape
        out = bilinear_resize_ac(out, H * 2, W * 2)
        return nn.Conv(self.features, (1, 1), name="out_conv")(out)


class DptCore(nn.Module):
    """CroCo DPTOutputAdapter: four hooked token layers -> (B, H, W, C) map
    at full image resolution. `dim_tokens` are the hooked layers' widths."""

    dim_tokens: Sequence[int]
    num_channels: int = 4
    feature_dim: int = 256
    last_dim: int = 128
    layer_dims: Sequence[int] = (96, 192, 384, 768)

    @nn.compact
    def __call__(self, layers, hw):
        h, w = hw
        ld = self.layer_dims
        maps = []
        for i, tok in enumerate(layers):
            B, N, D = tok.shape
            maps.append(tok.reshape(B, h, w, D))

        # stride-4: 1x1 conv + 4x4-s4 convT
        l0 = nn.Conv(ld[0], (1, 1), name="act_0_0")(maps[0])
        l0 = ConvTransposeExpand(ld[0], 4, name="act_0_1")(l0)
        # stride-8: 1x1 conv + 2x2-s2 convT
        l1 = nn.Conv(ld[1], (1, 1), name="act_1_0")(maps[1])
        l1 = ConvTransposeExpand(ld[1], 2, name="act_1_1")(l1)
        # stride-16: 1x1 conv
        l2 = nn.Conv(ld[2], (1, 1), name="act_2_0")(maps[2])
        # stride-32: 1x1 conv + 3x3-s2 conv
        l3 = nn.Conv(ld[3], (1, 1), name="act_3_0")(maps[3])
        l3 = nn.Conv(ld[3], (3, 3), strides=2, padding=1, name="act_3_1")(l3)

        f = self.feature_dim
        r0 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="layer1_rn")(l0)
        r1 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="layer2_rn")(l1)
        r2 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="layer3_rn")(l2)
        r3 = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                     name="layer4_rn")(l3)

        p4 = FusionBlock(f, name="refinenet4")(r3)
        p4 = p4[:, : r2.shape[1], : r2.shape[2]]  # odd-grid crop
        p3 = FusionBlock(f, name="refinenet3")(p4, r2)
        p3 = p3[:, : r1.shape[1], : r1.shape[2]]
        p2 = FusionBlock(f, name="refinenet2")(p3, r1)
        p2 = p2[:, : r0.shape[1], : r0.shape[2]]
        p1 = FusionBlock(f, name="refinenet1")(p2, r0)

        out = nn.Conv(self.last_dim, (3, 3), padding=1, name="head_0")(p1)
        B, H2, W2, _ = out.shape
        out = bilinear_resize_ac(out, H2 * 2, W2 * 2)
        out = nn.Conv(self.last_dim, (3, 3), padding=1, name="head_2")(out)
        out = nn.relu(out)
        return nn.Conv(self.num_channels, (1, 1), name="head_4")(out)


def pixel_shuffle_tokens(y, h, w, C, p):
    """torch F.pixel_shuffle ordering: token feature index = c*p*p + dy*p+dx
    -> (B, h*p, w*p, C)."""
    B = y.shape[0]
    y = y.reshape(B, h, w, C, p, p)
    return y.transpose(0, 1, 4, 2, 5, 3).reshape(B, h * p, w * p, C)


def reg_dense_pts3d(xyz):
    """dust3r 'exp' depth mode, no bounds: unit direction * expm1(norm)."""
    d = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True))
    return xyz / jnp.maximum(d, 1e-8) * jnp.expm1(jnp.minimum(d, 60.0))


class LocalFeaturesMlp(nn.Module):
    """timm-style Mlp (fc1/GELU/fc2) with hidden = 4x input width — the
    MASt3R head_local_features module."""

    out_features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(int(4.0 * x.shape[-1]), name="fc1")(x)
        return nn.Dense(self.out_features, name="fc2")(
            nn.gelu(h, approximate=False))


class CatMlpDptHead(nn.Module):
    """MASt3R Cat_MLP_LocalFeatures_DPT_Pts3d: DPT for pts3d+conf, MLP over
    cat(encoder tokens, final decoder tokens) pixel-shuffled to per-pixel
    descriptors (+ desc confidence: the metric checkpoint's two_confs)."""

    dim_tokens: Sequence[int]
    patch_size: int = 16
    local_feat_dim: int = 24
    feature_dim: int = 256
    last_dim: int = 128
    layer_dims: Sequence[int] = (96, 192, 384, 768)

    @nn.compact
    def __call__(self, hooked, enc_out, dec_out, hw, img_hw):
        H, W = img_hw
        h, w = hw
        p = self.patch_size
        fmap = DptCore(
            dim_tokens=self.dim_tokens, num_channels=4,
            feature_dim=self.feature_dim, last_dim=self.last_dim,
            layer_dims=self.layer_dims, name="dpt",
        )(hooked, hw)[:, :H, :W]

        pts = reg_dense_pts3d(fmap[..., :3])
        conf = 1.0 + jnp.exp(jnp.clip(fmap[..., 3:4], -20.0, 20.0))

        cat = jnp.concatenate([enc_out, dec_out], axis=-1)
        d = self.local_feat_dim
        x = LocalFeaturesMlp((d + 1) * p * p,
                             name="head_local_features")(cat)
        lf = pixel_shuffle_tokens(x, h, w, d + 1, p)[:, :H, :W]
        desc = lf[..., :d]
        desc = desc / jnp.maximum(
            jnp.sqrt(jnp.sum(desc * desc, axis=-1, keepdims=True)), 1e-8
        )
        desc_conf = jnp.exp(jnp.clip(lf[..., d:], -20.0, 20.0))
        return {"pts3d": pts, "conf": conf, "desc": desc,
                "desc_conf": desc_conf}
