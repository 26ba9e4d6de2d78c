"""MASt3R/DUSt3R two-view network (JAX/flax) — the depth+camera prior model
the reference runs offline (utility/depth_mast3r.py:46-48,107-110; CroCo-v2
architecture: ViT-Large encoder with 2D RoPE, twin cross-attending decoders,
pointmap+confidence (+descriptor) heads).

The reference repo notes its CUDA RoPE kernels as a native dependency
(README.md:27); here RoPE is a fused elementwise rotation that XLA handles
natively on TPU.

Pretrained weights convert from the released .pth (convert.py); this
environment ships none, so tests exercise tiny configs for shape/compile
and the alignment stage is validated on synthetic pointmaps.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Mast3rConfig:
    patch_size: int = 16
    enc_dim: int = 1024
    enc_depth: int = 24
    enc_heads: int = 16
    dec_dim: int = 768
    dec_depth: int = 12
    dec_heads: int = 12
    rope_base: float = 100.0
    desc_dim: int = 24
    with_desc: bool = True


# ---------------------------------------------------------------------------
# 2D RoPE
# ---------------------------------------------------------------------------


def rope_2d(q, positions, base=100.0):
    """Apply 2D rotary position embedding.

    q: (B, N, H, D) with D divisible by 4; positions: (N, 2) (y, x) patch
    coords. Half the head dim rotates with y, half with x.
    """
    B, N, Hh, D = q.shape
    half = D // 2

    def rot(v, pos):  # v: (B, N, H, half), pos: (N,)
        d4 = half // 2
        freq = 1.0 / (base ** (jnp.arange(d4, dtype=jnp.float32) / d4))
        ang = pos[:, None] * freq[None, :]  # (N, d4)
        cos = jnp.cos(ang)[None, :, None, :]
        sin = jnp.sin(ang)[None, :, None, :]
        v1, v2 = v[..., :d4], v[..., d4:]
        return jnp.concatenate([v1 * cos - v2 * sin, v2 * cos + v1 * sin], -1)

    qy = rot(q[..., :half], positions[:, 0].astype(jnp.float32))
    qx = rot(q[..., half:], positions[:, 1].astype(jnp.float32))
    return jnp.concatenate([qy, qx], axis=-1)


class RopeAttention(nn.Module):
    dim: int
    heads: int
    rope_base: float

    @nn.compact
    def __call__(self, x, kv, pos_q, pos_kv):
        hd = self.dim // self.heads
        B, Nq, _ = x.shape
        Nk = kv.shape[1]
        q = nn.Dense(self.dim, name="q")(x).reshape(B, Nq, self.heads, hd)
        k = nn.Dense(self.dim, name="k")(kv).reshape(B, Nk, self.heads, hd)
        v = nn.Dense(self.dim, name="v")(kv).reshape(B, Nk, self.heads, hd)
        q = rope_2d(q, pos_q, self.rope_base)
        k = rope_2d(k, pos_kv, self.rope_base)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Nq, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class Block(nn.Module):
    dim: int
    heads: int
    rope_base: float
    cross: bool = False

    @nn.compact
    def __call__(self, x, pos, context=None, pos_ctx=None):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + RopeAttention(self.dim, self.heads, self.rope_base,
                              name="attn")(y, y, pos, pos)
        if self.cross:
            y = nn.LayerNorm(name="norm_cross")(x)
            x = x + RopeAttention(self.dim, self.heads, self.rope_base,
                                  name="cross_attn")(y, context, pos, pos_ctx)
        y = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.dim * 4, name="mlp1")(y)
        h = nn.gelu(h)
        x = x + nn.Dense(self.dim, name="mlp2")(h)
        return x


class Encoder(nn.Module):
    cfg: Mast3rConfig

    @nn.compact
    def __call__(self, img):
        """img (B, H, W, 3) -> tokens (B, N, D), positions (N, 2)."""
        c = self.cfg
        p = c.patch_size
        B, H, W, _ = img.shape
        x = nn.Conv(c.enc_dim, (p, p), strides=(p, p), name="patch_embed")(img)
        h, w = x.shape[1:3]
        x = x.reshape(B, h * w, c.enc_dim)
        ys = jnp.repeat(jnp.arange(h), w)
        xs = jnp.tile(jnp.arange(w), h)
        pos = jnp.stack([ys, xs], axis=1)
        for i in range(c.enc_depth):
            x = Block(c.enc_dim, c.enc_heads, c.rope_base,
                      name=f"block{i}")(x, pos)
        x = nn.LayerNorm(name="norm")(x)
        return x, pos, (h, w)


class Decoder(nn.Module):
    cfg: Mast3rConfig
    name_prefix: str = "dec"

    @nn.compact
    def __call__(self, tokens, pos, ctx, pos_ctx):
        c = self.cfg
        x = nn.Dense(c.dec_dim, name="embed")(tokens)
        ctx = nn.Dense(c.dec_dim, name="embed_ctx")(ctx)
        for i in range(c.dec_depth):
            x = Block(c.dec_dim, c.dec_heads, c.rope_base, cross=True,
                      name=f"block{i}")(x, pos, ctx, pos_ctx)
        return nn.LayerNorm(name="norm")(x)


class LinearHead(nn.Module):
    """DUSt3R linear head: tokens -> per-pixel (pts3d(3) + conf(1)
    [+ desc]). pts z is exp-activated positive; conf is 1 + exp."""

    cfg: Mast3rConfig

    @nn.compact
    def __call__(self, x, hw, img_hw):
        c = self.cfg
        p = c.patch_size
        h, w = hw
        H, W = img_hw
        out_ch = (3 + 1) * p * p
        y = nn.Dense(out_ch, name="proj")(x)  # (B, N, out)
        B = y.shape[0]
        y = y.reshape(B, h, w, p, p, 4).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, h * p, w * p, 4)[:, :H, :W]
        xy = y[..., 0:2]
        z = jnp.exp(jnp.clip(y[..., 2:3], -10.0, 10.0))
        pts = jnp.concatenate([xy * z, z], axis=-1)
        conf = 1.0 + jnp.exp(jnp.clip(y[..., 3:4], -10.0, 10.0))
        out = {"pts3d": pts, "conf": conf}
        if c.with_desc:
            d = nn.Dense((c.desc_dim + 1) * p * p, name="desc_proj")(x)
            d = d.reshape(B, h, w, p, p, c.desc_dim + 1)
            d = d.transpose(0, 1, 3, 2, 4, 5).reshape(
                B, h * p, w * p, c.desc_dim + 1
            )[:, :H, :W]
            desc = d[..., : c.desc_dim]
            out["desc"] = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
            )
            out["desc_conf"] = 1.0 + jnp.exp(jnp.clip(d[..., -1:], -10, 10))
        return out


class Mast3rModel(nn.Module):
    """Two-view model: returns per-view dicts; view-2 points live in
    view-1's camera frame (the DUSt3R convention the alignment relies on)."""

    config: Mast3rConfig = field(default_factory=Mast3rConfig)

    @nn.compact
    def __call__(self, img1, img2):
        c = self.config
        enc = Encoder(c, name="encoder")
        t1, pos, hw = enc(img1 * 2 - 1)
        t2, _, _ = enc(img2 * 2 - 1)
        d1 = Decoder(c, name="decoder1")(t1, pos, t2, pos)
        d2 = Decoder(c, name="decoder2")(t2, pos, t1, pos)
        img_hw = img1.shape[1:3]
        out1 = LinearHead(c, name="head1")(d1, hw, img_hw)
        out2 = LinearHead(c, name="head2")(d2, hw, img_hw)
        return out1, out2
