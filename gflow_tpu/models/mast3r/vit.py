"""MASt3R/DUSt3R two-view network (JAX/flax) — the depth+camera prior model
the reference runs offline (utility/depth_mast3r.py:46-48,107-110; CroCo-v2
architecture: ViT-Large encoder with 2D RoPE, twin cross-attending decoders,
pointmap+confidence (+descriptor) heads).

The module tree mirrors the released checkpoints' parameter layout
(CroCo/DUSt3R naming: patch_embed.proj, enc_blocks.{i}.{norm1,attn.qkv,
attn.proj,norm2,mlp.fc1,mlp.fc2}, enc_norm, decoder_embed (shared),
dec_blocks.{i} / dec_blocks2.{i} with norm1/attn, norm2+norm_y/cross_attn
(projq/projk/projv/proj), norm3/mlp, dec_norm, downstream_head{1,2}.proj)
so convert.py is a mechanical rename+transpose. RoPE has no parameters —
the reference repo ships it as a CUDA kernel (README.md:27); here it is a
fused elementwise rotation XLA handles natively on TPU. GELU is exact-erf
and LayerNorm eps 1e-6, matching CroCo numerics.

The descriptor head (`desc_proj`) is an extension slot for the MASt3R
local-feature head; DUSt3R linear checkpoints do not carry it — use
with_desc=False when loading those.

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
    # 'linear' (DUSt3R *_linear) or 'catmlp+dpt' (the MASt3R checkpoints the
    # reference loads — utility/depth_mast3r.py:46-48)
    head: str = "linear"


def _gelu(x):
    return nn.gelu(x, approximate=False)  # torch nn.GELU default (erf)


# ---------------------------------------------------------------------------
# 2D RoPE (CroCo-v2 RoPE2D, freq base 100)
# ---------------------------------------------------------------------------


def rope_2d(q, positions, base=100.0):
    """Apply 2D rotary position embedding.

    q: (B, N, H, D) with D divisible by 4; positions: (N, 2) (y, x) patch
    coords. Half the head dim rotates with y, half with x; within each half
    the rotation pairs are the chunked halves (CroCo's rotate_half).
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


# ---------------------------------------------------------------------------
# Attention (CroCo layouts: fused qkv for self, projq/k/v for cross)
# ---------------------------------------------------------------------------


class SelfAttention(nn.Module):
    dim: int
    heads: int
    rope_base: float

    @nn.compact
    def __call__(self, x, pos):
        hd = self.dim // self.heads
        B, N, _ = x.shape
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = rope_2d(q, pos, self.rope_base)
        k = rope_2d(k, pos, self.rope_base)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class CrossAttention(nn.Module):
    dim: int
    heads: int
    rope_base: float

    @nn.compact
    def __call__(self, x, kv, pos_q, pos_kv):
        hd = self.dim // self.heads
        B, Nq, _ = x.shape
        Nk = kv.shape[1]
        q = nn.Dense(self.dim, name="projq")(x).reshape(B, Nq, self.heads, hd)
        k = nn.Dense(self.dim, name="projk")(kv).reshape(B, Nk, self.heads, hd)
        v = nn.Dense(self.dim, name="projv")(kv).reshape(B, Nk, self.heads, hd)
        q = rope_2d(q, pos_q, self.rope_base)
        k = rope_2d(k, pos_kv, self.rope_base)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Nq, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class Mlp(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 4, name="fc1")(x)
        return nn.Dense(self.dim, name="fc2")(_gelu(h))


class EncoderBlock(nn.Module):
    dim: int
    heads: int
    rope_base: float

    @nn.compact
    def __call__(self, x, pos):
        x = x + SelfAttention(self.dim, self.heads, self.rope_base,
                              name="attn")(nn.LayerNorm(name="norm1")(x), pos)
        x = x + Mlp(self.dim, name="mlp")(nn.LayerNorm(name="norm2")(x))
        return x


class DecoderBlock(nn.Module):
    """CroCo decoder block: self-attn, cross-attn to the (norm_y'd) other
    view, MLP — pre-norms norm1/norm2/norm3."""

    dim: int
    heads: int
    rope_base: float

    @nn.compact
    def __call__(self, x, y, pos, pos_y):
        x = x + SelfAttention(self.dim, self.heads, self.rope_base,
                              name="attn")(nn.LayerNorm(name="norm1")(x), pos)
        y_ = nn.LayerNorm(name="norm_y")(y)
        x = x + CrossAttention(self.dim, self.heads, self.rope_base,
                               name="cross_attn")(
            nn.LayerNorm(name="norm2")(x), y_, pos, pos_y)
        x = x + Mlp(self.dim, name="mlp")(nn.LayerNorm(name="norm3")(x))
        return x


class LinearHead(nn.Module):
    """DUSt3R linear head (downstream_head{i}.proj): tokens -> per-pixel
    (pts3d(3) + conf(1)) via channel-major pixel shuffle (torch
    F.pixel_shuffle ordering — dust3r LinearPts3d), then the 'exp' dense
    regression: pts = unit(xyz) * expm1(|xyz|), conf = 1 + exp.
    Optional descriptor extension (desc_proj) for MASt3R-style outputs."""

    cfg: Mast3rConfig

    @nn.compact
    def __call__(self, x, hw, img_hw):
        from .dpt_head import pixel_shuffle_tokens, reg_dense_pts3d

        c = self.cfg
        p = c.patch_size
        h, w = hw
        H, W = img_hw
        y = nn.Dense((3 + 1) * p * p, name="proj")(x)  # (B, N, out)
        y = pixel_shuffle_tokens(y, h, w, 4, p)[:, :H, :W]
        pts = reg_dense_pts3d(y[..., :3])
        conf = 1.0 + jnp.exp(jnp.clip(y[..., 3:4], -20.0, 20.0))
        out = {"pts3d": pts, "conf": conf}
        if c.with_desc:
            d = nn.Dense((c.desc_dim + 1) * p * p, name="desc_proj")(x)
            d = pixel_shuffle_tokens(d, h, w, c.desc_dim + 1, p)[:, :H, :W]
            desc = d[..., : c.desc_dim]
            out["desc"] = desc / jnp.maximum(
                jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
            )
            out["desc_conf"] = 1.0 + jnp.exp(jnp.clip(d[..., -1:], -20, 20))
        return out


class Mast3rModel(nn.Module):
    """Two-view model: returns per-view dicts; view-2 points live in
    view-1's camera frame (the DUSt3R convention the alignment relies on)."""

    config: Mast3rConfig = field(default_factory=Mast3rConfig)

    @nn.compact
    def __call__(self, img1, img2):
        c = self.config
        p = c.patch_size
        B, H, W, _ = img1.shape

        patch = nn.Conv(c.enc_dim, (p, p), strides=(p, p), name="patch_embed")
        enc_blocks = [
            EncoderBlock(c.enc_dim, c.enc_heads, c.rope_base,
                         name=f"enc_blocks_{i}")
            for i in range(c.enc_depth)
        ]
        enc_norm = nn.LayerNorm(name="enc_norm")

        def encode(img):
            x = patch(img * 2 - 1)
            h, w = x.shape[1:3]
            x = x.reshape(B, h * w, c.enc_dim)
            ys = jnp.repeat(jnp.arange(h), w)
            xs = jnp.tile(jnp.arange(w), h)
            pos = jnp.stack([ys, xs], axis=1)
            for blk in enc_blocks:
                x = blk(x, pos)
            return enc_norm(x), pos, (h, w)

        t1, pos, hw = encode(img1)
        t2, _, _ = encode(img2)

        embed = nn.Dense(c.dec_dim, name="decoder_embed")
        x1, x2 = embed(t1), embed(t2)
        dec_norm = nn.LayerNorm(name="dec_norm")
        # decout lists, dust3r convention: [encoder tokens, block1, ...,
        # blockN (dec_norm'd)] — the DPT head hooks into these
        outs1, outs2 = [t1], [t2]
        for i in range(c.dec_depth):
            b1 = DecoderBlock(c.dec_dim, c.dec_heads, c.rope_base,
                              name=f"dec_blocks_{i}")
            b2 = DecoderBlock(c.dec_dim, c.dec_heads, c.rope_base,
                              name=f"dec_blocks2_{i}")
            x1, x2 = b1(x1, x2, pos, pos), b2(x2, x1, pos, pos)
            outs1.append(x1)
            outs2.append(x2)
        d1, d2 = dec_norm(x1), dec_norm(x2)
        outs1[-1], outs2[-1] = d1, d2

        img_hw = (H, W)
        if c.head == "catmlp+dpt":
            from .dpt_head import CatMlpDptHead

            ld = c.dec_depth
            hooks = (0, ld * 2 // 4, ld * 3 // 4, ld)
            dims = tuple(c.enc_dim if h == 0 else c.dec_dim for h in hooks)
            h1 = CatMlpDptHead(dim_tokens=dims, patch_size=p,
                               local_feat_dim=c.desc_dim,
                               name="downstream_head1")
            h2 = CatMlpDptHead(dim_tokens=dims, patch_size=p,
                               local_feat_dim=c.desc_dim,
                               name="downstream_head2")
            out1 = h1([outs1[k] for k in hooks], t1, d1, hw, img_hw)
            out2 = h2([outs2[k] for k in hooks], t2, d2, hw, img_hw)
        else:
            out1 = LinearHead(c, name="downstream_head1")(d1, hw, img_hw)
            out2 = LinearHead(c, name="downstream_head2")(d2, hw, img_hw)
        return out1, out2
