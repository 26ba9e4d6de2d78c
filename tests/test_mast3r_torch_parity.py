"""MASt3R/CroCo core numerics vs a torch replica: RoPE-2D rotation, fused
qkv packing, cross-attention projections — the silent-failure modes of a
weight converter (everything here has identical SHAPES whether or not the
semantics match torch; only a numerics check proves the mapping)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn

import jax
import jax.numpy as jnp

from gflow_tpu.models.mast3r.vit import (EncoderBlock, DecoderBlock, rope_2d)

DIM, HEADS, HD = 24, 2, 12
N = 12  # 3x4 token grid


def _grid_pos(h, w):
    ys = np.repeat(np.arange(h), w)
    xs = np.tile(np.arange(w), h)
    return np.stack([ys, xs], 1).astype(np.int64)


# --------------------------------------------------------------------------
# torch replica (CroCo RoPE2D + block layout)
# --------------------------------------------------------------------------


def rope2d_torch(tokens, positions, base=100.0):
    """tokens (B, H, N, D); positions (B, N, 2) int — croco RoPE2D."""
    D = tokens.size(3) // 2

    def rope1d(tok, pos1d):
        d = tok.size(3)
        inv = 1.0 / (base ** (torch.arange(0, d, 2).float() / d))
        freqs = torch.einsum("i,j->ij", pos1d.float().flatten(), inv)
        freqs = torch.cat((freqs, freqs), dim=-1)  # (N, d)
        cos = freqs.cos()[None, None]
        sin = freqs.sin()[None, None]
        x1, x2 = tok.chunk(2, dim=-1)
        rot = torch.cat((-x2, x1), dim=-1)
        return tok * cos + rot * sin

    y, x = tokens.chunk(2, dim=-1)
    y = rope1d(y, positions[0, :, 0])
    x = rope1d(x, positions[0, :, 1])
    return torch.cat((y, x), dim=-1)


class TAttn(tn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = tn.Linear(dim, dim * 3)
        self.proj = tn.Linear(dim, dim)
        self.h = heads

    def forward(self, x, pos):
        B, N_, C = x.shape
        qkv = self.qkv(x).reshape(B, N_, 3, self.h, C // self.h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = rope2d_torch(q, pos)
        k = rope2d_torch(k, pos)
        a = (q @ k.transpose(-2, -1)) * (C // self.h) ** -0.5
        a = a.softmax(dim=-1)
        out = (a @ v).transpose(1, 2).reshape(B, N_, C)
        return self.proj(out)


class TCross(tn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.projq = tn.Linear(dim, dim)
        self.projk = tn.Linear(dim, dim)
        self.projv = tn.Linear(dim, dim)
        self.proj = tn.Linear(dim, dim)
        self.h = heads

    def forward(self, x, kv, pos, pos_kv):
        B, Nq, C = x.shape
        Nk = kv.shape[1]
        hd = C // self.h
        q = self.projq(x).reshape(B, Nq, self.h, hd).permute(0, 2, 1, 3)
        k = self.projk(kv).reshape(B, Nk, self.h, hd).permute(0, 2, 1, 3)
        v = self.projv(kv).reshape(B, Nk, self.h, hd).permute(0, 2, 1, 3)
        q = rope2d_torch(q, pos)
        k = rope2d_torch(k, pos_kv)
        a = ((q @ k.transpose(-2, -1)) * hd ** -0.5).softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, Nq, C))


class TEncBlock(tn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads)
        self.norm2 = tn.LayerNorm(dim, eps=1e-6)
        self.mlp = tn.Sequential()
        self.fc1 = tn.Linear(dim, dim * 4)
        self.fc2 = tn.Linear(dim * 4, dim)

    def forward(self, x, pos):
        x = x + self.attn(self.norm1(x), pos)
        h = tn.functional.gelu(self.fc1(self.norm2(x)))
        return x + self.fc2(h)


class TDecBlock(tn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttn(dim, heads)
        self.norm2 = tn.LayerNorm(dim, eps=1e-6)
        self.norm_y = tn.LayerNorm(dim, eps=1e-6)
        self.cross_attn = TCross(dim, heads)
        self.norm3 = tn.LayerNorm(dim, eps=1e-6)
        self.fc1 = tn.Linear(dim, dim * 4)
        self.fc2 = tn.Linear(dim * 4, dim)

    def forward(self, x, y, pos, pos_y):
        x = x + self.attn(self.norm1(x), pos)
        x = x + self.cross_attn(self.norm2(x), self.norm_y(y), pos, pos_y)
        h = tn.functional.gelu(self.fc1(self.norm3(x)))
        return x + self.fc2(h)


def _lin(m):
    return {"kernel": m.weight.detach().numpy().T,
            "bias": m.bias.detach().numpy()}


def _ln(m):
    return {"scale": m.weight.detach().numpy(),
            "bias": m.bias.detach().numpy()}


def test_rope2d_matches_torch():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, N, HEADS, HD)).astype(np.float32)
    pos = _grid_pos(3, 4)
    got = rope_2d(jnp.asarray(q), jnp.asarray(pos))
    want = rope2d_torch(torch.from_numpy(q).permute(0, 2, 1, 3),
                        torch.from_numpy(pos)[None])
    want = want.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_encoder_block_matches_torch():
    torch.manual_seed(0)
    ref = TEncBlock(DIM, HEADS).eval()
    params = {
        "norm1": _ln(ref.norm1), "norm2": _ln(ref.norm2),
        "attn": {"qkv": _lin(ref.attn.qkv), "proj": _lin(ref.attn.proj)},
        "mlp": {"fc1": _lin(ref.fc1), "fc2": _lin(ref.fc2)},
    }
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, N, DIM)).astype(np.float32)
    pos = _grid_pos(3, 4)
    got = EncoderBlock(DIM, HEADS, 100.0).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(pos))
    want = ref(torch.from_numpy(x), torch.from_numpy(pos)[None])
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5, rtol=1e-4)


def test_decoder_block_matches_torch():
    torch.manual_seed(1)
    ref = TDecBlock(DIM, HEADS).eval()
    params = {
        "norm1": _ln(ref.norm1), "norm2": _ln(ref.norm2),
        "norm3": _ln(ref.norm3), "norm_y": _ln(ref.norm_y),
        "attn": {"qkv": _lin(ref.attn.qkv), "proj": _lin(ref.attn.proj)},
        "cross_attn": {"projq": _lin(ref.cross_attn.projq),
                       "projk": _lin(ref.cross_attn.projk),
                       "projv": _lin(ref.cross_attn.projv),
                       "proj": _lin(ref.cross_attn.proj)},
        "mlp": {"fc1": _lin(ref.fc1), "fc2": _lin(ref.fc2)},
    }
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, N, DIM)).astype(np.float32)
    y = rng.normal(size=(2, N, DIM)).astype(np.float32)
    pos = _grid_pos(3, 4)
    got = DecoderBlock(DIM, HEADS, 100.0).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(pos), jnp.asarray(pos))
    want = ref(torch.from_numpy(x), torch.from_numpy(y),
               torch.from_numpy(pos)[None], torch.from_numpy(pos)[None])
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-5, rtol=1e-4)
