"""LPIPS(Alex) numerics vs a torch replica of the Zhang et al. v0.1 metric
(torchvision AlexNet features + scaling layer + unit-normalized feature
diffs + 1x1 linear calibration, spatially averaged, summed over 5 slices).
Random weights flow through the real converter (eval/lpips_convert.py), so
this locks BOTH the conversion mapping and the JAX graph to torch."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tn

from gflow_tpu.eval.lpips_convert import convert, expected_torch_keys
from gflow_tpu.eval.metrics import lpips


class TorchLPIPSAlex(tn.Module):
    def __init__(self, sd):
        super().__init__()
        self.features = tn.Sequential(
            tn.Conv2d(3, 64, 11, 4, 2), tn.ReLU(),
            tn.MaxPool2d(3, 2),
            tn.Conv2d(64, 192, 5, 1, 2), tn.ReLU(),
            tn.MaxPool2d(3, 2),
            tn.Conv2d(192, 384, 3, 1, 1), tn.ReLU(),
            tn.Conv2d(384, 256, 3, 1, 1), tn.ReLU(),
            tn.Conv2d(256, 256, 3, 1, 1), tn.ReLU(),
        )
        conv_idx = {0: 0, 3: 3, 6: 6, 8: 8, 10: 10}
        for fi in (0, 3, 6, 8, 10):
            self.features[conv_idx[fi]].weight.data = torch.from_numpy(
                sd[f"features.{fi}.weight"])
            self.features[conv_idx[fi]].bias.data = torch.from_numpy(
                sd[f"features.{fi}.bias"])
        self.lins = [torch.from_numpy(sd[f"lin{i}.model.1.weight"])
                     for i in range(5)]
        self.shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
        # relu output positions in the Sequential
        self.relu_pos = (1, 4, 7, 9, 11)

    def feats(self, x):
        out, h = [], (x - self.shift) / self.scale
        for i, layer in enumerate(self.features):
            h = layer(h)
            if i in self.relu_pos:
                out.append(h)
        return out

    def forward(self, a, b):
        fa, fb = self.feats(a), self.feats(b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            xn = x / (x.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            yn = y / (y.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (xn - yn) ** 2
            total = total + (d * self.lins[i]).sum(dim=1).mean()
        return total


def test_lpips_matches_torch_replica():
    rng = np.random.default_rng(0)
    sd = {k: (rng.normal(size=s) * 0.05).astype(np.float32)
          for k, s in expected_torch_keys().items()}
    # lins must be non-negative (as trained/clamped upstream)
    for i in range(5):
        sd[f"lin{i}.model.1.weight"] = np.abs(sd[f"lin{i}.model.1.weight"])

    import jax.numpy as jnp
    weights = {k: jnp.asarray(v) for k, v in convert(merged_sd=sd).items()}

    H = W = 64
    a = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, (H, W, 3)), 0, 1).astype(np.float32)

    got = lpips(a, b, weights=weights)

    ref = TorchLPIPSAlex(sd).eval()
    ta = torch.from_numpy(a).permute(2, 0, 1)[None] * 2 - 1
    tb = torch.from_numpy(b).permute(2, 0, 1)[None] * 2 - 1
    want = float(ref(ta, tb))
    assert got is not None
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    # identical inputs -> 0
    assert abs(lpips(a, a, weights=weights)) < 1e-7
