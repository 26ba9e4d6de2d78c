"""Loss-function goldens."""
import jax.numpy as jnp
import numpy as np

from gflow_tpu.opt.losses import ssim, _ssim_window


def _conv2d_np(img, w2d):
    from scipy.signal import convolve2d

    return np.stack(
        [
            convolve2d(img[..., c], w2d[::-1, ::-1], mode="same",
                       boundary="fill")
            for c in range(img.shape[-1])
        ],
        -1,
    )


def test_ssim_matches_dense_oracle():
    """Shifted-adds separable SSIM == dense 2D-conv scipy oracle (the
    reference's pytorch_ssim numerics: window 11, sigma 1.5, zero pad)."""
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (40, 56, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    g = np.asarray(_ssim_window(11))
    w2d = np.outer(g, g)
    mu1, mu2 = _conv2d_np(a, w2d), _conv2d_np(b, w2d)
    s11 = _conv2d_np(a * a, w2d) - mu1**2
    s22 = _conv2d_np(b * b, w2d) - mu2**2
    s12 = _conv2d_np(a * b, w2d) - mu1 * mu2
    C1, C2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s11 + s22 + C2)
    )
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, smap.mean(), atol=2e-6)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5
    b = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    v = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert -1.0 <= v < 0.9
